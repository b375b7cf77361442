"""Property-based conformance for the bucketed interval-join rewrite
(ops_interval_bucket_join, the 100 TB range-join shape): explode each
interval to its covered buckets, map each point to ONE bucket, equi-join
on bucket id, then apply the residual range predicate.

The fuzz pins the REWRITE RULE for arbitrary widths, NEGATIVE domains
(Spark's truncating `div` is nondecreasing, so v in [lo, hi] implies
v div w lies in [lo div w, hi div w] — but truncation-vs-floor bugs are
exactly the class a negative-domain fuzz catches), zero-length and
overlapping intervals, and points on every boundary. Oracle: the naive
O(N*M) inequality join in Python.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

interval = st.tuples(st.integers(-50, 50), st.integers(0, 30)).map(
    lambda t: (t[0], t[0] + t[1])  # (lo, hi) with hi >= lo
)
case = st.tuples(
    st.lists(interval, min_size=1, max_size=8),
    st.lists(st.integers(-60, 60), min_size=0, max_size=20),  # points
    st.integers(1, 9),  # bucket width
)


def _oracle(ivs, pts):
    return sorted(
        (i, p)
        for i, (lo, hi) in enumerate(ivs)
        for p in pts
        if lo <= p < hi
    )


@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(case)
def test_bucketed_rewrite_equals_naive_range_join(spark, case_):
    ivs, pts, width = case_
    iv = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(ivs)],
        "iv_id long, lo long, hi long",
    ).withColumn(
        "bucket",
        F.explode(
            F.sequence(F.expr(f"lo DIV {width}"), F.expr(f"hi DIV {width}"))
        ),
    )
    p = spark.createDataFrame(
        [(v,) for v in pts], "v long"
    ).withColumn("bucket", F.expr(f"v DIV {width}"))
    got = sorted(
        (r.iv_id, r.v)
        for r in iv.join(p, "bucket")
        .where((F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi")))
        .select("iv_id", "v")
        .collect()
    )
    assert got == _oracle(ivs, pts)
