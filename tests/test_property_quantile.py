"""Property-based conformance for weighted_quantile — the two-phase
binned order-statistic kernel behind ev_rfm_segments, ops_mad_outliers,
approx_percentile_cont_with_weight parity, and every exact-quantile
query. Its contract: per group, the SMALLEST value whose cumulative
weight reaches num/den of the group's total (exact integer comparison
cum * den >= total * num, never floats).

The fuzz drives random grouped integer data (duplicate values, weight
ties, single-row groups, values straddling bucket boundaries — the
bucket width is 32, so values near multiples of 32 exercise the
boundary-bucket resolve path) against a 6-line Python oracle.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_ballista_dhruvil_spark.operators.relational import (
    weighted_quantile,
)

row = st.tuples(
    st.sampled_from(["a", "b", "c"]),          # group
    st.integers(0, 130),                        # value (crosses 32-buckets)
    st.integers(1, 5),                          # positive weight
)
dataset = st.lists(row, min_size=1, max_size=40)
quantile = st.tuples(st.integers(1, 9), st.integers(2, 10)).filter(
    lambda nd: nd[0] < nd[1]
)


def _oracle(rows, num, den):
    out = {}
    for g in {r[0] for r in rows}:
        vals = sorted((v, w) for _, v, w in [r for r in rows if r[0] == g])
        # collapse equal values (the kernel pre-aggregates ties)
        agg: dict[int, int] = {}
        for v, w in vals:
            agg[v] = agg.get(v, 0) + w
        total = sum(agg.values())
        cum = 0
        for v in sorted(agg):
            cum += agg[v]
            if cum * den >= total * num:
                out[g] = v
                break
    return out


@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(dataset, quantile)
def test_weighted_quantile_matches_exact_oracle(spark, rows, q):
    num, den = q
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {
        r.g: r.wq
        for r in weighted_quantile(
            df, value="v", weight="w", group_cols=["g"], qs={"wq": (num, den)}
        ).collect()
    }
    assert got == _oracle(rows, num, den)
