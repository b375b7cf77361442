"""Property-based conformance for the GROUPS-frame emulation rule
(ops_window_groups, SURVEY §2.6): `GROUPS BETWEEN p PRECEDING AND f
FOLLOWING` == a RANGE frame of the same offsets over dense_rank().

The static query pins one shape (+/-1) against a DuckDB oracle; this
fuzz pins the RULE for arbitrary offsets and heavy peer-group ties
(duplicate ORDER BY values are the whole point of GROUPS frames)
against a first-principles Python oracle.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

row = st.tuples(
    st.integers(0, 1),   # partition
    st.integers(0, 5),   # order key (few values -> big peer groups)
    st.integers(1, 9),   # value
)
case = st.tuples(
    st.lists(row, min_size=1, max_size=24),
    st.integers(0, 3),   # preceding groups
    st.integers(0, 3),   # following groups
)


def _oracle(rows, p, f):
    out = {}
    for part in {r[0] for r in rows}:
        part_rows = [r for r in rows if r[0] == part]
        ords = sorted({r[1] for r in part_rows})
        idx = {o: i for i, o in enumerate(ords)}
        for i, (_, o, _) in enumerate(part_rows):
            lo, hi = idx[o] - p, idx[o] + f
            s = sum(
                v for _, oo, v in part_rows if lo <= idx[oo] <= hi
            )
            out.setdefault((part, o), s)  # peers share the frame sum
    return out


@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(case)
def test_groups_frame_emulation_rule(spark, case_):
    rows, p, f = case_
    df = spark.createDataFrame(rows, "part long, o long, v long")
    wd = Window.partitionBy("part").orderBy("o")
    wg = Window.partitionBy("part").orderBy("__dr").rangeBetween(-p, f)
    got = {
        (r.part, r.o): r.s
        for r in df.withColumn("__dr", F.dense_rank().over(wd))
        .select("part", "o", F.sum("v").over(wg).alias("s"))
        .collect()
    }
    assert got == _oracle(rows, p, f)
