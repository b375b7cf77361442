"""Property-based conformance for the as-of join kernel (the union-window
shape behind asof_click_attribution / asof_tolerance_attribution and the
streaming alignment operators).

Contract under fuzz: for every left row, attach the right row with the
greatest right.ts <= left.ts on the same key (inclusive), ties on
right.ts broken by the GREATEST tie value, unmatched left rows keep
NULL, and tolerance_us nulls matches older than left.ts - tolerance.

The oracle is a direct Python scan over the same rows. Edge cases the
strategy forces constantly: equal timestamps across and within sides,
duplicate (key, ts, tie) right rows, keys present on only one side,
tolerance exactly at the boundary (inclusive)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_ballista_dhruvil_spark.operators.temporal import asof_join

_T0 = datetime.datetime(2024, 1, 1)


def _ts(sec: int) -> datetime.datetime:
    return _T0 + datetime.timedelta(seconds=sec)


left_row = st.tuples(st.integers(0, 2), st.integers(0, 30))
# payload derives from (key, ts, tie): exact-duplicate right rows then
# carry equal payloads, keeping the fuzz sound — the kernel's
# determinism contract only covers rows the tie column distinguishes
right_row = st.tuples(
    st.integers(0, 2),          # key
    st.integers(0, 30),         # ts seconds
    st.integers(0, 5),          # tie
).map(lambda r: (r[0], r[1], r[2], 100_000 + r[0] * 10_000 + r[1] * 10 + r[2]))
case = st.tuples(
    st.lists(left_row, min_size=1, max_size=12),
    st.lists(right_row, min_size=0, max_size=12),
    st.one_of(st.none(), st.integers(0, 15)),  # tolerance seconds
)


def _oracle(lrows, rrows, tol_s):
    out = []
    for i, (k, lt) in enumerate(lrows):
        best = None  # (ts, tie, payload)
        for rk, rt, tie, pay in rrows:
            if rk != k or rt > lt:
                continue
            if best is None or (rt, tie) > (best[0], best[1]):
                best = (rt, tie, pay)
        if best is not None and tol_s is not None and lt - best[0] > tol_s:
            best = None
        out.append((i, best[2] if best else None))
    return sorted(out)


@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(case)
def test_asof_join_matches_scan_oracle(spark, case_):
    lrows, rrows, tol_s = case_
    left = spark.createDataFrame(
        [(i, k, _ts(t)) for i, (k, t) in enumerate(lrows)],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, _ts(t), tie, pay) for k, t, tie, pay in rrows],
        "k long, ts timestamp, tie long, pay long",
    )
    got = sorted(
        (r.lid, r.asof_pay)
        for r in asof_join(
            left,
            right,
            on="k",
            ts="ts",
            payload=["pay"],
            tie="tie",
            tolerance_us=None if tol_s is None else tol_s * 1_000_000,
        ).collect()
    )
    assert got == _oracle(lrows, rrows, tol_s)
