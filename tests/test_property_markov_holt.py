"""Property-based conformance for the last two hash-gate-load-bearing
generated-CTE kernels (VERDICT r9 #7): ev_markov_attribution's
removal-effect fixed point and ev_forecast_holt's recurrence-vs-
recursive-CTE equivalence.

Pattern follows test_property_pq: hypothesis generates a synthetic
events table, the REAL registry query runs on it, and a from-scratch
Python oracle (no code shared with the kernel) must match cell-for-cell.
The Holt fuzz additionally runs the module's recursive-CTE SQL in DuckDB
over the same daily series, pinning the three-way equivalence
Python-recurrence == applyInPandas kernel == recursive CTE.

Event streams deliberately include the kernel's failure surfaces:
single-event users (START->type then type->NULL), users whose journey
starts OR ends at 'purchase' (absorbing-state edges), channels that
never reach purchase (conv 0 => NULL removal effect), duplicate
timestamps (the event_id tiebreak), and day gaps (the Holt day index is
row_number over PRESENT days, not calendar arithmetic).
"""

from __future__ import annotations

import datetime

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_ballista_dhruvil_spark.operators import load_all
from datafusion_ballista_dhruvil_spark.operators.registry import QUERIES

load_all()

CHANNELS = ["click", "view", "email", "social", "purchase"]

#: (user_id, channel_index, ts_offset_seconds) triples; duplicate
#: (user, ts) pairs are allowed — event_id breaks the tie in both the
#: kernel and the oracle
event = st.tuples(
    st.integers(0, 5), st.integers(0, 4), st.integers(0, 3600)
)
stream = st.lists(event, min_size=1, max_size=40)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def _markov_expected(rows):
    """From-scratch removal-effect attribution (integer ppm algebra)."""
    by_user: dict[int, list] = {}
    for eid, ts, uid, typ, _v, _p in rows:
        by_user.setdefault(uid, []).append((ts, eid, typ))
    trans: dict[tuple[str, str], int] = {}

    def bump(s, d):
        trans[(s, d)] = trans.get((s, d), 0) + 1

    for uid, evs in by_user.items():
        evs.sort()
        types = [t for _, _, t in evs]
        bump("START", types[0])
        for i, s in enumerate(types):
            if s == "purchase":
                continue
            d = types[i + 1] if i + 1 < len(types) else "NULL"
            bump(s, d)
    rowsum: dict[str, int] = {}
    for (s, _d), n in trans.items():
        rowsum[s] = rowsum.get(s, 0) + n
    base = [
        (s, d, n * 1_000_000 // rowsum[s]) for (s, d), n in trans.items()
    ]
    channels = sorted(
        {t for _, _, _, t, _, _ in rows if t != "purchase"}
    )

    def conv(removed):
        mat = [
            (s, d, p)
            for s, d, p in base
            if removed is None or (s != removed and d != removed)
        ]
        pconv = {s: p for s, d, p in mat if d == "purchase"}
        tmat = [(s, d, p) for s, d, p in mat if d not in ("purchase", "NULL")]
        states = {s for s, _, _ in mat}
        v = {s: pconv.get(s, 0) for s in states}
        for _ in range(5):
            acc: dict[str, int] = {}
            for s, d, p in tmat:
                if d in v:
                    acc[s] = acc.get(s, 0) + p * v[d]
            v = {
                s: pconv.get(s, 0) + acc.get(s, 0) // 1_000_000
                for s in states
            }
        return v.get("START", 0)

    full = conv(None)
    effs = {}
    per = []
    for c in channels:
        removed = conv(c)
        effs[c] = (
            1_000_000 - removed * 1_000_000 // full if full > 0 else None
        )
        per.append((c, full, removed))
    total = sum(e for e in effs.values() if e is not None)
    return [
        (
            c,
            f,
            r,
            effs[c],
            (
                effs[c] * 1_000_000 // total
                if effs[c] is not None and total > 0
                else None
            ),
        )
        for c, f, r in per
    ]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(stream)
def test_markov_removal_effect_matches_first_principles(
    spark, tmp_path_factory, evs
):
    base_ts = datetime.datetime(2024, 1, 1)
    rows = [
        (
            eid,
            base_ts + datetime.timedelta(seconds=off),
            uid,
            CHANNELS[ci],
            1.0,
            "{}",
        )
        for eid, (uid, ci, off) in enumerate(evs)
    ]
    sf_dir = tmp_path_factory.mktemp("markov_fuzz")
    _write_events(spark, sf_dir, rows)
    got = [
        (
            r.channel,
            r.conv_full_ppm,
            r.conv_removed_ppm,
            r.removal_effect_ppm,
            r.attribution_ppm,
        )
        for r in QUERIES["ev_markov_attribution"](spark, str(sf_dir)).collect()
    ]
    assert got == _markov_expected(rows)


# ---- Holt recurrence vs recursive CTE -------------------------------------

#: per-day event counts for <= 15 distinct days with gaps; counts 1..9
holt_series = st.lists(
    st.tuples(st.integers(0, 20), st.integers(1, 9)),
    min_size=1,
    max_size=15,
    unique_by=lambda t: t[0],
)


def _holt_py(values):
    """The docstring's recurrence, re-derived: alpha=1/2, beta=1/4."""
    out = []
    lv = tr = 0.0
    for i, v in enumerate(values):
        if i == 0:
            lv, tr = float(v), 0.0
        else:
            new_lv = 0.5 * float(v) + 0.5 * (lv + tr)
            tr = 0.25 * (new_lv - lv) + 0.75 * tr
            lv = new_lv
        out.append((lv, tr))
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(holt_series)
def test_holt_kernel_matches_recurrence_and_recursive_cte(
    spark, tmp_path_factory, series
):
    series = sorted(series)
    base = datetime.date(2024, 1, 1)
    rows = []
    eid = 0
    for day_off, n in series:
        for k in range(n):
            rows.append(
                (
                    eid,
                    datetime.datetime.combine(
                        base + datetime.timedelta(days=day_off),
                        datetime.time(1, 0, 0),
                    )
                    + datetime.timedelta(seconds=k),
                    eid % 3,
                    "click",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    sf_dir = tmp_path_factory.mktemp("holt_fuzz")
    _write_events(spark, sf_dir, rows)
    got = [
        (r.d, r.day, r.observed, r.level, r.trend, r.forecast_next)
        for r in QUERIES["ev_forecast_holt"](spark, str(sf_dir)).collect()
    ]
    # 1) the recurrence, re-derived in plain Python — exact doubles
    values = [float(n) for _, n in series]
    days = [str(base + datetime.timedelta(days=d)) for d, _ in series]
    expected = [
        (i, days[i], values[i], lv, tr, lv + tr)
        for i, (lv, tr) in enumerate(_holt_py(values))
    ]
    assert got == expected
    # 2) the module's recursive CTE, run in DuckDB on the same series —
    #    the generated-SQL side of the equivalence the oracle relies on
    from datafusion_ballista_dhruvil_spark.streaming.events import (
        _HOLT_RECURSE_SQL,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE daily AS SELECT * FROM (VALUES "
        + ", ".join(
            # CAST: a bare numeric literal parses as DECIMAL in DuckDB
            # and would run the recurrence in decimal arithmetic; the
            # real daily series is CAST(COUNT(*) AS DOUBLE)
            f"({i}, DATE '{days[i]}', CAST({values[i]} AS DOUBLE))"
            for i in range(len(values))
        )
        + ") t(d, day, v)"
    )
    cte = con.execute(_HOLT_RECURSE_SQL).fetchall()
    assert [
        (d, day, obs, lv, tr, fc) for d, day, obs, lv, tr, fc in cte
    ] == expected
