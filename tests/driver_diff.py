"""Reproduce the driver's canonical compare locally and cell-diff failures.

Usage: python tests/driver_diff.py q1 q2 ...   (default: the r1 red rows)
       python tests/driver_diff.py all

Mimics the driver: run Spark query + DuckDB oracle at sf0.01, sort columns
by name, sort rows by all columns, stringify floats, diff cell-by-cell.

CANONICALIZER QUIRKS (hard-won; see also tools/drive_common.canon) — the
driver's value-hash is sensitive to all of these, so query + oracle must
agree on MORE than "the same numbers":

- **Type-sensitive hash.** Cells hash as ``f"{type(v).__name__}:{v!r}"``:
  an int 5 != a float 5.0 != Decimal('5'). Cast both sides explicitly —
  e.g. ``CAST(... AS BIGINT)`` in DuckDB vs ``.cast("bigint")`` in Spark —
  whenever an aggregate's natural result type differs (DuckDB SUM(int) is
  HUGEINT/int128; DuckDB AVG is double; Spark SUM(bigint) is bigint,
  decimal sums widen). Money aggregates go through functions/compat.py
  (dsum/avg_money/sql_dsum) for the decimal-scale contract.
- **Date/timestamp rendering.** Spark returns datetime.date /
  datetime.datetime; so does DuckDB — equal only when the SESSION TIMEZONE
  is pinned (create_session sets UTC; ensure_session_confs re-pins it on
  foreign sessions because the testdata parquet is naive-UTC and the
  events TIMESTAMP(NANOS) column is tz-shifted otherwise). Never emit a
  raw now()/current_date — not stable across the two engines.
- **Array/list cells.** Lists are unhashable and their Python repr differs
  (numpy array vs list vs DuckDB list); the canonicalizer cannot factorize
  them. Never emit array-typed output columns: array_join to a string
  (see mm_frame_sample) or explode to scalar rows.
- **Floats must match exactly** (repr-level). Achieved by doing exact
  integer/decimal arithmetic and casting to double at the very END with
  the same operation order in both engines (int64->double rounds the same
  everywhere); half-away-from-zero rounding differences (np.round is
  half-to-even!) are handled by _round_half_away in similarity.py.
- **NULL vs NaN.** None sorts/hashes as a distinct sentinel; float NaN is
  canonicalized separately. DuckDB SUM over an empty group returns NULL
  while a Python-side 0.0 would not — keep WHERE/FILTER semantics aligned.
- **LIMIT/top-k needs a full tie-breaking ORDER BY** in BOTH engines or
  the selected set itself is nondeterministic (row_number over a non-total
  order picks different ties per engine/partitioning).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(names: list[str]) -> None:
    from pyspark.sql import SparkSession

    from datafusion_ballista_dhruvil_spark.operators import load_all, registry

    load_all()

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("driver-diff")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table (stress corpora): directory of part files
            p = os.path.join(p, "*.parquet")
        elif not os.path.exists(p):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    import time as _time

    summary: dict[str, str] = {}
    for name in names:
        print(f"===== {name} =====", flush=True)
        t0 = _time.time()
        try:
            sdf = registry.QUERIES[name](spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            summary[name] = f"SPARK_ERR {type(e).__name__}: {str(e)[:200]}"
            print(summary[name])
            continue
        osql = registry.ORACLES.get(name)
        if osql is None:
            # mimic the driver: canonicalize the spark frame (catches
            # unhashable list-cells even without an oracle)
            try:
                _canon(sdf.astype(str))
                summary[name] = f"no_oracle rows={len(sdf)}"
            except Exception as e:  # noqa: BLE001
                summary[name] = f"CANON_ERR {type(e).__name__}: {str(e)[:120]}"
            print(summary[name])
            continue
        try:
            odf = con.execute(osql).fetchdf()
        except Exception as e:  # noqa: BLE001
            summary[name] = f"ORACLE_ERR {type(e).__name__}: {str(e)[:200]}"
            print(summary[name])
            continue
        try:
            s, o = _canon(sdf), _canon(odf)
        except Exception as e:  # noqa: BLE001
            summary[name] = f"CANON_ERR {type(e).__name__}: {str(e)[:120]}"
            print(summary[name])
            continue
        if sorted(s.columns) != sorted(o.columns):
            summary[name] = f"SCHEMA_MISMATCH spark={list(s.columns)} duck={list(o.columns)}"
            print(summary[name])
            continue
        if len(s) != len(o):
            summary[name] = f"ROWS_MISMATCH spark={len(s)} duck={len(o)}"
            print(summary[name])
            continue
        ndiff = 0
        dtw = ""
        for col in s.columns:
            if str(s[col].dtype) != str(o[col].dtype):
                dtw += f" [{col}: {s[col].dtype} vs {o[col].dtype}]"
            sv, ov = s[col], o[col]
            for i in range(len(s)):
                a, b = sv.iloc[i], ov.iloc[i]
                same = (pd.isna(a) is True and pd.isna(b) is True) or str(a) == str(b)
                if not same:
                    ndiff += 1
                    if ndiff <= 8:
                        print(
                            f"  row {i} col {col}: spark={a!r} ({type(a).__name__}) "
                            f"duck={b!r} ({type(b).__name__})"
                        )
        status = "OK" if ndiff == 0 else f"DIFF cells={ndiff}"
        summary[name] = f"{status} rows={len(s)} {dtw} ({_time.time()-t0:.1f}s)"
        print(summary[name])
    spark.stop()
    print("\n######## SUMMARY ########")
    bad = 0
    for name, st in summary.items():
        flag = "" if st.startswith(("OK", "no_oracle")) else "  <<<< BAD"
        if flag:
            bad += 1
        print(f"{name}: {st}{flag}")
    print(f"\n{bad} bad of {len(summary)}")


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv == ["all"]:
        from datafusion_ballista_dhruvil_spark.operators import load_all, registry

        load_all()
        argv = list(registry.QUERIES)
    main(argv or ["h2o_sum_multi", "ops_window_groups", "ops_agg_weighted_percentile"])
