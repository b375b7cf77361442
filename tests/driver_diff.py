"""Reproduce the driver's canonical compare locally and cell-diff failures.

Usage: python tests/driver_diff.py q1 q2 ...   (default: the r1 red rows)

Mimics the driver: run Spark query + DuckDB oracle at sf0.01, sort columns
by name, sort rows by all columns, stringify floats, diff cell-by-cell.
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
        if os.path.exists(p):
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
