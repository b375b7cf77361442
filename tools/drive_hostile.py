"""Hostile-session drive: the driver builds its OWN SparkSession (non-UTC tz,
none of create_session's confs). ensure_session_confs must keep every query
hash-stable anyway. Runs a representative subset incl. every events/timestamp
query."""
import importlib.util
import math
import sys

import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from datafusion_ballista_dhruvil_spark.session import TABLE_NAMES

spark = (
    SparkSession.builder.appName("hostile")
    .master("local[8]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

con = duckdb.connect()
for t in TABLE_NAMES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def canon(v):
    if v is None:
        return (0, "")
    if isinstance(v, bool):
        return (1, str(v))
    if isinstance(v, float) and math.isnan(v):
        return (2, "nan")
    return (2, f"{type(v).__name__}:{v!r}")


queries = mod.queries()
oracles = mod.oracle_sql()
subset = [n for n in sorted(queries) if n in oracles and (
    n.startswith(("ev_", "asof_", "range_")) or n in (
        "q1", "q3", "q4", "q10", "q18", "ops_scalar_datetime",
        "ops_table_checksum", "ops_profile_stats", "text_pii_redact",
        "sim_embedding_quantize", "dedup_semantic_keep",
        "ev_cohort_retention", "avro_roundtrip_agg", "csv_roundtrip_agg",
        "json_roundtrip_agg", "hybrid_search_rrf", "sim_random_projection",
        "text_bigram_lm_score", "text_chunk_crossdup",
        "dedup_chunk_pagerank", "sim_kmeans_iterate",
    ))]
fails = []
for name in subset:
    try:
        sdf = queries[name](spark, SF)
        scols = [c.lower() for c in sdf.columns]
        srows = [tuple(r) for r in sdf.collect()]
        cur = con.execute(oracles[name])
        ocols = [d[0].lower() for d in cur.description]
        orows = cur.fetchall()
        so = sorted(range(len(scols)), key=lambda i: scols[i])
        oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
        sn = sorted(tuple(canon(r[i]) for i in so) for r in srows)
        on = sorted(tuple(canon(r[i]) for i in oo) for r in orows)
        ok = sorted(scols) == sorted(ocols) and sn == on
        print(name, "MATCH" if ok else "MISMATCH")
        if not ok:
            bad = [(a, b) for a, b in zip(sn, on) if a != b]
            fails.append((name, bad[:1]))
    except Exception as ex:
        fails.append((name, f"{type(ex).__name__}: {str(ex)[:200]}"))
        print(name, "ERROR")

print(f"\n{len(subset)} hostile-session queries; {len(fails)} failures")
for f in fails:
    print("FAIL", f)
spark.stop()
sys.exit(1 if fails else 0)
