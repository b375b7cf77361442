"""Drive the __spark_entry__ contract exactly like the driver does."""
import importlib.util
import math
import sys
import time

import duckdb

SF = "/root/testdata/sf0.01"

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from datafusion_ballista_dhruvil_spark.session import TABLE_NAMES, create_session

spark = create_session(app_name="drive_contract", shuffle_partitions=8)

# entry at sf0.001, twice (idempotence probe)
r1 = mod.entry(spark).collect()
r2 = mod.entry(spark).collect()
print(f"entry: {len(r1)} rows (run2: {len(r2)})", flush=True)
assert len(r1) == len(r2) >= 0

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
fails = []
t0 = time.time()
for name in sorted(queries):
    try:
        sdf = queries[name](spark, SF)
        scols = [c.lower() for c in sdf.columns]
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name}: rows-only, {len(srows)} rows")
            continue
        cur = con.execute(oracles[name])
        ocols = [d[0].lower() for d in cur.description]
        orows = cur.fetchall()
        if sorted(scols) != sorted(ocols):
            fails.append((name, f"cols {scols} vs {ocols}"))
            continue
        if len(srows) != len(orows):
            fails.append((name, f"rowcount {len(srows)} vs {len(orows)}"))
            continue
        so = sorted(range(len(scols)), key=lambda i: scols[i])
        oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
        sn = sorted(tuple(canon(r[i]) for i in so) for r in srows)
        on = sorted(tuple(canon(r[i]) for i in oo) for r in orows)
        bad = [(a, b) for a, b in zip(sn, on) if a != b]
        if bad:
            fails.append((name, f"{len(bad)}/{len(sn)} rows differ; first {bad[0]}"))
        else:
            print(f"{name}: MATCH {len(sn)} rows")
    except Exception as ex:
        fails.append((name, f"{type(ex).__name__}: {str(ex)[:200]}"))

print(f"\n{len(queries)} queries in {time.time()-t0:.1f}s; {len(fails)} failures")
for n, m in fails:
    print("FAIL", n, m)
spark.stop()
sys.exit(1 if fails else 0)
