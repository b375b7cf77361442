"""Drive the __spark_entry__ contract exactly like the driver does: load
the entry by file path (foreign cwd), run every query at sf0.01, compare
against its DuckDB oracle with the shared canonical compare."""

import importlib.util
import sys

SF = "/root/testdata/sf0.01"
REPO = "/root/repo"

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", f"{REPO}/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from datafusion_ballista_dhruvil_spark.session import create_session  # noqa: E402

from tools.drive_common import compare_all, make_duckdb  # noqa: E402

spark = create_session(app_name="drive_contract", shuffle_partitions=8)

# entry at sf0.001, twice (idempotence probe)
r1 = mod.entry(spark).collect()
r2 = mod.entry(spark).collect()
print(f"entry: {len(r1)} rows (run2: {len(r2)})", flush=True)
assert len(r1) == len(r2) >= 0

queries = mod.queries()
oracles = mod.oracle_sql()
con = make_duckdb(SF)
n_fails = compare_all(spark, con, queries, oracles, sorted(queries), SF)
spark.stop()
sys.exit(1 if n_fails else 0)
