"""Oracle-verify a SUBSET of registry queries (same compare as
drive_contract.py) — the fast loop for optimization rounds: every touched
query re-proves hash-equivalence at sf0.01 (and optionally another SF via
SPARK_GRAFT_VERIFY_SF_DIR) before its change is committed.

Usage: python tools/drive_subset.py name [name...]
"""

import importlib.util
import os
import sys

SF = os.environ.get("SPARK_GRAFT_VERIFY_SF_DIR", "/root/testdata/sf0.01")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", f"{REPO}/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from datafusion_ballista_dhruvil_spark.session import create_session  # noqa: E402
from tools.drive_common import compare_all, make_duckdb  # noqa: E402

names = sys.argv[1:]
queries = mod.queries()
oracles = mod.oracle_sql()
unknown = [n for n in names if n not in queries]
if unknown:
    print(f"unknown queries: {unknown}")
    sys.exit(2)
spark = create_session(app_name="drive_subset", shuffle_partitions=8)
con = make_duckdb(SF)
n_fails = compare_all(spark, con, queries, oracles, names, SF)
spark.stop()
sys.exit(1 if n_fails else 0)
