"""register_catalog (fork addition parity: ballista/client/src/context.rs:
256-272 + IcebergExtensionCodec, serde/mod.rs:90) proven end-to-end.

The Iceberg runtime jar is not obtainable in this container (no network, no
local cache — see COVERAGE.md §2.7), but Iceberg's SparkCatalog is just a
Spark CatalogPlugin; the SAME registration -> multi-catalog-identifier ->
read path is exercised here with a CatalogPlugin that IS shipped
(JDBCTableCatalog over embedded Derby). A second test pins the gate
behavior when the Iceberg class is genuinely absent: a clear, actionable
error — not a silent fallback."""

from __future__ import annotations

import pytest

from datafusion_ballista_dhruvil_spark.context import BallistaSparkContext


def test_register_catalog_create_insert_read(spark, tmp_path):
    """Full catalog-plugin lifecycle through the context API: register the
    catalog, create a namespace + table IN it, write, then read back both
    via SQL and via ctx.read_table with a catalog-qualified name."""
    ctx = BallistaSparkContext(spark)
    ctx.register_catalog(
        "lake",
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog",
        url=f"jdbc:derby:{tmp_path}/derby_cat;create=true",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    ctx.sql("CREATE SCHEMA IF NOT EXISTS lake.demo")
    ctx.sql("CREATE TABLE lake.demo.orders_sm (o_id BIGINT, status STRING)")
    ctx.sql(
        "INSERT INTO lake.demo.orders_sm VALUES (1, 'open'), (2, 'done'), (3, 'open')"
    )
    got = ctx.sql(
        "SELECT status, count(*) AS n FROM lake.demo.orders_sm "
        "GROUP BY status ORDER BY status"
    ).collect()
    assert [(r.status, r.n) for r in got] == [("done", 1), ("open", 2)]
    # read_table with a catalog-qualified identifier (context.rs:333-341)
    tbl = ctx.read_table("lake.demo.orders_sm")
    assert tbl.count() == 3


ICEBERG_DRIVER_SRC = '''\
import os, sys

from pyspark.sql import SparkSession

jar, wh = sys.argv[1], sys.argv[2]
spark = (
    SparkSession.builder.master("local[2]")
    .appName("iceberg-integration")
    .config("spark.jars", jar)
    .config("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.ice.type", "hadoop")
    .config("spark.sql.catalog.ice.warehouse", wh)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sql("CREATE NAMESPACE IF NOT EXISTS ice.db")
spark.sql("CREATE TABLE ice.db.t (id BIGINT, v STRING) USING iceberg")
spark.sql("INSERT INTO ice.db.t VALUES (1, 'a'), (2, 'b')")
spark.sql("INSERT INTO ice.db.t VALUES (3, 'c')")
rows = spark.sql("SELECT count(*) AS n FROM ice.db.t").collect()
assert rows[0].n == 3, rows
snaps = spark.sql("SELECT count(*) AS n FROM ice.db.t.snapshots").collect()
assert snaps[0].n >= 2, snaps  # metadata table proves Iceberg, not a misroute
print("ICEBERG_OK")
spark.stop()
'''


@pytest.mark.skipif(
    "ICEBERG_JAR" not in __import__("os").environ,
    reason="set ICEBERG_JAR=/path/to/iceberg-spark-runtime_*.jar to run "
    "(jar unobtainable in this container: no network, no cache)",
)
def test_iceberg_runtime_integration(tmp_path):
    """Real Iceberg read/write (reference fork feature #1: iceberg-rust dep,
    Cargo.toml:44-46 + IcebergExtensionCodec, serde/mod.rs:90). Runs only
    when ICEBERG_JAR points at an iceberg-spark-runtime jar — a cluster
    user gets instant validation; in-container it skips with the recipe."""
    import os
    import subprocess
    import sys

    driver = tmp_path / "ice_driver.py"
    driver.write_text(ICEBERG_DRIVER_SRC)
    proc = subprocess.run(
        [
            sys.executable,
            str(driver),
            os.environ["ICEBERG_JAR"],
            str(tmp_path / "warehouse"),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ICEBERG_OK" in proc.stdout


def test_iceberg_catalog_gate_is_explicit(spark):
    """With no Iceberg jar on the classpath, using a registered Iceberg
    catalog must fail LOUDLY with the class name in the error (so the
    remediation — add the iceberg-spark-runtime jar — is obvious), never
    silently misroute to the session catalog."""
    ctx = BallistaSparkContext(spark)
    ctx.register_catalog(
        "ice",
        "org.apache.iceberg.spark.SparkCatalog",
        type="hadoop",
        warehouse="/tmp/ice_wh",
    )
    with pytest.raises(Exception) as ei:
        ctx.sql("SELECT * FROM ice.db.t").collect()
    msg = str(ei.value)
    assert "org.apache.iceberg.spark.SparkCatalog" in msg or "SparkCatalog" in msg
