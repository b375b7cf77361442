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
