"""SQL serving endpoint smoke (FlightSQL/JDBC parity — reference
ballista/scheduler/src/flight_sql.rs:87-146): boot the Thrift endpoint in
the driver, then run queries against this engine's data through the REAL
JDBC wire protocol and compare with direct execution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_ballista_dhruvil_spark.serving import jdbc_query, start_sql_endpoint

from tests.conftest import SF_DIR

PORT = 10124


@pytest.fixture(scope="module")
def endpoint(spark):
    server = start_sql_endpoint(spark, port=PORT)
    yield server
    server.stop()


def test_jdbc_select_scalar(spark, endpoint):
    assert jdbc_query(spark, "SELECT 1 + 1 AS two", port=PORT) == [("2",)]


def test_jdbc_query_served_view_matches_direct(spark, endpoint):
    """An external client's aggregate over a served view must equal the
    engine's own result. Global temp views are the cross-session serving
    surface (a Thrift connection is its own Spark session)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.createOrReplaceGlobalTempView("served_docs")
    got = jdbc_query(
        spark,
        "SELECT source, count(*) AS n, sum(n_chars) AS sc "
        "FROM global_temp.served_docs GROUP BY source ORDER BY source",
        port=PORT,
    )
    exp = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("sc"))
        .orderBy("source")
        .collect()
    )
    assert got == [tuple(str(v) for v in r) for r in exp]
    assert len(got) >= 5
