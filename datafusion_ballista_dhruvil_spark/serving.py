"""SQL serving endpoint — FlightSQL/JDBC parity.

The reference scheduler embeds a FlightSQL endpoint so external JDBC/BI
clients can run SQL against the engine (ballista/scheduler/src/
flight_sql.rs:87-146, ~1k LoC of handshake/prepared-statement plumbing).
Spark's equivalent is the HiveServer2-protocol Thrift endpoint; all of its
jars ship with this Spark build, so serving is start-a-server, not
new protocol code.

``start_sql_endpoint`` boots HiveThriftServer2 inside the current driver
(the reference's in-scheduler deployment shape); any HiveServer2 client —
``jdbc:hive2://host:port``, beeline, Tableau/DBeaver — can then run SQL
against this engine's views. ``jdbc_query`` is a minimal JDBC client over
py4j used by the smoke tests: the query round-trips through the REAL wire
protocol (Thrift SASL -> HiveServer2 -> Spark SQL), not a shortcut.

Cross-session visibility: a Thrift connection is its own Spark session, so
serve GLOBAL temp views (``df.createOrReplaceGlobalTempView``; query as
``global_temp.<name>``) or catalog tables — plain temp views are invisible
to it unless the parent session was created with
``spark.sql.hive.thriftServer.singleSession=true``.
"""

from __future__ import annotations

import socket
import time

from pyspark.sql import SparkSession


def start_sql_endpoint(spark: SparkSession, port: int = 10000, timeout_s: float = 30.0):
    """Start the Thrift SQL endpoint on ``port`` inside this driver and
    block until it accepts connections. Returns the server handle
    (``handle.stop()`` shuts it down)."""
    jvm = spark.sparkContext._jvm
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "hive.server2.thrift.port", str(port)
    )
    # refuse a port something else already owns: the JVM server start is
    # async, and a readiness probe against a foreign listener would hand
    # back a dead handle that silently queries the wrong server
    occupied = False
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=0.5):
            occupied = True
    except OSError:
        pass
    if occupied:
        raise OSError(
            f"port {port} is already in use — pick another port or stop "
            "the existing listener"
        )
    server = jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(
        spark._jsparkSession.sqlContext()
    )
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                break
        except OSError:
            time.sleep(0.3)
    else:
        raise TimeoutError(f"thrift endpoint did not open port {port} in {timeout_s}s")
    # end-to-end readiness: the wire protocol must answer a real query
    deadline = time.time() + timeout_s
    last: object = None
    while time.time() < deadline:
        try:
            last = jdbc_query(spark, "SELECT 1", port=port)
            if last == [("1",)]:
                return server
        except Exception as e:  # noqa: BLE001 — retried until deadline
            last = e
        time.sleep(0.5)
    raise TimeoutError(
        f"thrift endpoint on port {port} not serving after {timeout_s}s "
        f"(last probe result: {last!r})"
    )


def jdbc_query(
    spark: SparkSession, sql: str, port: int = 10000
) -> list[tuple]:
    """Run ``sql`` through the served endpoint as an external JDBC client
    would (DriverManager -> hive-jdbc -> Thrift wire protocol) and fetch
    all rows as tuples of strings (JDBC ``getString`` rendering)."""
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(
        f"jdbc:hive2://localhost:{port}/default", "", ""
    )
    try:
        st = conn.createStatement()
        rs = st.executeQuery(sql)
        ncols = rs.getMetaData().getColumnCount()
        out: list[tuple] = []
        while rs.next():
            out.append(tuple(rs.getString(i + 1) for i in range(ncols)))
        rs.close()
        st.close()
        return out
    finally:
        conn.close()
