"""Source/sink connector round-trip queries (SURVEY.md §2.7) with DuckDB
oracles, so the driver's correctness gate exercises the actual read paths —
not just unit tests.

Each query materializes a bounded slice of the testdata through a format's
write+read path (CSV / NDJSON via Spark's native connectors, Avro via
sources/avro_py's jar-less container codec — reference read_avro/
register_avro, ballista/client/src/context.rs:217-341) and aggregates the
re-read rows. The oracle computes the same aggregate straight from parquet:
hash-equality proves the round-trip is lossless, byte-exact, and
schema-faithful.

The staging directory lives under /tmp, keyed by sf_dir, overwritten each
run — the queries stay deterministic and re-runnable (bench runs them 3x).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_ballista_dhruvil_spark.operators.registry import query
from datafusion_ballista_dhruvil_spark.session import Tables
from datafusion_ballista_dhruvil_spark.sources import readers
from datafusion_ballista_dhruvil_spark.sources.avro_py import write_avro_py


def _stage(spark: SparkSession, sf_dir: str, name: str) -> str:
    # Keyed by applicationId as well as sf_dir: this machine runs concurrent
    # driver/test sessions, and a shared path + mode='overwrite' lets one
    # session delete part files while another's lazy read is still listing
    # them. One staging tree per Spark application cannot collide.
    tag = re.sub(r"\W+", "_", sf_dir.strip("/"))
    app = spark.sparkContext.applicationId
    return f"/tmp/spark_graft_connectors/{app}/{tag}/{name}"


@query(
    "avro_roundtrip_agg",
    oracle="""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents WHERE doc_id < 500
GROUP BY source ORDER BY source
""",
)
def avro_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> Avro container files (per-partition, deflate) -> read
    back through read_avro (spark-avro jar when present, pure-Python codec
    fallback otherwise) -> aggregate. Hash-matching the parquet oracle
    proves the Avro path end-to-end."""
    t = Tables(spark, sf_dir)
    src = t.documents.where(F.col("doc_id") < 500).select(
        "doc_id", "source", "n_chars"
    )
    path = _stage(spark, sf_dir, "avro_docs")
    write_avro_py(src, path, mode="overwrite")
    back = readers.read_avro(spark, path)
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


@query(
    "csv_roundtrip_agg",
    oracle="""
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE doc_id < 400
GROUP BY source, lang ORDER BY source, lang
""",
)
def csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> CSV (header, explicit schema on re-read: inference is
    not part of the determinism contract) -> aggregate."""
    t = Tables(spark, sf_dir)
    src = t.documents.where(F.col("doc_id") < 400).select(
        "doc_id", "source", "lang", "n_chars"
    )
    path = _stage(spark, sf_dir, "csv_docs")
    readers.write_csv(src, path, mode="overwrite")
    back = readers.read_csv(
        spark,
        path,
        schema="doc_id long, source string, lang string, n_chars long",
    )
    return (
        back.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("source", "lang")
    )


@query(
    "json_roundtrip_agg",
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(user_id) AS BIGINT) AS sum_users,
       CAST(SUM(event_id) AS BIGINT) AS sum_ids
FROM events WHERE event_id < 2000
GROUP BY event_type ORDER BY event_type
""",
)
def json_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> NDJSON (DataFusion's JSON format is newline-delimited,
    Spark's default) -> re-read with explicit schema -> aggregate."""
    t = Tables(spark, sf_dir)
    src = t.events.where(F.col("event_id") < 2000).select(
        "event_id", "event_type", "user_id"
    )
    path = _stage(spark, sf_dir, "json_events")
    readers.write_json(src, path, mode="overwrite")
    back = readers.read_json(
        spark, path, schema="event_id long, event_type string, user_id long"
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("user_id").cast("bigint").alias("sum_users"),
            F.sum("event_id").cast("bigint").alias("sum_ids"),
        )
        .orderBy("event_type")
    )


@query(
    "snapshot_timetravel_agg",
    oracle="""
WITH v0 AS (SELECT source, n_chars FROM documents WHERE doc_id < 300),
v1 AS (
  SELECT source,
         CASE WHEN doc_id % 7 = 0 THEN n_chars + 1 ELSE n_chars END AS n_chars
  FROM documents WHERE doc_id < 500
)
SELECT 'v0' AS version, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM v0 GROUP BY source
UNION ALL
SELECT 'v1', source, COUNT(*), CAST(SUM(n_chars) AS BIGINT)
FROM v1 GROUP BY source
ORDER BY version, source
""",
)
def snapshot_timetravel_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-log table round-trip with TIME TRAVEL under the driver's
    hash gate: documents -> snapshot v0 (append) -> snapshot v1
    (overwrite, edited rows) -> read BOTH versions back (v0 via time
    travel, v1 as latest) -> per-version aggregate. Hash-matching the
    oracle (which recomputes both versions from the source parquet)
    proves commit, manifest resolution, and historical reads end-to-end
    (sources/snapshots.py — the Iceberg-semantics surface).
    """
    import shutil

    from datafusion_ballista_dhruvil_spark.sources.snapshots import (
        commit,
        read_snapshot,
    )

    t = Tables(spark, sf_dir)
    root = _stage(spark, sf_dir, "snap_docs")
    shutil.rmtree(root, ignore_errors=True)  # re-runnable within a session
    v0 = t.documents.where(F.col("doc_id") < 300).select(
        "doc_id", "source", "n_chars"
    )
    commit(v0, root, "append")
    v1 = t.documents.where(F.col("doc_id") < 500).select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 7 == 0, F.col("n_chars") + 1)
        .otherwise(F.col("n_chars"))
        .alias("n_chars"),
    )
    commit(v1, root, "overwrite")

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("source").agg(
            F.lit(tag).alias("version"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        ).select("version", "source", "n_docs", "sum_chars")

    old = agg(read_snapshot(spark, root, version=0), "v0")
    new = agg(read_snapshot(spark, root), "v1")
    return old.unionAll(new).orderBy("version", "source")


@query(
    "partitioned_roundtrip_agg",
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       MIN(event_id) AS min_id, MAX(event_id) AS max_id
FROM events WHERE event_type IN ('click', 'purchase')
GROUP BY event_type ORDER BY event_type
""",
)
def partitioned_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> Hive-partitioned parquet (partitionBy event_type, the
    layout a 100 TB event lake actually uses) -> read back with a
    partition-key filter -> aggregate. Hash-matching the unpartitioned
    oracle proves BOTH directions of the partition contract: the writer
    moved the key out of the data files into directory names, and the
    reader reconstructed it (and pruned — the filter appears as
    PartitionFilters, gated in tests/test_plans.py's static-pruning test)
    without loss. The partition column round-trips as its original type
    via the schema-typed read.
    """
    t = Tables(spark, sf_dir)
    path = _stage(spark, sf_dir, "events_by_type")
    t.events.select("event_id", "event_type", "value").write.mode(
        "overwrite"
    ).partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).where(
        F.col("event_type").isin("click", "purchase")
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_cents"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
        .orderBy("event_type")
    )


@query(
    "xml_roundtrip_agg",
    oracle="""
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS sum_ids,
       CAST(SUM(user_id) AS BIGINT) AS sum_users,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events WHERE event_id < 2000
GROUP BY event_type ORDER BY event_type
""",
)
def xml_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> XML (Spark 4's built-in XML data source, one <event>
    element per row) -> re-read with explicit schema -> aggregate. The
    reference's format surface is CSV/Parquet/Avro/JSON; XML is the
    document-interchange format Spark 4 adds natively, and the hash gate
    proves the escape/parse cycle is lossless — including doubles, whose
    shortest-round-trip decimal rendering (Java Double.toString) must
    re-parse to the identical bits for MIN/MAX to hash-match the parquet
    oracle.

    Scale: the write is per-partition (no shuffle); re-read with an
    explicit schema skips inference's extra pass. Row-per-element XML
    splits like any text format, so parallelism survives large files.
    """
    t = Tables(spark, sf_dir)
    src = t.events.where(F.col("event_id") < 2000).select(
        "event_id", "event_type", "user_id", "value"
    )
    path = _stage(spark, sf_dir, "xml_events")
    (
        src.write.format("xml")
        .option("rowTag", "event")
        .mode("overwrite")
        .save(path)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "event")
        .schema("event_id long, event_type string, user_id long, value double")
        .load(path)
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("event_id").cast("bigint").alias("sum_ids"),
            F.sum("user_id").cast("bigint").alias("sum_users"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


@query(
    "schema_evolution_agg",
    oracle="""
WITH unioned AS (
  SELECT event_id, event_type, NULL::DOUBLE AS value
  FROM events WHERE event_id < 1000
  UNION ALL
  SELECT event_id, event_type, value
  FROM events WHERE event_id >= 1000 AND event_id < 2000
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(value) AS BIGINT) AS n_with_value,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM unioned GROUP BY event_type ORDER BY event_type
""",
)
def schema_evolution_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet schema evolution: a dataset written in two schema versions
    (v1 lacks the ``value`` column; v2 adds it) is read back as ONE table
    with ``mergeSchema`` — old files surface NULL for the added column.
    This is the lakehouse append-only evolution contract (the reference's
    listing-table scan resolves a unified schema the same way); the oracle
    reproduces it as an explicit UNION ALL with a NULL column, so the hash
    gate proves NULL-fill, column alignment, and aggregate NULL-skipping
    all behave.

    Scale: mergeSchema's footer reconciliation is a driver-side metadata
    pass (bounded by file count, not rows); per-file reads still prune and
    push down. The aggregate itself is one shuffle.
    """
    t = Tables(spark, sf_dir)
    root = _stage(spark, sf_dir, "evolving_events")
    v1 = t.events.where(F.col("event_id") < 1000).select(
        "event_id", "event_type"
    )
    v2 = t.events.where(
        (F.col("event_id") >= 1000) & (F.col("event_id") < 2000)
    ).select("event_id", "event_type", "value")
    v1.write.mode("overwrite").parquet(root + "/v=1")
    v2.write.mode("overwrite").parquet(root + "/v=2")
    back = spark.read.option("mergeSchema", "true").parquet(
        root + "/v=1", root + "/v=2"
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("value").cast("bigint").alias("n_with_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


@query(
    "orc_roundtrip_agg",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS sum_ids,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       MIN(ts) AS min_ts, MAX(ts) AS max_ts
FROM events WHERE event_id < 2000
GROUP BY event_type ORDER BY event_type
""",
)
def orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> ORC (Spark's native columnar source alongside Parquet;
    the reference's listing-table format surface,
    ballista/client/src/context.rs:217-341) -> re-read -> aggregate. The
    hash gate proves the ORC write/read cycle is lossless for longs,
    strings, doubles AND timestamps — ORC's timestamp encoding is the
    historically tz-fragile one, so min/max ts hash-matching the parquet
    oracle under the pinned-UTC session is the point of the query. Doubles
    are summed as floor(value*100) cents: IEEE multiply + floor is
    bit-deterministic in both engines, where a raw double SUM is
    accumulation-order-dependent.

    Scale: per-partition write (no shuffle), vectorized ORC reader with
    predicate pushdown on re-read; one shuffle for the aggregate.
    """
    t = Tables(spark, sf_dir)
    src = t.events.where(F.col("event_id") < 2000).select(
        "event_id", "ts", "event_type", "value"
    )
    path = _stage(spark, sf_dir, "orc_events")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("event_id").cast("bigint").alias("sum_ids"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_cents"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .orderBy("event_type")
    )


@query(
    "snapshot_pysource_agg",
    oracle="""
WITH v0 AS (SELECT lang, n_chars FROM documents WHERE doc_id % 2 = 0),
v1 AS (SELECT lang, n_chars FROM documents)
SELECT 'v0' AS version, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM v0 GROUP BY lang
UNION ALL
SELECT 'latest', lang, COUNT(*), CAST(SUM(n_chars) AS BIGINT)
FROM v1 GROUP BY lang
ORDER BY version, lang
""",
)
def snapshot_pysource_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom TableProvider end-to-end under the hash gate: the snapshot
    manifest-log table is read back through the registered Python
    DataSource (``format("snapshot_log")`` — sources/pysource.py, the
    Spark 4 pluggable-provider API), once at an explicit version and once
    at latest, then aggregated. One input partition per immutable data
    file, Arrow-batch ingest on the executors — the PySpark-native
    counterpart of the reference's Iceberg TableProvider scan
    (core/src/serde/mod.rs:90).
    """
    import shutil

    from datafusion_ballista_dhruvil_spark.sources.pysource import register
    from datafusion_ballista_dhruvil_spark.sources.snapshots import commit

    t = Tables(spark, sf_dir)
    register(spark)
    root = _stage(spark, sf_dir, "snap_pysource")
    shutil.rmtree(root, ignore_errors=True)  # re-runnable within a session
    docs = t.documents.select("doc_id", "lang", "n_chars")
    commit(docs.where(F.col("doc_id") % 2 == 0), root, "append")
    commit(docs, root, "overwrite")

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("lang").agg(
            F.lit(tag).alias("version"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        ).select("version", "lang", "n_docs", "sum_chars")

    v0 = spark.read.format("snapshot_log").option("version", 0).load(root)
    latest = spark.read.format("snapshot_log").load(root)
    return agg(v0, "v0").unionAll(agg(latest, "latest")).orderBy(
        "version", "lang"
    )
