"""File/source connectors (SURVEY.md §2.7).

Reference surface: read/register CSV, Parquet, Avro, NDJSON
(ballista/client/src/context.rs:217-341) over local FS or object stores
(s3://, azure, gs://, hdfs:// — ballista/core/src/object_store_registry/
mod.rs:26-110). Spark resolves the same URI schemes through its Hadoop
filesystem layer, so path handling is pass-through; only per-format option
names need mapping:

  reference option (ListingTableScanNode, datafusion.proto:87-97)  -> Spark
  csv has_header                                                   -> header
  csv delimiter                                                    -> sep
  json (NDJSON, one object per line)                               -> default
  parquet pruning / enable_pruning                                 -> spark.sql.parquet.filterPushdown (session-level, on)
  file_extension                                                   -> pathGlobFilter

Writes: parquet/csv/json mirrors DataFrame::write_{parquet,csv}
(context.rs:522-555), plus Spark-native partitionBy/compression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    has_header: bool = True,
    delimiter: str = ",",
    file_extension: str | None = None,
    **options: str,
) -> DataFrame:
    """CSV reader (parity: BallistaContext::read_csv, context.rs:236-244;
    CsvFormat options, datafusion.proto:85-90). Schema inference when no
    schema is given, matching the reference's listing-table inference."""
    reader = spark.read.option("header", str(has_header).lower()).option("sep", delimiter)
    if file_extension:
        reader = reader.option("pathGlobFilter", f"*{file_extension}")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_parquet(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """Parquet reader (parity: read_parquet, context.rs:246-254). Predicate
    pushdown / row-group pruning is session-level and on by default
    (reference knob ballista.parquet.pruning, config.rs:38)."""
    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.parquet(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str | None = None,
              **options: str) -> DataFrame:
    """NDJSON reader (parity: read_json, context.rs:217-226 — DataFusion's
    JSON format is newline-delimited, Spark's default)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_avro(spark: SparkSession, path: str, **options: str) -> DataFrame:
    """Avro reader (parity: read_avro, context.rs:228-234). Prefers the
    spark-avro DataSource when it is on the classpath (block-split reads,
    full type coverage); when the jar is absent — as in this container,
    which ships only avro-core — falls back to the pure-Python container
    codec in sources/avro_py.py (distributed per-file decode via
    binaryFile + mapInPandas, JVM-interop-tested in tests/test_avro.py).
    """
    try:
        reader = spark.read.format("avro")
        for k, v in options.items():
            reader = reader.option(k, v)
        df = reader.load(path)
        df.schema  # force resolution
        return df
    except Exception as e:  # AnalysisException: failed to find data source
        # Fall back ONLY when the avro DataSource itself is missing from the
        # classpath. Any other failure (bad path, corrupt file, unsupported
        # avro type) mentioning 'avro' must surface, not silently reroute to
        # a codec with different semantics.
        try:  # Spark 4: getCondition; <=3.x: getErrorClass (deprecated alias)
            cls = e.getCondition() if hasattr(e, "getCondition") else (
                e.getErrorClass() if hasattr(e, "getErrorClass") else None
            )
        except Exception:
            cls = None
        msg = str(e)
        jar_missing = (
            cls == "DATA_SOURCE_NOT_FOUND"
            or "Failed to find data source: avro" in msg
            or "Failed to find the data source: avro" in msg
        )
        if not jar_missing:
            raise
        if options:
            # the fallback codec reads the file's embedded schema and the
            # whole directory — silently ignoring reader options would
            # return different data than asked for
            raise ValueError(
                "spark-avro jar absent and the pure-Python fallback does not "
                f"support reader options {sorted(options)}; add "
                "org.apache.spark:spark-avro_2.13 via spark.jars.packages "
                "or drop the options"
            ) from e
        from datafusion_ballista_dhruvil_spark.sources.avro_py import read_avro_py

        return read_avro_py(spark, path)


def write_parquet(df: DataFrame, path: str, mode: str = "error",
                  partition_by: list[str] | None = None,
                  compression: str = "zstd") -> None:
    """Parquet writer (parity: DataFrame::write_parquet, context.rs:522-538).
    zstd default mirrors modern lake practice; the reference's
    CREATE EXTERNAL TABLE compression options map to `compression`."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "error",
              has_header: bool = True, delimiter: str = ",") -> None:
    """CSV writer (parity: DataFrame::write_csv, context.rs:540-555)."""
    (
        df.write.mode(mode)
        .option("header", str(has_header).lower())
        .option("sep", delimiter)
        .csv(path)
    )


def write_json(df: DataFrame, path: str, mode: str = "error") -> None:
    """NDJSON writer (Spark superset; reference writes only parquet/csv)."""
    df.write.mode(mode).json(path)
