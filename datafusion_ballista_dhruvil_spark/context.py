"""BallistaContext-parity API (SURVEY.md §7 step 1).

Mirrors the reference client surface (ballista/client/src/context.rs) on top
of a SparkSession. Where the reference hand-rolls distribution (gRPC to a
scheduler, Flight result fetch — context.rs:217-261 + distributed_query.rs),
Spark's driver/DAGScheduler does it natively, so every method here is a thin,
faithful name-for-name veneer:

  reference (context.rs)            here
  BallistaContext::standalone()     BallistaSparkContext(create_session())
  ctx.sql(sql)                      .sql() — incl. SHOW handling (:342-371)
                                    and CREATE EXTERNAL TABLE DDL (:420-470)
  ctx.read_csv/parquet/avro/json    .read_* (:217-254)
  ctx.register_csv/parquet/avro     .register_* (:263-331)
  ctx.register_table(name, df)      .register_table
  ctx.read_table(name)              .read_table (:333-341 fork addition)
  df.write_parquet/write_csv        .write_parquet/.write_csv (:522-555)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from datafusion_ballista_dhruvil_spark.functions.compat import register_compat_functions
from datafusion_ballista_dhruvil_spark.session import create_session
from datafusion_ballista_dhruvil_spark.sources import readers
from datafusion_ballista_dhruvil_spark.sql.rewrite import rewrite_sql


class BallistaSparkContext:
    """User-facing context with the reference client's API shape."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or create_session()
        register_compat_functions(self.spark)

    # -- SQL ---------------------------------------------------------------
    def sql(self, sql: str) -> DataFrame:
        """Run SQL through the dialect shim.

        Parity notes: the reference pre-scans for SHOW statements and
        enables its info schema (context.rs:342-371) — Spark's catalog
        serves SHOW TABLES/COLUMNS natively. CREATE EXTERNAL TABLE DDL
        (context.rs:420-470) is rewritten to CREATE TABLE ... USING.
        """
        return self.spark.sql(rewrite_sql(sql))

    # -- readers -----------------------------------------------------------
    def read_csv(self, path: str, schema: StructType | str | None = None,
                 has_header: bool = True, delimiter: str = ",", **options) -> DataFrame:
        return readers.read_csv(self.spark, path, schema, has_header, delimiter, **options)

    def read_parquet(self, path: str, **options) -> DataFrame:
        return readers.read_parquet(self.spark, path, **options)

    def read_json(self, path: str, schema: StructType | str | None = None,
                  **options) -> DataFrame:
        return readers.read_json(self.spark, path, schema, **options)

    def read_avro(self, path: str, **options) -> DataFrame:
        return readers.read_avro(self.spark, path, **options)

    # -- catalog registration ---------------------------------------------
    def register_csv(self, name: str, path: str, **kwargs) -> None:
        self.read_csv(path, **kwargs).createOrReplaceTempView(name)

    def register_parquet(self, name: str, path: str, **kwargs) -> None:
        self.read_parquet(path, **kwargs).createOrReplaceTempView(name)

    def register_json(self, name: str, path: str, **kwargs) -> None:
        self.read_json(path, **kwargs).createOrReplaceTempView(name)

    def register_avro(self, name: str, path: str, **kwargs) -> None:
        self.read_avro(path, **kwargs).createOrReplaceTempView(name)

    def register_table(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)

    def read_table(self, name: str) -> DataFrame:
        """Fork addition parity (context.rs:333-341)."""
        return self.spark.table(name)

    def register_catalog(self, name: str, catalog_impl: str, **conf: str) -> None:
        """Catalog-plugin registration (fork addition parity,
        context.rs:256-272 + IcebergExtensionCodec wiring, serde/mod.rs:90).

        Registers any Spark CatalogPlugin under ``name`` so tables resolve
        via ``name.namespace.table`` identifiers. The full lifecycle
        (register -> CREATE SCHEMA/TABLE -> INSERT -> read) is
        end-to-end-tested in tests/test_catalog.py with the shipped
        JDBCTableCatalog over embedded Derby — the identical plugin
        mechanism Iceberg's SparkCatalog uses.

        Iceberg itself needs its runtime jar on the classpath, which this
        container cannot obtain (no network, no cached jar). On a cluster
        with jar access::

            spark-submit --packages \\
              org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> ... \\

        then ``register_catalog("ice", "org.apache.iceberg.spark.SparkCatalog",
        type="hadoop", warehouse="s3a://...")``. Using an Iceberg catalog
        without the jar fails loudly with the class name in the error
        (pinned by tests/test_catalog.py) — never a silent misroute.
        """
        self.spark.conf.set(f"spark.sql.catalog.{name}", catalog_impl)
        for k, v in conf.items():
            self.spark.conf.set(f"spark.sql.catalog.{name}.{k}", v)

    # -- writers -----------------------------------------------------------
    def write_parquet(self, df: DataFrame, path: str, **kwargs) -> None:
        readers.write_parquet(df, path, **kwargs)

    def write_csv(self, df: DataFrame, path: str, **kwargs) -> None:
        readers.write_csv(df, path, **kwargs)

    def write_json(self, df: DataFrame, path: str, **kwargs) -> None:
        readers.write_json(df, path, **kwargs)

    # -- introspection -----------------------------------------------------
    def tables(self) -> list[str]:
        return [t.name for t in self.spark.catalog.listTables()]

    def explain(self, df: DataFrame, mode: str = "formatted") -> str:
        from datafusion_ballista_dhruvil_spark.plans.inspect import explain_string

        return explain_string(df, mode)
