"""SparkSession factory + table registration.

Parity notes (reference config surface, ballista/core/src/config.rs:183-208):
- ``ballista.shuffle.partitions`` (default 16)      -> spark.sql.shuffle.partitions
- ``ballista.batch.size`` (8192)                    -> columnar batch size is a
  Tungsten/parquet-reader detail in Spark; nothing to set.
- ``ballista.parquet.pruning``                      -> spark.sql.parquet.filterPushdown
- ``hash_join_single_partition_threshold`` (1 MiB)  -> spark.sql.autoBroadcastJoinThreshold
- repartition_joins/aggregations/windows            -> AQE + shuffle partitions

Scale posture (100 TB / 1000 executors): AQE on (runtime coalescing, skew-join
splitting), broadcast threshold left at Spark's default 10 MiB (the reference's
1 MiB is pessimistic for a JVM engine), shuffle partitions sized from the core
budget, session timezone pinned to UTC so timestamp semantics are stable across
clusters and match naive-UTC parquet data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Every table the driver's testdata provides (TESTDATA.md). TPC-H-ish star
#: schema plus an events stream table and LLM-pipeline tables.
TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        return 32


def create_session(
    app_name: str = "datafusion-ballista-dhruvil-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create a SparkSession configured for this engine.

    On a real cluster, pass ``master=None`` and set ``spark.master`` via
    spark-submit; ``shuffle_partitions`` should then be ~2-3x total cores.
    """
    cpus = _cpus()
    # Spark's Python workers re-exec python and resolve pickled-by-reference
    # functions via import; make this package importable for them even when
    # the driver was launched from outside the repo.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # local-mode tasks all live in the driver JVM, whose Spark default
        # is a 1 GiB heap — 32 concurrent tasks' join/agg hash maps OOM'd
        # the salted 10x stress corpus there (PERF.md r4). Size the heap
        # like the executor fleet it stands in for; overridable via env
        # or extra_conf, ignored when a real cluster sets it externally.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        # Runtime re-planning: partition coalescing, skew-join splitting,
        # broadcast-join demotion/promotion. Core of the 100 TB posture.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # Scan-side pushdown (reference: ballista.parquet.pruning, config.rs:38).
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Arrow exchange for pandas UDFs / toPandas (reference is Arrow-native).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp semantics; testdata parquet is naive-UTC.
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as raw int64 nanos and convert at load
        # (load_table) — values are µs-aligned so the conversion is lossless.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Quieter driver logs for bench runs.
        .config("spark.ui.showConsoleProgress", "false")
    )
    # Suite-level conf A/B knob (r11, guide §1.2 "config last"): semicolon-
    # separated k=v pairs, e.g.
    #   SPARK_GRAFT_EXTRA_CONF="spark.io.compression.codec=zstd;..."
    # Defaults above stay untouched so the driver's bench protocol is
    # unchanged; a knob only moves into the defaults after a measured win
    # (PERF.md records the A/Bs). On a real cluster the same env carries
    # site-specific values without code edits.
    for item in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in item:
            k, v = item.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


#: SQL confs the engine's results DEPEND on (not just perf): applied
#: defensively on any session that reaches the query path, because the
#: driver/harness may hand us a SparkSession it built itself.
_REQUIRED_SQL_CONFS = {
    # timestamp values must be interpreted as naive-UTC to match the
    # parquet data and the DuckDB oracle
    "spark.sql.session.timeZone": "UTC",
    # events.parquet is TIMESTAMP(NANOS); without this the scan throws
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Apply correctness-critical runtime SQL confs to an externally-created
    session (idempotent), and ship this package to the Python workers.

    The driver/harness may hand us a session whose Python workers don't
    have this package on their path; closures that reference module-level
    helpers (e.g. the Avro codec inside write_avro_py's partition writer)
    pickle those BY REFERENCE, so the workers must be able to import the
    package. ``addPyFile`` of a zip of the package fixes that at runtime
    for any session — guarded per-SparkContext so it runs once.
    """
    for k, v in _REQUIRED_SQL_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            spark.conf.set(k, v)
    _ensure_package_on_workers(spark)
    return spark


def _ensure_package_on_workers(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, "_dbds_pkg_shipped", False):
        return
    import hashlib
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    # content-address the zip name: "already registered" under the SAME
    # name then genuinely means same contents (Spark rejects re-adding a
    # name with DIFFERENT contents, and a pid-based name could collide
    # across driver restarts and mask exactly that conflict)
    digest = hashlib.md5()
    for dirpath, dirnames, filenames in os.walk(pkg_dir):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                fp = os.path.join(dirpath, fn)
                digest.update(os.path.relpath(fp, root).encode())
                with open(fp, "rb") as fh:
                    digest.update(fh.read())
    base = os.path.join(
        tempfile.gettempdir(), f"dbds_spark_pkg_{digest.hexdigest()[:16]}"
    )
    zip_path = base + ".zip"
    if not os.path.exists(zip_path):
        shutil.make_archive(
            base, "zip", root_dir=root, base_dir=os.path.basename(pkg_dir)
        )
    try:
        sc.addPyFile(zip_path)
    except Exception as e:
        # with the content-addressed name, "already" is benign; anything
        # else (stopped context, unreadable zip) must not set the shipped
        # flag — otherwise the first distributed closure dies later with an
        # opaque ModuleNotFoundError on the executors
        if "already" not in str(e).lower():
            raise
    sc._dbds_pkg_shipped = True


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to TimestampType regardless of how the driver
    wrote it: int64 nanos (older testdata, read via nanosAsLong),
    TIMESTAMP_NTZ (timestamp[us] without the UTC flag), or already
    TimestampType. Session tz is pinned to UTC so the NTZ→LTZ cast is
    value-identical and the DuckDB oracle (naive TIMESTAMP) sees the same
    instants. Works on batch and streaming DataFrames alike.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if not isinstance(ts_type, T.TimestampType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_events_ts(df)
    return df


class Tables:
    """Lazy accessor for the testdata star schema.

    ``Tables(spark, sf_dir).lineitem`` returns the lineitem DataFrame; reads
    are lazy so touching only the tables a query needs keeps scan planning
    minimal (column pruning + filter pushdown happen per-query).
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in TABLE_NAMES:
            raise AttributeError(f"unknown table {name!r}")
        if name not in self._cache:
            self._cache[name] = load_table(self._spark, self._sf_dir, name)
        return self._cache[name]


def register_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (parity with the
    reference's ``register_parquet``; ballista/client/src/context.rs:300-312).
    """
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
