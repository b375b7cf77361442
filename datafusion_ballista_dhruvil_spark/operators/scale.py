"""Scale-engineering utilities: the techniques that keep joins/aggregations
healthy at 100 TB (SURVEY.md §4.2 / build plan step 4).

The reference handles none of these (no AQE, no skew handling, no spill —
tuning-guide.md); Spark gives AQE for free, and these helpers cover the two
cases AQE can't fix alone:

- **Salted joins** for extreme key skew: AQE's skew-join splits oversized
  *partitions*, but a single hot KEY still lands in one task on the build
  side. Salting fans the hot side out N ways and replicates the dim rows.
- **Bucketed tables** for repeated co-located joins: pre-shuffle once at
  write time (bucketBy), then every future equi-join on the bucket key runs
  exchange-free.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for skewed fact keys.

    fact rows get a random-but-deterministic salt in [0, salt); dim rows are
    replicated `salt` times. The join key becomes (key, salt), spreading a
    hot key across `salt` tasks. Deterministic: the salt is derived from a
    hash of the full fact row's key + a monotonic component, not rand(),
    so retried tasks produce identical output (Spark task retry safety).

    Cost model: dim side grows by `salt` x — use only when the dim is small
    or pre-filtered, which is exactly the skew scenario (few hot keys).

    Only fact-preserving join types are allowed: right/full outer joins
    would emit each unmatched (replicated) dim row `salt` times.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving joins only ({sorted(allowed)}); "
            f"got how={how!r} — unmatched dim rows would be duplicated {salt}x"
        )
    fact_salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(fact_key), F.monotonically_increasing_id()), F.lit(salt)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    dim_replicated = dim.select("*", salts)
    joined = fact_salted.join(
        dim_replicated,
        (fact_salted[fact_key] == dim_replicated[dim_key])
        & (fact_salted["__salt"] == dim_replicated["__salt"]),
        how,
    )
    return joined.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+sorted) managed table: the reference's
    `file_sort_order` / hash-partitioned listing table analogue
    (datafusion.proto:99-115). Joins/aggregations on the bucket columns
    then require no exchange (see tests/test_scale.py plan assertion)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def cohort_join_bucketed(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the same key: Catalyst sees the matching
    hash distribution and plans SortMergeJoin WITHOUT exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


# --------------------------------------------------------------------------
# Z-order data layout: multi-dimensional clustering for scan pruning.

from datafusion_ballista_dhruvil_spark.operators.registry import query
from datafusion_ballista_dhruvil_spark.session import Tables

#: Each dimension is quantized to a 6-bit rank against the column's actual
#: max (computed in-query, as OPTIMIZE ZORDER's range-bound pass does), so
#: the interleaved 12-bit key is dense regardless of scale factor; the top
#: 6 bits (3 per dimension) define 64 coarse "files".
_Z_BITS = 6
_Z_EPOCH = "1995-01-01"  # testdata orders date range starts here


def _zkey_sql(x: str, y: str, duck: bool) -> str:
    """Bit-interleave two 16-bit ints into one 32-bit Morton (z-order) key.

    Generated as one flat integer expression so BOTH engines evaluate the
    identical op tree: DuckDB gets `>>`/`<<` operators, Spark SQL gets
    shiftright()/shiftleft() (all exact int64 ops in both)."""
    terms = []
    for i in range(_Z_BITS):
        if duck:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
        else:
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


_PRUNE_SQL = """
SELECT layout, predicate, COUNT(*) AS n_buckets,
       COUNT(CASE WHEN prunable THEN 1 END) AS n_pruned,
       CAST(SUM(n_rows) AS BIGINT) AS rows_total,
       CAST(SUM(CASE WHEN prunable THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_skipped,
       CAST(SUM(CASE WHEN prunable THEN n_rows ELSE 0 END) AS DOUBLE)
         / CAST(SUM(n_rows) AS DOUBLE) AS frac_skipped
FROM preds GROUP BY layout, predicate ORDER BY layout, predicate
"""

#: the two probe predicates; min/max file-skipping uses ONLY these stats
_CK_LO, _CK_HI = 100, 300
_DY_LO, _DY_HI = 600, 900


@query(
    "ops_zorder_pruning",
    oracle=f"""
WITH base AS (
  SELECT o_custkey AS ck,
         CAST(o_orderdate AS DATE) - DATE '{_Z_EPOCH}' AS dy
  FROM orders
),
dom AS (SELECT MAX(ck) + 1 AS mck, MAX(dy) + 1 AS mdy FROM base),
q AS (
  SELECT ck, dy, (ck * 64) // mck AS xq, (dy * 64) // mdy AS yq
  FROM base, dom
),
keyed AS (
  SELECT ck, dy,
         {_zkey_sql("xq", "yq", duck=True)} >> 6 AS zbucket,
         yq AS tbucket
  FROM q
),
stats AS (
  SELECT 'zorder' AS layout, zbucket AS bucket, COUNT(*) AS n_rows,
         MIN(ck) AS min_ck, MAX(ck) AS max_ck,
         MIN(dy) AS min_dy, MAX(dy) AS max_dy
  FROM keyed GROUP BY zbucket
  UNION ALL
  SELECT 'time_linear', tbucket, COUNT(*), MIN(ck), MAX(ck), MIN(dy), MAX(dy)
  FROM keyed GROUP BY tbucket
),
preds AS (
  SELECT layout, 'custkey_range' AS predicate, n_rows,
         (max_ck < {_CK_LO} OR min_ck > {_CK_HI}) AS prunable
  FROM stats
  UNION ALL
  SELECT layout, 'date_range', n_rows,
         (max_dy < {_DY_LO} OR min_dy > {_DY_HI})
  FROM stats
)
{_PRUNE_SQL}
""",
)
def ops_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) data layout vs time-linear layout, scored by
    min/max file-skipping — the Delta/Iceberg `OPTIMIZE ZORDER BY` story.

    At 100 TB the scan is won or lost at WRITE time: parquet footers carry
    per-file min/max, and a predicate prunes a file iff its range misses.
    This operator simulates 64 "files" under two layouts — time-linear
    (the natural ingest order) and z-order on (custkey, orderdate) — then
    evaluates two single-dimension predicates against ONLY the per-file
    min/max stats. Expected shape, verified by the oracle: time-linear
    prunes the date predicate perfectly but the custkey predicate not at
    all; z-order prunes BOTH dimensions substantially — the reason
    multi-dim clustering exists.

    Scale: the z-key is 32 integer bit-ops per row, map-only, codegen'd;
    stats are one partial-agg shuffle on the 64-value bucket key. The
    production write is `df.repartitionByRange(n, zkey).sortWithinPartitions
    (zkey).write.parquet(...)` — same key, real footers.
    """
    t = Tables(spark, sf_dir)
    base = t.orders.select(
        F.col("o_custkey").alias("ck"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit(_Z_EPOCH).cast("date")
        ).alias("dy"),
    )
    dom = base.agg(
        (F.max("ck") + 1).alias("mck"), (F.max("dy") + 1).alias("mdy")
    )
    q = base.crossJoin(F.broadcast(dom)).select(
        "ck",
        "dy",
        F.expr("(ck * 64) div mck").alias("xq"),
        F.expr("(dy * 64) div mdy").alias("yq"),
    )
    keyed = q.select(
        "ck",
        "dy",
        F.expr(f"({_zkey_sql('xq', 'yq', duck=False)}) >> 6").alias("zbucket"),
        F.col("yq").alias("tbucket"),
    )

    def _stats(df: DataFrame, layout: str, bucket: str) -> DataFrame:
        return df.groupBy(F.col(bucket).alias("bucket")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ck").alias("min_ck"),
            F.max("ck").alias("max_ck"),
            F.min("dy").alias("min_dy"),
            F.max("dy").alias("max_dy"),
        ).select(F.lit(layout).alias("layout"), "*")

    stats = _stats(keyed, "zorder", "zbucket").unionAll(
        _stats(keyed, "time_linear", "tbucket")
    )
    preds = stats.select(
        "layout",
        F.lit("custkey_range").alias("predicate"),
        "n_rows",
        ((F.col("max_ck") < _CK_LO) | (F.col("min_ck") > _CK_HI)).alias(
            "prunable"
        ),
    ).unionAll(
        stats.select(
            "layout",
            F.lit("date_range").alias("predicate"),
            "n_rows",
            ((F.col("max_dy") < _DY_LO) | (F.col("min_dy") > _DY_HI)).alias(
                "prunable"
            ),
        )
    )
    skipped = F.sum(F.when(F.col("prunable"), F.col("n_rows")).otherwise(0))
    return (
        preds.groupBy("layout", "predicate")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.count(F.when(F.col("prunable"), 1)).alias("n_pruned"),
            F.sum("n_rows").cast("bigint").alias("rows_total"),
            skipped.cast("bigint").alias("rows_skipped"),
            (
                skipped.cast("double") / F.sum("n_rows").cast("double")
            ).alias("frac_skipped"),
        )
        .orderBy("layout", "predicate")
    )


def owned_result(
    df: DataFrame,
    *caches: DataFrame,
    prepare: Callable[[], object] | None = None,
) -> DataFrame:
    """Attach cache-lifecycle ownership to a query result (VERDICT r6 #3).

    Query builders persist corpus-sized intermediates that the returned
    plan consumes several times (shingle arrays, minhash signatures,
    candidate sets). Before r7 those caches were never unpersisted, so
    the long-lived bench JVM accumulated dozens of cached tables whose
    stochastic eviction made suite timing order-DEPENDENT (PERF.md r6
    A/B: three no-clear suites read 284/316/347s with a different 5-10x
    slow cluster each run), compensated at the protocol level by
    clearCache+gc at family boundaries. Owning the lifecycle in the
    query function makes timing order-independent by construction: the
    returned DataFrame unpersists its upstream caches as soon as its own
    terminal action (collect / toPandas / count) completes.

    persist/unpersist cannot change results — this is timing-only.

    Implementation: instance-level method shadowing instead of a
    DataFrame subclass, so every other behavior (plan inspection,
    further transformation, driver-side schema access) is untouched.
    Release is idempotent; a second action on the same instance simply
    recomputes uncached (driver, bench, and pytest all build a fresh
    DataFrame per run, so in practice each cache lives for exactly one
    materialization).

    Contract for plan-only consumers (ADVICE r8 #3): the .persist()
    calls happen at plan-BUILD time, so a caller that never runs a
    wrapped action (plan-fingerprint tooling, formatted_plan tests)
    leaves the CacheManager registration in the long-lived session.
    That is harmless — an unmaterialized persist holds zero executor
    memory and zero storage blocks; it is a driver-side catalog entry
    only — but callers that want the registration gone can call the
    returned DataFrame's ``release_owned()`` explicitly.

    ``prepare`` (r11, ADVICE r10 #2): optional callable invoked once,
    immediately before the FIRST wrapped action runs. Queries that want a
    shared cache eager-materialized (so concurrent consumer subtrees don't
    race a cold cache) put the materializing ``count()`` here instead of at
    plan-BUILD time — plan-only consumers (explain/fingerprint tooling)
    then construct the query without executing a corpus-sized job or
    pinning a materialized cache in the long-lived session.
    """
    released = False
    prepared = prepare is None

    def _prepare_once() -> None:
        nonlocal prepared
        if prepared:
            return
        prepared = True
        prepare()

    def _release() -> None:
        nonlocal released
        if released:
            return
        released = True
        for c in caches:
            try:
                c.unpersist()
            except Exception:  # noqa: BLE001 — release must never mask the action's result
                pass

    def _wrap(name: str):
        orig = getattr(df, name)

        def wrapped(*a, **k):
            _prepare_once()
            try:
                return orig(*a, **k)
            finally:
                _release()

        wrapped.__name__ = name
        return wrapped

    # toLocalIterator is deliberately NOT wrapped: it returns a lazy
    # iterator, so a finally-release would fire before consumption.
    for name in ("collect", "toPandas", "count"):
        setattr(df, name, _wrap(name))
    # explicit path for plan-only consumers (see docstring contract)
    df.release_owned = _release
    return df
