"""Data-profiling / statistics operators.

Parity target: the reference collects table statistics for planning
(``ballista.collect_statistics``, ballista/core/src/config.rs:39,206-208;
per-file stats in ``FileScanExecConf``, datafusion.proto:1144-1171) and
exposes plan/runtime metrics. Here the same capability is surfaced as
queries a pipeline can run: per-column statistics (the ANALYZE TABLE
shape) and a whole-table content fingerprint (the data-validation step a
100 TB ingest runs before/after a migration or rewrite).

Scale posture:
- ops_profile_stats is ONE aggregation pass over the fact table; the
  per-column rows are unpivoted from a single 1-row aggregate, so the
  scan count does not grow with the number of profiled columns. The
  exact distinct counts use Spark's expand-based multi-distinct (one
  shuffle); at 100 TB swap `countDistinct` -> `approx_count_distinct`
  (same plan shape, sketch merge instead of expand) — the query keeps
  exact counts because the oracle must hash-match.
- ops_table_checksum is map-side md5 + a single commutative aggregate:
  order-independent by construction, so it parallelizes to any executor
  count and never sorts. Doubles are fingerprinted as exact integer
  cents (CAST(round(x*100) AS BIGINT)) — double->string rendering is NOT
  portable across engines, integer cents are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_ballista_dhruvil_spark.operators.registry import query
from datafusion_ballista_dhruvil_spark.session import Tables

#: numeric lineitem columns profiled (ANALYZE TABLE ... COMPUTE STATISTICS
#: FOR COLUMNS shape)
_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "ops_profile_stats",
    oracle="""
SELECT 'l_quantity' AS col_name, count(*) AS n_rows,
       count(*) - count(l_quantity) AS n_null,
       count(DISTINCT l_quantity) AS n_distinct,
       min(l_quantity) AS min_val, max(l_quantity) AS max_val,
       sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_val
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
       count(DISTINCT l_extendedprice), min(l_extendedprice),
       max(l_extendedprice),
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0
FROM lineitem
UNION ALL
SELECT 'l_discount', count(*), count(*) - count(l_discount),
       count(DISTINCT l_discount), min(l_discount), max(l_discount),
       sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0
FROM lineitem
UNION ALL
SELECT 'l_tax', count(*), count(*) - count(l_tax),
       count(DISTINCT l_tax), min(l_tax), max(l_tax),
       sum(CAST(round(l_tax * 100) AS BIGINT)) / 100.0
FROM lineitem
ORDER BY col_name
""",
)
def ops_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column statistics (count / nulls / exact distinct / min / max /
    sum) for the fact table's numeric columns, one row per column.

    Single scan: all aggregates compute in one groupBy-less agg (Spark
    plans multi-distinct via one expand), then the 1-row result unpivots
    to per-column rows with ``stack`` — a zero-shuffle projection, so
    profiling N columns costs the same scan as profiling one.

    Sums here are exact: l_* values are 2-decimal currency, so sum of
    integer-cents/100 doubles stays exact far beyond this scale
    (<= 2^53 cents). DuckDB's sum(DOUBLE) compensates; identical values.
    """
    t = Tables(spark, sf_dir)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            # 2-decimal currency: sum exact integer cents, surface as double
            (F.sum(F.round(F.col(c) * 100).cast("long")) / F.lit(100.0)).alias(
                f"{c}__sum"
            ),
        ]
    one = t.lineitem.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__null, {c}__distinct, CAST({c}__min AS DOUBLE), "
        f"CAST({c}__max AS DOUBLE), {c}__sum"
        for c in _PROFILE_COLS
    )
    return one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_null, n_distinct, min_val, max_val, sum_val)",
        "n_rows",
    ).select(
        "col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val", "sum_val"
    ).orderBy("col_name")


@query(
    "ops_table_checksum",
    oracle="""
WITH f AS (
  SELECT md5(concat_ws('|',
           COALESCE(CAST(o_orderkey AS VARCHAR), '<NULL>'),
           COALESCE(CAST(o_custkey AS VARCHAR), '<NULL>'),
           COALESCE(o_orderstatus, '<NULL>'),
           COALESCE(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
                    '<NULL>'),
           COALESCE(strftime(o_orderdate, '%Y-%m-%d'), '<NULL>'),
           COALESCE(o_orderpriority, '<NULL>'))) AS h
  FROM orders
)
SELECT count(*) AS n_rows,
       count(DISTINCT h) AS n_distinct_rows,
       min(h) AS min_h, max(h) AS max_h
FROM f
""",
)
def ops_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table content fingerprint of ``orders``: row-level md5 over a
    canonical rendering, reduced to order-independent aggregates (count,
    exact distinct, lexicographic min/max digest).

    The canonical rendering avoids every cross-engine formatting trap:
    doubles as exact integer cents, timestamps as their date rendering,
    '|' separator (absent from the data), and every field coalesced to an
    explicit '<NULL>' sentinel — concat_ws silently SKIPS null fields in
    both engines, which would make NULL indistinguishable from an absent
    field and let different contents share a fingerprint. Equal
    fingerprints across two engines/two copies => equal content with
    md5-collision probability.
    """
    t = Tables(spark, sf_dir)
    sentinel = F.lit("<NULL>")
    h = F.md5(
        F.concat_ws(
            "|",
            F.coalesce(F.col("o_orderkey").cast("string"), sentinel),
            F.coalesce(F.col("o_custkey").cast("string"), sentinel),
            F.coalesce(F.col("o_orderstatus"), sentinel),
            F.coalesce(
                F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
                sentinel,
            ),
            F.coalesce(F.date_format("o_orderdate", "yyyy-MM-dd"), sentinel),
            F.coalesce(F.col("o_orderpriority"), sentinel),
        )
    ).alias("h")
    return (
        t.orders.select(h)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("h").alias("n_distinct_rows"),
            F.min("h").alias("min_h"),
            F.max("h").alias("max_h"),
        )
    )


@query(
    "ops_histogram",
    oracle="""
WITH b AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi,
         CASE WHEN max(o_totalprice) > min(o_totalprice)
              THEN (max(o_totalprice) - min(o_totalprice)) / 20
              ELSE 1.0 END AS w
  FROM orders
),
binned AS (
  SELECT LEAST(CAST(FLOOR((o_totalprice - lo) / w) AS BIGINT), 19) AS bin,
         lo, w
  FROM orders, b
)
SELECT bin,
       min(lo + bin * w) AS bin_lo,
       min(lo + (bin + 1) * w) AS bin_hi,
       count(*) AS n
FROM binned
GROUP BY bin
ORDER BY bin
""",
)
def ops_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram of o_totalprice — the distribution half
    of data profiling (the reference's statistics surface carries min/max
    per column; a histogram is the same two-pass shape taken one step
    further).

    Two passes, both cheap: a 1-row min/max aggregate is broadcast back
    (crossJoin of one row), then binning is a map-side floor() and the
    final aggregate groups 20 keys — no skew, no wide shuffle. The bin
    edges derive from (lo, hi, bin) inside the aggregation, so the result
    is self-describing. IEEE determinism: lo/hi are exact column values,
    the width and edges are single-rounded double ops, identical in both
    engines; LEAST(..., 19) pins x = max into the last bin. A degenerate
    column (min == max) falls back to width 1.0 so everything lands in one
    well-defined bin instead of 0/0 = NaN bins.
    """
    t = Tables(spark, sf_dir)
    b = t.orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    ).select(
        "lo",
        F.when(
            F.col("hi") > F.col("lo"), (F.col("hi") - F.col("lo")) / F.lit(20)
        )
        .otherwise(F.lit(1.0))
        .alias("w"),
    )
    binned = t.orders.crossJoin(F.broadcast(b)).select(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("lo")) / F.col("w")).cast("long"),
            F.lit(19),
        ).alias("bin"),
        "lo",
        "w",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.min(F.col("lo") + F.col("bin") * F.col("w")).alias("bin_lo"),
            F.min(F.col("lo") + (F.col("bin") + 1) * F.col("w")).alias("bin_hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("bin")
    )
