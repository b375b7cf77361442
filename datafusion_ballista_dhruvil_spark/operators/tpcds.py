"""TPC-DS-shaped decision-support queries — the last open SURVEY.md §5
"optional stretch" item (the reference ships TPC-H + db-benchmark; SSB
landed in r4; this module adds the TPC-DS plan shapes those two suites do
NOT exercise, adapted onto the driver's TPC-H-ish testdata the same way
operators/ssb.py adapts SSB).

Mapping (documented once, used by every query):
  item            -> part       (category = p_type, brand = p_brand)
  store_sales     -> lineitem joined to orders (sale date = o_orderdate)
  returns         -> lineitem rows with l_returnflag = 'R'
  two channels    -> l_linestatus 'O' vs 'F' (the online/offline analog)
  household/cust  -> customer

Each query keeps the canonical TPC-DS query's SIGNATURE SHAPE — that is
what earns it a slot next to TPC-H/SSB in the regression net:
  q3   dim-filtered fact agg by (year, brand)
  q4   year-over-year customer spend ratio vs the global ratio
  q34  group-count HAVING band, joined back to the dimension
  q36  ROLLUP + GROUPING() lochierarchy + rank within parent
  q51  two-channel cumulative series compared after a full outer align
  q59  week-over-week self-join of weekly aggregates across years
  q65  per-brand revenue against the per-category maximum
  q88  multi-band single-scan count pivot (TPC-DS spells this as 8
       scalar subqueries = 8 scans; the Spark-first design collapses it
       to ONE conditional-aggregation pass — same result, 1/8 the I/O)
  q89  monthly deviation from the yearly mean, ranked
  q93  net revenue after subtracting returned lines

Exactness contract: every revenue is the scaled-integer
``rev6 = round(l_extendedprice*100) * (10000 - round(l_discount*10000))``
(dollars x 1e6 as BIGINT — both engines round the 2-dp/4-dp doubles to
the same integers), so sums, ratios (x1e6 integer div) and ranks are
bit-identical with no float anywhere. At true 100 TB row counts a
BIGINT x1e6 revenue sum approaches int64 range — production would keep
the same dataflow on DECIMAL(38,6); the testdata stays ~1e15.

Scale posture: part/date dims broadcast; every fact aggregation is a
partial-agg shuffle on its group keys; window partitions are bounded
(years, weeks, categories); no query materializes more than (groups)
rows after its first aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_ballista_dhruvil_spark.operators.registry import query
from datafusion_ballista_dhruvil_spark.session import Tables

#: scaled-integer revenue: dollars x 1e6 as BIGINT (see module docstring)
_REV6 = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (10000 - CAST(round(l_discount * 10000) AS BIGINT))"
)
#: undiscounted value on the same 1e6 scale (for margins)
_FULL6 = "CAST(round(l_extendedprice * 100) AS BIGINT) * 10000"
_SQL_REV6 = _REV6
_SQL_FULL6 = _FULL6


def _fact(t: Tables) -> DataFrame:
    """lineitem x orders — the store_sales analog (sale date, customer)."""
    return t.lineitem.join(
        t.orders, F.col("l_orderkey") == F.col("o_orderkey")
    )


# --------------------------------------------------------------------------
@query(
    "tpcds_q3",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS INT) AS d_year, p_brand,
       CAST(SUM({_SQL_REV6}) AS BIGINT) AS revenue6
FROM lineitem, orders, part
WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
  AND p_type = 'PROMO'
GROUP BY d_year, p_brand
ORDER BY d_year, revenue6 DESC, p_brand
""",
)
def tpcds_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q3 shape: date x fact x item with a category filter,
    aggregated by (year, brand), ordered by revenue within year. The
    item filter broadcasts and prunes the fact scan via the join."""
    t = Tables(spark, sf_dir)
    part = F.broadcast(
        t.part.where(F.col("p_type") == "PROMO").select(
            "p_partkey", "p_brand"
        )
    )
    return (
        _fact(t)
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.year("o_orderdate").cast("int").alias("d_year"), "p_brand"
        )
        .agg(F.sum(F.expr(_REV6)).cast("bigint").alias("revenue6"))
        .orderBy("d_year", F.desc("revenue6"), "p_brand")
    )


# --------------------------------------------------------------------------
@query(
    "tpcds_q4",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CASE WHEN year(o_orderdate) = 1995
              THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT)
           AS s95,
         CAST(SUM(CASE WHEN year(o_orderdate) = 1996
              THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT)
           AS s96
  FROM orders GROUP BY o_custkey
),
g AS (
  SELECT CAST(SUM(s96) AS BIGINT)
           // nullif(CAST(SUM(s95) AS BIGINT) // 1000000, 0) AS gr
  FROM spend WHERE s95 IS NOT NULL AND s96 IS NOT NULL
)
SELECT o_custkey AS custkey, s95 AS spend95_cents, s96 AS spend96_cents,
       s96 * 1000000 // s95 AS ratio_ppm
FROM spend, g
WHERE s95 IS NOT NULL AND s96 IS NOT NULL AND s96 * 1000000 // s95 > gr
ORDER BY ratio_ppm DESC, custkey
LIMIT 20
""",
)
def tpcds_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q4/q11 shape: per-customer year-over-year spend ratio
    compared against the cohort-wide ratio — two-level aggregation with
    a 1-row scalar merge (the house broadcast pattern), then a top-k.
    Conditional aggregation replaces TPC-DS's per-year CTE self-join:
    one fact pass instead of two."""
    t = Tables(spark, sf_dir)
    cents = "CAST(round(o_totalprice * 100) AS BIGINT)"
    spend = (
        t.orders.groupBy("o_custkey")
        .agg(
            F.sum(
                F.expr(
                    f"CASE WHEN year(o_orderdate) = 1995 THEN {cents} END"
                )
            )
            .cast("bigint")
            .alias("s95"),
            F.sum(
                F.expr(
                    f"CASE WHEN year(o_orderdate) = 1996 THEN {cents} END"
                )
            )
            .cast("bigint")
            .alias("s96"),
        )
        .where(F.col("s95").isNotNull() & F.col("s96").isNotNull())
    )
    # divide-first: the cohort-wide cents sum * 1e6 would overflow
    # int64 past ~sf1; per-customer ratios stay in the small range
    # nullif guards the degenerate-corpus zero divisor: ANSI Spark
    # ERRORS on div-by-zero where DuckDB yields NULL — nullif makes both
    # engines yield NULL (values identical at every real scale)
    g = spend.agg(
        F.expr("SUM(s96) div nullif(SUM(s95) div 1000000, 0)").alias("gr")
    )
    return (
        spend.crossJoin(F.broadcast(g))  # 1-row scalar merge
        .withColumn("ratio_ppm", F.expr("s96 * 1000000 div s95"))
        .where(F.col("ratio_ppm") > F.col("gr"))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("s95").alias("spend95_cents"),
            F.col("s96").alias("spend96_cents"),
            "ratio_ppm",
        )
        .orderBy(F.desc("ratio_ppm"), "custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
@query(
    "tpcds_q34",
    oracle="""
WITH cnt AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
  GROUP BY o_custkey
  HAVING COUNT(*) BETWEEN 8 AND 12
)
SELECT c_custkey, c_name, n_orders
FROM cnt JOIN customer ON o_custkey = c_custkey
ORDER BY n_orders DESC, c_custkey
""",
)
def tpcds_q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q34/q73 shape: a group-count HAVING band over the fact
    (households buying 15-20 tickets), joined BACK to the dimension for
    display columns. The band aggregate shrinks the fact to bounded
    customer rows before the dimension join, so the join side that
    broadcasts is the filtered aggregate, not the dimension."""
    t = Tables(spark, sf_dir)
    cnt = (
        t.orders.where(
            F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM"
            )
            & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .where(F.col("n_orders").between(8, 12))
    )
    return (
        t.customer.join(cnt, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "n_orders")
        .orderBy(F.desc("n_orders"), "c_custkey")
    )


# --------------------------------------------------------------------------
@query(
    "tpcds_q36",
    oracle=f"""
WITH agg AS (
  SELECT p_type, p_brand,
         CAST(SUM({_SQL_REV6}) AS BIGINT) AS r6,
         CAST(SUM({_SQL_FULL6}) AS BIGINT) AS f6,
         CAST(grouping(p_type) + grouping(p_brand) AS INT) AS lochierarchy,
         grouping(p_brand) AS gb
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY ROLLUP(p_type, p_brand)
)
SELECT p_type, p_brand,
       r6 // nullif(f6 // 1000000, 0) AS margin_ppm,
       lochierarchy,
       CAST(rank() OVER (
         PARTITION BY lochierarchy, CASE WHEN gb = 0 THEN p_type END
         ORDER BY r6 // nullif(f6 // 1000000, 0) NULLS LAST,
                  COALESCE(p_type, ''), COALESCE(p_brand, '')
       ) AS INT) AS rank_within_parent
FROM agg
ORDER BY lochierarchy DESC, p_type NULLS FIRST, rank_within_parent
""",
)
def tpcds_q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q36 shape — the one no TPC-H/SSB query has: gross margin
    over ROLLUP(category, brand) with the GROUPING()-derived
    ``lochierarchy`` level indicator and rank() WITHIN PARENT (partition
    by level + parent category). Margin is the exact integer ppm of
    discounted over undiscounted revenue; the rank's ORDER BY carries
    full tiebreaks so both engines assign identical ranks."""
    t = Tables(spark, sf_dir)
    part = F.broadcast(t.part.select("p_partkey", "p_type", "p_brand"))
    agg = (
        t.lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .rollup("p_type", "p_brand")
        .agg(
            F.sum(F.expr(_REV6)).alias("r6"),
            F.sum(F.expr(_FULL6)).alias("f6"),
            (F.grouping("p_type") + F.grouping("p_brand"))
            .cast("int")
            .alias("lochierarchy"),
            F.grouping("p_brand").alias("_gb"),
        )
        .select(
            "p_type",
            "p_brand",
            # divide-first ppm: r6 * 1e6 overflows int64 once the fact
            # sum passes ~9e12 micro-dollars; f6 div 1e6 keeps every
            # intermediate in range at any corpus scale (mirrored oracle)
            F.expr("r6 div nullif(f6 div 1000000, 0)").alias(
                "margin_ppm"
            ),
            "lochierarchy",
            F.when(F.col("_gb") == 0, F.col("p_type")).alias("_parent"),
        )
    )
    # NULLS LAST explicitly on BOTH sides: Spark's ASC default ranks NULL
    # margins first while DuckDB's ranks them last, so a partition mixing
    # NULL and non-NULL margins (the degenerate sub-$1-revenue case the
    # nullif guard admits) would otherwise diverge silently.
    w = Window.partitionBy("lochierarchy", "_parent").orderBy(
        F.asc_nulls_last("margin_ppm"),
        F.coalesce(F.col("p_type"), F.lit("")),
        F.coalesce(F.col("p_brand"), F.lit("")),
    )
    return (
        agg.withColumn("rank_within_parent", F.rank().over(w).cast("int"))
        .select(
            "p_type", "p_brand", "margin_ppm", "lochierarchy",
            "rank_within_parent",
        )
        .orderBy(
            F.desc("lochierarchy"),
            F.asc_nulls_first("p_type"),
            "rank_within_parent",
        )
    )


# --------------------------------------------------------------------------
@query(
    "tpcds_q51",
    oracle=f"""
WITH monthly AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS ym,
         CAST(SUM(CASE WHEN l_linestatus = 'O' THEN {_SQL_REV6} ELSE 0 END)
           AS BIGINT) AS rev_o,
         CAST(SUM(CASE WHEN l_linestatus = 'F' THEN {_SQL_REV6} ELSE 0 END)
           AS BIGINT) AS rev_f
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY ym
),
cum AS (
  SELECT ym,
         CAST(SUM(rev_o) OVER (ORDER BY ym
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_o,
         CAST(SUM(rev_f) OVER (ORDER BY ym
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_f
  FROM monthly
)
SELECT ym, cum_o, cum_f FROM cum WHERE cum_o > cum_f ORDER BY ym
""",
)
def tpcds_q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51 shape: two channels' cumulative revenue series aligned
    on the time axis, emitting the periods where one channel's running
    total leads the other. TPC-DS full-outer-joins two windowed CTEs;
    with both channels in one fact a single conditional aggregate feeds
    both windows — one shuffle to month grain (bounded: ~82 months),
    then a single-partition window over months only."""
    t = Tables(spark, sf_dir)
    monthly = (
        _fact(t)
        .groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("int")
            .alias("ym")
        )
        .agg(
            F.sum(
                F.expr(f"CASE WHEN l_linestatus = 'O' THEN {_REV6} ELSE 0 END")
            )
            .cast("bigint")
            .alias("rev_o"),
            F.sum(
                F.expr(f"CASE WHEN l_linestatus = 'F' THEN {_REV6} ELSE 0 END")
            )
            .cast("bigint")
            .alias("rev_f"),
        )
    )
    w = Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, 0)
    return (
        monthly.select(
            "ym",
            F.sum("rev_o").over(w).cast("bigint").alias("cum_o"),
            F.sum("rev_f").over(w).cast("bigint").alias("cum_f"),
        )
        .where(F.col("cum_o") > F.col("cum_f"))
        .orderBy("ym")
    )


# --------------------------------------------------------------------------
@query(
    "tpcds_q59",
    oracle=f"""
WITH weekly AS (
  SELECT CAST(year(o_orderdate) AS INT) AS y,
         CAST(week(o_orderdate) AS INT) AS w,
         CAST(SUM({_SQL_REV6}) AS BIGINT) AS rev6
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY y, w
)
SELECT a.w AS wk, a.rev6 AS rev95_6, b.rev6 AS rev96_6,
       b.rev6 // nullif(a.rev6 // 1000000, 0) AS wow_ratio_ppm
FROM weekly a JOIN weekly b ON a.w = b.w AND a.y = 1995 AND b.y = 1996
ORDER BY wk
""",
)
def tpcds_q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q59 shape: weekly revenue aggregated once, then
    self-joined across two years on week number for the week-over-week
    ratio. The self-join input is the bounded weekly aggregate (<= 53
    rows per year), so it broadcasts; week numbers use the ISO week
    both engines share (parity proven in ops_calendar_intervals)."""
    t = Tables(spark, sf_dir)
    weekly = (
        _fact(t)
        .where(F.year("o_orderdate").isin(1995, 1996))
        .groupBy(
            F.year("o_orderdate").cast("int").alias("y"),
            F.weekofyear("o_orderdate").cast("int").alias("w"),
        )
        .agg(F.sum(F.expr(_REV6)).cast("bigint").alias("rev6"))
    )
    a = weekly.where(F.col("y") == 1995).select(
        F.col("w").alias("wk"), F.col("rev6").alias("rev95_6")
    )
    b = weekly.where(F.col("y") == 1996).select(
        F.col("w").alias("wk"), F.col("rev6").alias("rev96_6")
    )
    return (
        a.join(F.broadcast(b), "wk")
        .select(
            "wk",
            "rev95_6",
            "rev96_6",
            # divide-first (overflow-safe at any scale; oracle mirrors)
            F.expr("rev96_6 div nullif(rev95_6 div 1000000, 0)").alias(
                "wow_ratio_ppm"
            ),
        )
        .orderBy("wk")
    )


# --------------------------------------------------------------------------
@query(
    "tpcds_q65",
    oracle=f"""
WITH brand_rev AS (
  SELECT p_type, p_brand, CAST(SUM({_SQL_REV6}) AS BIGINT) AS rev6
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_type, p_brand
),
cat_max AS (
  SELECT p_type, CAST(MAX(rev6) AS BIGINT) AS max6
  FROM brand_rev GROUP BY p_type
)
SELECT b.p_type, b.p_brand, b.rev6,
       b.rev6 // nullif(m.max6 // 1000000, 0) AS share_of_max_ppm
FROM brand_rev b JOIN cat_max m ON b.p_type = m.p_type
WHERE b.rev6 * 10 <= m.max6 * 9
ORDER BY b.p_type, b.p_brand
""",
)
def tpcds_q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q65 shape: per-brand revenue compared against the maximum
    brand revenue within its category (q65 uses 10% of average; here
    <= 90% of the max keeps the testdata's near-uniform brands
    non-vacuous). Aggregate-of-aggregate join: the category max is
    computed from the already-bounded brand aggregate, never from the
    fact — integer cross-multiplication avoids division entirely in
    the filter."""
    t = Tables(spark, sf_dir)
    part = F.broadcast(t.part.select("p_partkey", "p_type", "p_brand"))
    brand_rev = (
        t.lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_brand")
        .agg(F.sum(F.expr(_REV6)).cast("bigint").alias("rev6"))
    )
    cat_max = brand_rev.groupBy("p_type").agg(
        F.max("rev6").cast("bigint").alias("max6")
    )
    return (
        brand_rev.join(F.broadcast(cat_max), "p_type")
        .where(F.col("rev6") * 10 <= F.col("max6") * 9)
        .select(
            "p_type",
            "p_brand",
            "rev6",
            # divide-first (overflow-safe at any scale; oracle mirrors)
            F.expr("rev6 div nullif(max6 div 1000000, 0)").alias(
                "share_of_max_ppm"
            ),
        )
        .orderBy("p_type", "p_brand")
    )


# --------------------------------------------------------------------------
@query(
    "tpcds_q88",
    oracle="""
SELECT
  CAST(COUNT(*) FILTER (l_quantity < 10 AND l_discount <= 0.05)
    AS BIGINT) AS b1,
  CAST(COUNT(*) FILTER (l_quantity < 10 AND l_discount > 0.05)
    AS BIGINT) AS b2,
  CAST(COUNT(*) FILTER (l_quantity >= 10 AND l_quantity < 20
    AND l_discount <= 0.05) AS BIGINT) AS b3,
  CAST(COUNT(*) FILTER (l_quantity >= 10 AND l_quantity < 20
    AND l_discount > 0.05) AS BIGINT) AS b4,
  CAST(COUNT(*) FILTER (l_quantity >= 20 AND l_quantity < 35
    AND l_discount <= 0.05) AS BIGINT) AS b5,
  CAST(COUNT(*) FILTER (l_quantity >= 20 AND l_quantity < 35
    AND l_discount > 0.05) AS BIGINT) AS b6,
  CAST(COUNT(*) FILTER (l_quantity >= 35 AND l_discount <= 0.05)
    AS BIGINT) AS b7,
  CAST(COUNT(*) FILTER (l_quantity >= 35 AND l_discount > 0.05)
    AS BIGINT) AS b8
FROM lineitem
""",
)
def tpcds_q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q88 shape: eight disjoint-band counts of the fact in one
    result row. The spec spells this as eight scalar subqueries — eight
    full scans; the Spark-first design is ONE conditional-aggregation
    pass (map-side partials, a single 8-counter reduce), the canonical
    scan-collapse rewrite and an 8x I/O saving at 100 TB."""
    t = Tables(spark, sf_dir)
    bands = [
        ("b1", "l_quantity < 10 AND l_discount <= 0.05"),
        ("b2", "l_quantity < 10 AND l_discount > 0.05"),
        ("b3", "l_quantity >= 10 AND l_quantity < 20 AND l_discount <= 0.05"),
        ("b4", "l_quantity >= 10 AND l_quantity < 20 AND l_discount > 0.05"),
        ("b5", "l_quantity >= 20 AND l_quantity < 35 AND l_discount <= 0.05"),
        ("b6", "l_quantity >= 20 AND l_quantity < 35 AND l_discount > 0.05"),
        ("b7", "l_quantity >= 35 AND l_discount <= 0.05"),
        ("b8", "l_quantity >= 35 AND l_discount > 0.05"),
    ]
    return t.lineitem.agg(
        *[
            F.count(F.when(F.expr(cond), 1)).cast("bigint").alias(name)
            for name, cond in bands
        ]
    )


# --------------------------------------------------------------------------
@query(
    "tpcds_q89",
    oracle=f"""
WITH monthly AS (
  SELECT p_brand, CAST(year(o_orderdate) AS INT) AS y,
         CAST(month(o_orderdate) AS INT) AS m,
         CAST(SUM({_SQL_REV6}) AS BIGINT) AS rev6
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE year(o_orderdate) = 1996
  GROUP BY p_brand, y, m
),
win AS (
  SELECT p_brand, y, m, rev6,
         CAST(SUM(rev6) OVER (PARTITION BY p_brand, y) AS BIGINT) AS year6
  FROM monthly
)
SELECT p_brand, y, m, rev6,
       abs(rev6 * 12 - year6) * 1000 // year6 AS dev_milli
FROM win
ORDER BY dev_milli DESC, p_brand, m
LIMIT 20
""",
)
def tpcds_q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q89 shape: monthly sales vs the yearly mean per brand,
    ranked by deviation. The yearly mean is a window sum over the
    bounded (brand, month) aggregate — never a second fact pass; the
    deviation is exact integer milli-units of the yearly total
    (|rev*12 - yearsum| * 1000 div yearsum), and the top-k carries a
    total-order tiebreak so both engines select the same rows."""
    t = Tables(spark, sf_dir)
    part = F.broadcast(t.part.select("p_partkey", "p_brand"))
    monthly = (
        _fact(t)
        .where(F.year("o_orderdate") == 1996)
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            "p_brand",
            F.year("o_orderdate").cast("int").alias("y"),
            F.month("o_orderdate").cast("int").alias("m"),
        )
        .agg(F.sum(F.expr(_REV6)).cast("bigint").alias("rev6"))
    )
    wy = Window.partitionBy("p_brand", "y")
    return (
        monthly.select(
            "p_brand",
            "y",
            "m",
            "rev6",
            F.sum("rev6").over(wy).cast("bigint").alias("year6"),
        )
        .select(
            "p_brand",
            "y",
            "m",
            "rev6",
            F.expr("abs(rev6 * 12 - year6) * 1000 div year6").alias(
                "dev_milli"
            ),
        )
        .orderBy(F.desc("dev_milli"), "p_brand", "m")
        .limit(20)
    )


# --------------------------------------------------------------------------
@query(
    "tpcds_q93",
    oracle=f"""
SELECT o_custkey AS custkey,
       CAST(SUM({_SQL_REV6}) AS BIGINT) AS gross6,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN {_SQL_REV6} ELSE 0 END)
         AS BIGINT) AS returned6,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE {_SQL_REV6} END)
         AS BIGINT) AS net6
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_custkey
ORDER BY net6 DESC, custkey
LIMIT 20
""",
)
def tpcds_q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q93 shape: net customer revenue after subtracting returned
    lines. TPC-DS left-joins store_returns to store_sales; with returns
    flagged in-row (l_returnflag = 'R') the netting is a conditional
    aggregate in the SAME pass as the gross — no second fact, no join,
    identical semantics."""
    t = Tables(spark, sf_dir)
    ret6 = f"CASE WHEN l_returnflag = 'R' THEN {_REV6} ELSE 0 END"
    net6 = f"CASE WHEN l_returnflag = 'R' THEN 0 ELSE {_REV6} END"
    return (
        _fact(t)
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(F.expr(_REV6)).cast("bigint").alias("gross6"),
            F.sum(F.expr(ret6)).cast("bigint").alias("returned6"),
            F.sum(F.expr(net6)).cast("bigint").alias("net6"),
        )
        .orderBy(F.desc("net6"), "custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
@query(
    "tpcds_q14",
    oracle=f"""
WITH common AS (
  SELECT p_brand FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_linestatus = 'O'
  INTERSECT
  SELECT p_brand FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_linestatus = 'F'
)
SELECT p_brand, CAST(SUM({_SQL_REV6}) AS BIGINT) AS revenue6,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand IN (SELECT p_brand FROM common)
  AND l_quantity >= 25
GROUP BY p_brand
ORDER BY p_brand
""",
)
def tpcds_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q14 shape (cross-channel INTERSECT): items sold through
    EVERY channel (here: both l_linestatus legs), then aggregate sales of
    only those. The INTERSECT runs over the bounded brand dimension —
    each leg reduces the fact to distinct brands BEFORE the set op, so
    the intersect never sees fact cardinality; the surviving brand list
    broadcasts back as a semi-join filter."""
    t = Tables(spark, sf_dir)
    part = F.broadcast(t.part.select("p_partkey", "p_brand"))
    li = t.lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
    common = (
        li.where(F.col("l_linestatus") == "O")
        .select("p_brand")
        .distinct()
        .intersect(
            li.where(F.col("l_linestatus") == "F")
            .select("p_brand")
            .distinct()
        )
    )
    return (
        li.where(F.col("l_quantity") >= 25)
        .join(F.broadcast(common), "p_brand", "semi")
        .groupBy("p_brand")
        .agg(
            F.sum(F.expr(_REV6)).cast("bigint").alias("revenue6"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------------
@query(
    "tpcds_q35",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN has_urgent THEN 1 ELSE 0 END) AS BIGINT)
         AS n_also_urgent
FROM (
  SELECT c.c_custkey, c.c_mktsegment,
         EXISTS (SELECT 1 FROM orders u WHERE u.o_custkey = c.c_custkey
                 AND u.o_orderpriority = '1-URGENT') AS has_urgent
  FROM customer c
  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                AND year(o.o_orderdate) = 1997)
)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def tpcds_q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q35 shape: customers qualified by one EXISTS (bought in
    1997) and profiled by a second, independent EXISTS (ever urgent) —
    the multi-channel-presence probe. Both subqueries decorrelate to
    aggregates on the customer key: the qualifier as a semi-join, the
    profile flag as a left join against the DISTINCT urgent-customer
    set (bounded by customers, not orders) — no correlated re-execution
    anywhere."""
    t = Tables(spark, sf_dir)
    bought_97 = (
        t.orders.where(F.year("o_orderdate") == 1997)
        .select("o_custkey")
        .distinct()
    )
    urgent = (
        t.orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("u_custkey"))
        .distinct()
        .withColumn("has_urgent", F.lit(True))
    )
    return (
        t.customer.join(
            bought_97, F.col("c_custkey") == F.col("o_custkey"), "semi"
        )
        .join(
            urgent, F.col("c_custkey") == F.col("u_custkey"), "left"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum(
                F.when(F.col("has_urgent"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_also_urgent"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
@query(
    "tpcds_q49",
    oracle=f"""
WITH rates AS (
  SELECT l_linestatus AS channel, p_brand,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
           AS BIGINT) AS n_ret,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1000000
           // COUNT(*) AS BIGINT) AS ret_ppm
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY channel, p_brand
),
ranked AS (
  SELECT channel, p_brand, ret_ppm,
         CAST(rank() OVER (PARTITION BY channel
                           ORDER BY ret_ppm DESC, p_brand) AS INT) AS rnk
  FROM rates WHERE n >= 20
)
SELECT channel, p_brand, ret_ppm, rnk
FROM ranked WHERE rnk <= 5
ORDER BY channel, rnk, p_brand
""",
)
def tpcds_q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q49 shape: worst return rates ranked WITHIN each channel,
    the per-channel rankings unioned into one report. TPC-DS runs three
    copies of the subquery (web/catalog/store) and UNIONs; with channels
    in-row, one grouped pass computes every channel's rates and a single
    channel-partitioned rank window replaces the union — same rows, one
    fact scan instead of three."""
    t = Tables(spark, sf_dir)
    part = F.broadcast(t.part.select("p_partkey", "p_brand"))
    rates = (
        t.lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_linestatus").alias("channel"), "p_brand")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("n_ret"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .where(F.col("n") >= 20)
        .select(
            "channel",
            "p_brand",
            F.expr("n_ret * 1000000 div n").alias("ret_ppm"),
        )
    )
    w = Window.partitionBy("channel").orderBy(
        F.desc("ret_ppm"), F.asc("p_brand")
    )
    return (
        rates.withColumn("rnk", F.rank().over(w).cast("int"))
        .where(F.col("rnk") <= 5)
        .orderBy("channel", "rnk", "p_brand")
    )


# --------------------------------------------------------------------------
@query(
    "tpcds_q75",
    oracle=f"""
WITH yearly AS (
  SELECT p_brand, CAST(year(o_orderdate) AS INT) AS y,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
         CAST(SUM({_SQL_REV6}) AS BIGINT) AS rev6
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY p_brand, y
)
SELECT a.p_brand, a.qty AS qty95, b.qty AS qty96,
       b.qty - a.qty AS qty_delta,
       b.rev6 - a.rev6 AS rev6_delta
FROM yearly a JOIN yearly b ON a.p_brand = b.p_brand
WHERE a.y = 1995 AND b.y = 1996 AND b.qty < a.qty
ORDER BY qty_delta, a.p_brand
""",
)
def tpcds_q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q75 shape: brands whose sales DECLINED year over year,
    with quantity and revenue deltas. The decline filter and deltas come
    from a self-join of the bounded (brand, year) aggregate — TPC-DS
    unions three channels first; the single-fact version keeps the
    signature aggregate-then-self-join plan. Both join sides are the
    same tiny aggregate, so the second leg broadcasts."""
    t = Tables(spark, sf_dir)
    part = F.broadcast(t.part.select("p_partkey", "p_brand"))
    yearly = (
        _fact(t)
        .where(F.year("o_orderdate").isin(1995, 1996))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            "p_brand", F.year("o_orderdate").cast("int").alias("y")
        )
        .agg(
            F.sum(F.expr("CAST(round(l_quantity) AS BIGINT)"))
            .cast("bigint")
            .alias("qty"),
            F.sum(F.expr(_REV6)).cast("bigint").alias("rev6"),
        )
    )
    a = yearly.where(F.col("y") == 1995).select(
        "p_brand",
        F.col("qty").alias("qty95"),
        F.col("rev6").alias("rev95_6"),
    )
    b = yearly.where(F.col("y") == 1996).select(
        "p_brand",
        F.col("qty").alias("qty96"),
        F.col("rev6").alias("rev96_6"),
    )
    return (
        a.join(F.broadcast(b), "p_brand")
        .where(F.col("qty96") < F.col("qty95"))
        .select(
            "p_brand",
            "qty95",
            "qty96",
            (F.col("qty96") - F.col("qty95")).alias("qty_delta"),
            (F.col("rev96_6") - F.col("rev95_6")).alias("rev6_delta"),
        )
        .orderBy("qty_delta", "p_brand")
    )


# --------------------------------------------------------------------------
@query(
    "tpcds_q97",
    oracle="""
WITH ch_o AS (
  SELECT DISTINCT o_custkey AS ck FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey WHERE l_linestatus = 'O'
),
ch_f AS (
  SELECT DISTINCT o_custkey AS ck FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey WHERE l_linestatus = 'F'
)
SELECT
  CAST(SUM(CASE WHEN o.ck IS NOT NULL AND f.ck IS NOT NULL
       THEN 1 ELSE 0 END) AS BIGINT) AS both_channels,
  CAST(SUM(CASE WHEN o.ck IS NOT NULL AND f.ck IS NULL
       THEN 1 ELSE 0 END) AS BIGINT) AS only_open,
  CAST(SUM(CASE WHEN o.ck IS NULL AND f.ck IS NOT NULL
       THEN 1 ELSE 0 END) AS BIGINT) AS only_finished
FROM ch_o o FULL OUTER JOIN ch_f f ON o.ck = f.ck
""",
)
def tpcds_q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q97 shape: customer overlap between two channels via a
    FULL OUTER join of the per-channel distinct-customer sets, counted
    into both/only-left/only-right buckets — the channel-migration
    report. Each set is deduped to customer grain BEFORE the join, so
    the full outer never exceeds customer cardinality; the three counts
    are one conditional aggregate over the joined null pattern."""
    t = Tables(spark, sf_dir)
    base = _fact(t)
    ch_o = (
        base.where(F.col("l_linestatus") == "O")
        .select(F.col("o_custkey").alias("ck_o"))
        .distinct()
    )
    ch_f = (
        base.where(F.col("l_linestatus") == "F")
        .select(F.col("o_custkey").alias("ck_f"))
        .distinct()
    )
    return (
        ch_o.join(ch_f, F.col("ck_o") == F.col("ck_f"), "full_outer")
        .agg(
            F.sum(
                F.when(
                    F.col("ck_o").isNotNull() & F.col("ck_f").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("both_channels"),
            F.sum(
                F.when(
                    F.col("ck_o").isNotNull() & F.col("ck_f").isNull(), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("only_open"),
            F.sum(
                F.when(
                    F.col("ck_o").isNull() & F.col("ck_f").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("only_finished"),
        )
    )
