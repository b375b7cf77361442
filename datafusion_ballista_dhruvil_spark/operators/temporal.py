"""Temporal joins: as-of (point-in-time) join and bounded range join.

Neither exists as a built-in Spark join. Both are staples of event/feature
pipelines (attribution, feature backfill, "activity in the last N minutes"),
and both have naive formulations that Catalyst can only plan as a
BroadcastNestedLoopJoin over an inequality predicate — quadratic per key and
a non-starter at 100 TB. This module implements the scalable formulations:

- **as-of join** (`asof_join`): union both sides tagged, ONE hash shuffle on
  the key, per-key sort by timestamp, and a running ``last(payload,
  ignorenulls=True)`` window. Each input row is exchanged exactly once;
  within a key the match is found by the sort, not by pairing — O(n log n)
  per key with zero join blowup. (DuckDB spells this ``ASOF JOIN``; the
  oracle uses the ANSI window form so semantics are pinned row-for-row.)
- **range join** (`range_count_recent_clicks`): bucket the time axis into
  bins the width of the query range, explode the probe side to its two
  candidate bins, and equi-join on (key, bin) before the exact range filter.
  The inequality predicate only runs on candidate pairs that share a
  600-second bin — Catalyst plans a plain shuffled hash join, never a
  nested-loop. This is the standard interval-binning trick Spark itself
  recommends for event-time interval joins.

Scale notes: the as-of window partitions by key only, so a single pathological
key serializes within one task; for that shape, pre-aggregate the right side
per (key, time-chunk) first, or bound the lookback with ``tolerance_us`` and
bin like the range join. The range join's fan-out is exactly 2x the probe
side, independent of data volume.

Reference parity: the reference engine has no temporal joins (DataFusion 37
surface, SURVEY.md §2.2) — this is part of the beyond-reference training-data
pipeline surface, same tier as dedup/similarity (BASELINE.json north star).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_ballista_dhruvil_spark.functions.compat import dsum, sql_dsum
from datafusion_ballista_dhruvil_spark.operators.registry import query
from datafusion_ballista_dhruvil_spark.session import Tables


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    payload: Sequence[str] = (),
    tie: str | None = None,
    tolerance_us: int | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right.ts <= left.ts`` for the same ``on`` key (left-join semantics:
    unmatched left rows keep NULL payload).

    Ties on ``right.ts`` are broken by the greatest ``tie`` column value so
    the match is deterministic. ``tolerance_us`` (microseconds) nulls out
    matches older than ``left.ts - tolerance_us``.

    Output: every left column, plus ``prefix + c`` for each payload column.
    """
    lcols = list(left.columns)
    rsel = [
        F.col(on),
        F.col(ts),
        F.struct(
            F.unix_micros(F.col(ts)).alias("__rts"),
            *(F.col(c).alias(c) for c in payload),
        ).alias("__p"),
        F.lit(0).alias("__side"),
    ]
    if tie is not None:
        rsel.append(F.col(tie).alias("__tie"))
    r = right.select(*rsel)
    l = left.select(*lcols, F.lit(1).alias("__side"))
    # unionByName fills each side's missing columns (left: __p/__tie,
    # right: non-key left columns) with typed NULLs
    u = l.unionByName(r, allowMissingColumns=True)

    order = [F.col(ts).asc(), F.col("__side").asc()]
    if tie is not None:
        # right rows sort among themselves by tie; left rows (NULL tie)
        # already ordered after right rows at equal ts via __side
        order.append(F.col("__tie").asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    if tolerance_us is not None:
        u = u.withColumn(
            "__m",
            F.when(
                F.unix_micros(F.col(ts)) - F.col("__m.__rts") <= F.lit(tolerance_us),
                F.col("__m"),
            ),
        )
    return u.where(F.col("__side") == 1).select(
        *lcols, *(F.col(f"__m.{c}").alias(prefix + c) for c in payload)
    )


# As-of attribution: every click matched to the latest view at-or-before it
# by the same user. The oracle pins exact semantics (inclusive <=, ties to
# the greatest event_id) with the ANSI window form DuckDB and Spark agree on.
@query(
    "asof_click_attribution",
    oracle="""
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
v AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'view'),
j AS (
  SELECT c.event_id, c.user_id, c.ts,
         v.ts AS prev_view_ts, v.value AS prev_view_value,
         row_number() OVER (PARTITION BY c.event_id
                            ORDER BY v.ts DESC, v.event_id DESC) AS rn
  FROM c LEFT JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       strftime(prev_view_ts, '%Y-%m-%d %H:%M:%S.%f') AS prev_view_ts,
       prev_view_value,
       epoch_us(ts) - epoch_us(prev_view_ts) AS gap_us
FROM j WHERE rn = 1
ORDER BY event_id
""",
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    clicks = t.events.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = t.events.where(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks,
        views,
        on="user_id",
        ts="ts",
        payload=["ts", "value"],
        tie="event_id",
        prefix="prev_view_",
    )
    # timestamps rendered as ISO strings at the harness boundary (NULL
    # prev_view_ts stays NULL): engine-invariant canonical comparison.
    return out.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.unix_micros("prev_view_ts")).alias("gap_us"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.date_format("prev_view_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "prev_view_ts"
        ),
        F.col("prev_view_value"),
    ).orderBy("event_id")


_RANGE_US = 600_000_000  # 10 minutes, == the bin width


@query(
    "range_recent_clicks",
    oracle=f"""
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       count(c.ts) AS n_recent_clicks,
       coalesce({sql_dsum("CAST(c.value AS DECIMAL(18,6))")}, 0.0) AS click_value_sum
FROM e LEFT JOIN c ON e.user_id = c.user_id
  AND epoch_us(c.ts) >= epoch_us(e.ts) - {_RANGE_US}
  AND epoch_us(c.ts) < epoch_us(e.ts)
GROUP BY e.event_id, e.user_id, e.ts
ORDER BY e.event_id
""",
)
def range_recent_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: count + value-sum of the same user's clicks in the
    preceding 10 minutes ``[ts - 10min, ts)``.

    A 600-second window only ever spans two 600-second bins, so the probe
    (error) side explodes to bins {b-1, b} and the equi-join on
    (user_id, bin) bounds the candidate set; the exact inequality runs
    post-join on integer microseconds (no interval arithmetic to drift).
    """
    t = Tables(spark, sf_dir)
    err = t.events.where(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts"), F.unix_micros("ts").alias("e_us")
    )
    clk = t.events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_uid"),
        F.unix_micros("ts").alias("c_us"),
        F.col("value").cast("decimal(18,6)").alias("c_val"),
    )
    b = F.floor(F.col("e_us") / _RANGE_US)
    err_b = err.withColumn("__bin", F.explode(F.array(b - 1, b)))
    clk_b = clk.withColumn("__bin", F.floor(F.col("c_us") / _RANGE_US))
    matched = err_b.join(
        clk_b,
        (F.col("user_id") == F.col("c_uid"))
        & (err_b["__bin"] == clk_b["__bin"])
        & (F.col("c_us") >= F.col("e_us") - _RANGE_US)
        & (F.col("c_us") < F.col("e_us")),
    )
    agg = matched.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_recent_clicks"),
        dsum(F.col("c_val")).alias("click_value_sum"),
    )
    return (
        err.join(agg, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
            F.coalesce("n_recent_clicks", F.lit(0)).alias("n_recent_clicks"),
            F.coalesce("click_value_sum", F.lit(0.0)).alias("click_value_sum"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
@query(
    "asof_tolerance_attribution",
    oracle="""
WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click'),
j AS (
  SELECT c.event_id, c.user_id, c.ts,
         v.ts AS prev_ts, v.value AS prev_value,
         row_number() OVER (PARTITION BY c.event_id
                            ORDER BY v.ts DESC, v.event_id DESC) AS rn
  FROM c LEFT JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts
),
m AS (
  SELECT event_id, user_id, ts,
         CASE WHEN epoch_us(ts) - epoch_us(prev_ts) <= 3600000000
              THEN prev_value END AS attr_value,
         CASE WHEN epoch_us(ts) - epoch_us(prev_ts) <= 3600000000
              THEN epoch_us(ts) - epoch_us(prev_ts) END AS gap_us
  FROM j WHERE rn = 1
)
SELECT COUNT(*) AS n_purchases,
       COUNT(attr_value) AS n_attributed,
       CAST(COALESCE(SUM(CAST(round(attr_value * 100) AS BIGINT)), 0)
            AS BIGINT) AS attr_cents,
       MAX(gap_us) AS max_gap_us
FROM m
""",
)
def asof_tolerance_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-lookback as-of attribution: each purchase matches the latest
    click at most ONE HOUR before it (asof_join's ``tolerance_us`` path —
    matches older than the tolerance null out, exactly the attribution-
    window semantics ad pipelines bill on, and the state-bound that makes
    the streaming version's watermark finite).

    Same single user-keyed shuffle as the unbounded as-of; the tolerance
    is a post-window projection, not another join. Summary output (counts
    + exact cent sum) keeps the hash gate on integers.
    """
    t = Tables(spark, sf_dir)
    purchases = t.events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = t.events.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        ts="ts",
        payload=["ts", "value"],
        tie="event_id",
        tolerance_us=3_600_000_000,
        prefix="prev_",
    )
    return out.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("prev_value").alias("n_attributed"),
        F.coalesce(
            F.sum(F.round(F.col("prev_value") * 100).cast("bigint")), F.lit(0)
        )
        .cast("bigint")
        .alias("attr_cents"),
        F.max(
            F.unix_micros(F.col("ts")) - F.unix_micros(F.col("prev_ts"))
        ).alias("max_gap_us"),
    )


# --------------------------------------------------------------------------
@query(
    "asof_nearest_alignment",
    oracle="""
WITH p AS (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
           FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      FROM events WHERE event_type = 'click'),
bwd AS (
  SELECT event_id, prev_t FROM (
    SELECT p.event_id, c.t AS prev_t,
           row_number() OVER (PARTITION BY p.event_id
                              ORDER BY c.t DESC, c.event_id DESC) AS rn
    FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.t <= p.t
  ) WHERE rn = 1
),
fwd AS (
  SELECT event_id, next_t FROM (
    SELECT p.event_id, c.t AS next_t,
           row_number() OVER (PARTITION BY p.event_id
                              ORDER BY c.t ASC, c.event_id ASC) AS rn
    FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.t > p.t
  ) WHERE rn = 1
),
m AS (
  SELECT p.event_id, p.t, bwd.prev_t, fwd.next_t,
         CASE
           WHEN bwd.prev_t IS NULL AND fwd.next_t IS NULL THEN NULL
           WHEN fwd.next_t IS NULL THEN p.t - bwd.prev_t
           WHEN bwd.prev_t IS NULL THEN fwd.next_t - p.t
           WHEN p.t - bwd.prev_t <= fwd.next_t - p.t THEN p.t - bwd.prev_t
           ELSE fwd.next_t - p.t END AS near_gap_us
  FROM p JOIN bwd USING (event_id) JOIN fwd USING (event_id)
)
SELECT COUNT(*) AS n_purchases,
       COUNT(near_gap_us) AS n_aligned,
       COUNT(CASE WHEN near_gap_us <= 1800000000 THEN 1 END)
         AS n_within_30m,
       CAST(COALESCE(SUM(CASE WHEN near_gap_us <= 1800000000
                              THEN near_gap_us END), 0) AS BIGINT)
         AS sum_gap_us_within
FROM m
""",
)
def asof_nearest_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor temporal alignment (the third as-of direction after
    backward and tolerance-bounded): each purchase aligns to its closest
    click in EITHER direction, ties to the earlier side — the
    sensor-fusion / feature-alignment join (pandas merge_asof
    direction='nearest').

    Implementation reuses asof_join twice: the forward pass IS the
    backward pass on negated timestamps (no new machinery, same
    union-window plan) — two user-keyed shuffles total, then an exact
    integer comparison picks the nearer side. Summary output keeps the
    gate on integer microsecond gaps.
    """
    t = Tables(spark, sf_dir)
    p = t.events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = t.events.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", F.col("value").alias("cvalue")
    )
    bwd = asof_join(
        p, c, on="user_id", ts="ts", payload=["ts"], tie="event_id", prefix="prev_"
    ).select("event_id", F.unix_micros("ts").alias("t"), F.unix_micros("prev_ts").alias("prev_t"))
    # forward pass = backward as-of on NEGATED time. Strictness (> not >=):
    # the LEFT side shifts one microsecond further negative, so the match
    # condition -t <= -pt-1 is exactly t > pt — shifting the right side
    # instead would ADMIT t in {pt-1, pt} (over-inclusive and double-counts
    # a click at the purchase instant on both passes).
    p_neg = p.select(
        "event_id",
        "user_id",
        F.expr("timestamp_micros(-unix_micros(ts) - 1)").alias("ts"),
    )
    c_neg = c.select(
        "user_id",
        F.expr("timestamp_micros(-unix_micros(ts))").alias("ts"),
        F.unix_micros("ts").alias("orig_t"),
        # tie must mirror the oracle's ASC event_id under negation
        (-F.col("event_id")).alias("neg_id"),
    )
    fwd = asof_join(
        p_neg,
        c_neg,
        on="user_id",
        ts="ts",
        payload=["orig_t"],
        tie="neg_id",
        prefix="next_",
    ).select("event_id", F.col("next_orig_t").alias("next_t"))
    gap_b = F.col("t") - F.col("prev_t")
    gap_f = F.col("next_t") - F.col("t")
    near = (
        F.when(F.col("prev_t").isNull() & F.col("next_t").isNull(), F.lit(None))
        .when(F.col("next_t").isNull(), gap_b)
        .when(F.col("prev_t").isNull(), gap_f)
        .when(gap_b <= gap_f, gap_b)
        .otherwise(gap_f)
    )
    m = bwd.join(fwd, "event_id").select(near.alias("near_gap_us"))
    return m.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("near_gap_us").alias("n_aligned"),
        F.count(F.when(F.col("near_gap_us") <= 1800000000, 1)).alias(
            "n_within_30m"
        ),
        F.coalesce(
            F.sum(F.when(F.col("near_gap_us") <= 1800000000, F.col("near_gap_us"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("sum_gap_us_within"),
    )
