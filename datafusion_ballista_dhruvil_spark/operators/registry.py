"""Query registry: the engine's declared operator surface.

Every implemented query/operator from SURVEY.md §2 registers here with a
PySpark DataFrame builder and (when SQL-expressible) a DuckDB oracle SQL
string. ``__spark_entry__.py`` exposes these to the driver's correctness
harness; ``bench.py`` times them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is equivalent DuckDB ANSI SQL.

    Omit ``oracle`` only for genuinely non-SQL-expressible operators (the
    driver then records a weaker rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


#: Driver-facing export order (round 9). The driver's correctness gate
#: consumes only the FIRST 50 registered queries, so export order IS
#: coverage. Cumulative record through r8: 338/338 driver-verified green,
#: zero failures ever, zero unverdicted tail (VERDICT r8).
#: Tranche composition (changed-code-first rule, VERDICT r8 #3):
#: 1) the 3 queries NEW in r9 -- mm_png_features (the PNG decoder
#:    landing, VERDICT r8 #6) and the two EXISTS-family TPC-DS shapes
#:    (#7) -- all locally driver-diffed green + plan-gated;
#: 2) every decode_image consumer: the r9 PNG branch touched that
#:    function, so all queries whose results flow through it re-hash
#:    (the r8 digest-consumer precedent; all locally re-diffed green);
#: 3) refresh block: 33 of the 40 queries whose ONLY verdict is r1-era
#:    (h2o_*, ops_*, the metadata-grain mm trio, nyctaxi,
#:    dedup_ngram_jaccard/simhash_pairs) -- the true oldest rows in the
#:    ledger (the r8 note's "r3-era next-oldest" undercounted the
#:    never-refreshed r1 block). The session-2 TPC-DS widening displaced
#:    udf_table_function / udf_vectorized_score (r1-era but wholly
#:    covered by tests/test_udf_plugin.py) and session-3 displaced the
#:    metadata-grain mm trio (frame_sample/metadata_stats/
#:    resize_thumbnail — the three simplest expression-only queries)
#:    and h2o_join_small (its five join siblings carry the family
#:    signal) to r10.
#: R10 ROTATION NOTE: no queries registered after this tranche froze;
#: queue whatever code changes in r10, then finish the r1-era refresh
#: (udf_table_function, udf_vectorized_score, mm_frame_sample,
#: mm_metadata_stats, mm_resize_thumbnail, h2o_join_small,
#: ops_values_limit_offset), then the r2-era rows
#: (24 left, incl. the asof keystone) and the r3-era approx/window
#: families.
#: All names below are asserted against QUERIES at import (see bottom of
#: load_all in __init__); a typo here raises instead of silently dropping
#: a verdict slot.
EXPORT_PRIORITY: list[str] = [
    # ---- new in r9 (changed-code-first: brand-new registrations)
    "mm_png_features",
    "tpcds_q95",
    "tpcds_q10",
    # r9 session-2 TPC-DS widening (all locally driver-diffed green,
    # 0 bad of 4)
    "tpcds_q94",
    "tpcds_q92",
    "tpcds_q99",
    "tpcds_q13",
    # r9 session-3 TPC-DS widening (0 bad of 3 locally)
    "tpcds_q41",
    "tpcds_q76",
    "tpcds_q90",
    # r9 session-3: real pixel resize over the PNG decode path + the
    # audio resample analogue over the WAV decode path
    "mm_image_resize",
    "mm_audio_resample",
    # ---- decode_image consumers (its PNG branch is new in r9)
    "mm_decode_features",
    "mm_image_ahash",
    "mm_image_dhash",
    "mm_image_neardup_pairs",
    "mm_image_entropy",
    # ---- refresh block: every query still carrying an r1-era verdict
    "h2o_corr_by_group", "h2o_join_big", "h2o_join_factor",
    "h2o_join_left_medium", "h2o_join_medium",
    "h2o_mean_multi", "h2o_median_sd", "h2o_range_by_group",
    "h2o_sum_composite", "h2o_sum_count_wide", "h2o_sum_hicard",
    "h2o_sum_lowcard", "h2o_top2_per_group",
    "ops_agg_filter_distinct", "ops_agg_stats", "ops_cross_join",
    "ops_grouping_sets", "ops_histogram", "ops_join_left_right",
    "ops_join_null_safe", "ops_join_outer_coalesce", "ops_join_semi_anti",
    "ops_profile_stats", "ops_rollup_cube", "ops_setops",
    "ops_table_checksum", "ops_topk",
    "ops_window_analytic", "ops_window_frames", "ops_window_ranking",
    "nyctaxi_agg",
    "dedup_ngram_jaccard", "dedup_simhash_pairs",
]


def export_ordered(d: dict[str, object]) -> dict:
    """Reorder a registry dict: EXPORT_PRIORITY entries first (in that
    order), everything else after in registration order."""
    prio = [k for k in EXPORT_PRIORITY if k in d]
    rest = [k for k in d if k not in set(prio)]
    return {k: d[k] for k in [*prio, *rest]}
