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


#: Driver-facing export order (round 2). The r1 correctness gate consumed
#: only the FIRST 50 registered queries, so export order IS coverage.
#: This round: TPC-H q1-q22 first (zero driver rows in r1), then the six
#: r1-red rows just fixed, then families with no driver verdict yet
#: (scalar-fn families, similarity, temporal, sampling, text, events,
#: relational leftovers), and the 44 r1-green rows last. Rotate next round
#: based on which slice CORRECTNESS_r02 actually covered.
EXPORT_PRIORITY: list[str] = [
    *[f"q{i}" for i in range(1, 23)],
    # r1 red rows, fixed this round — need fresh driver verdicts
    "h2o_sum_multi",
    "ops_window_groups",
    "ops_agg_weighted_percentile",
    "ops_agg_approx",
    "udf_grouped_agg",
    "mm_decode_features",
    # SURVEY §2.4 scalar-function families (all untested r1)
    "ops_scalar_string",
    "ops_scalar_math",
    "ops_scalar_datetime",
    "ops_case_cast",
    "ops_regexp_hash",
    "ops_map_functions",
    "ops_bool_predicates",
    # §2.7 connector round-trips (new in r2 — no driver rows yet)
    "avro_roundtrip_agg",
    "csv_roundtrip_agg",
    "json_roundtrip_agg",
    # similarity / ANN family
    "sim_cosine_topk",
    "sim_ann_bucketed",
    "sim_ivf_topk",
    "sim_embedding_neardup",
    "sim_centroid_by_label",
    "sim_kmeans_assign",
    "sim_embedding_quantize",
    "sim_random_projection",
    "hybrid_search_rrf",
    "sim_kmeans_iterate",
    "dedup_semantic_keep",
    # temporal joins
    "asof_click_attribution",
    "range_recent_clicks",
    # splits / sampling / packing
    "split_hash_assign",
    "sample_stratified_hash",
    "sample_topk_per_group",
    "pack_token_bins",
    "mix_resample_sources",
    "sample_negative_pairs",
    # text analysis
    "text_tokens_quality",
    "text_regex_tokens",
    "text_langid",
    "text_fingerprint",
    "text_ngram_profile",
    "text_vocab_topk",
    "text_tfidf_topterms",
    "text_repetition_filter",
    "text_decontam_overlap",
    "text_bm25_topk",
    "text_pii_redact",
    "text_chunk_windows",
    "text_bigram_lm_score",
    "text_chunk_crossdup",
    "dedup_chunk_pagerank",
    "dedup_editdist_verify",
    # event analytics
    "ev_tumbling_window",
    "ev_rollup_multires",
    "ev_session_window",
    "ev_sessionize",
    "ev_date_bin",
    "ev_type_pivot",
    "ev_gapfill_series",
    "ev_props_json",
    "ev_cohort_retention",
    "ev_funnel_stages",
    "ev_props_variant",
    "ev_transition_matrix",
    "ev_scd2_intervals",
    "ev_anomaly_zscore",
    "ev_watermark_audit",
    "ev_dau_wau_mau",
    # relational leftovers (untested r1)
    "ops_empty_relation",
    "ops_unpivot",
    "yoy_sales_growth",
    "ops_sort_null_order",
    "ops_array_hof",
    "ops_lateral_explode",
    "ops_explode_outer",
    "ops_lateral_join",
]


def export_ordered(d: dict[str, object]) -> dict:
    """Reorder a registry dict: EXPORT_PRIORITY entries first (in that
    order), everything else after in registration order."""
    prio = [k for k in EXPORT_PRIORITY if k in d]
    rest = [k for k in d if k not in set(prio)]
    return {k: d[k] for k in [*prio, *rest]}
