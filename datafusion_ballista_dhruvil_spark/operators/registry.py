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


#: Driver-facing export order (round 3). The driver's correctness gate
#: consumes only the FIRST 50 registered queries, so export order IS
#: coverage. r1 checked 50, r2 a different 50 (union 94 of 141); the 47
#: below have NEVER received a driver verdict — they fill the first 47
#: slots so CORRECTNESS_r03 reaches 141/141 driver-verified. The last 3
#: slots re-verify queries materially changed this round (bounded
#: ops_agg_approx oracle, real mm_decode_features decoder, sim_cosine_topk
#: after the perf re-measure).
#:
#: ROUND-4 ROTATION NOTE: put the queries ADDED in r3 first — sim_pq_adc,
#: text_quality_classifier, mm_image_ahash, mm_audio_features,
#: dedup_incremental_lsh, ops_agg_regression, ops_agg_boolean,
#: text_heavy_hitters, dedup_substring_span, text_dsir_weights,
#: dedup_incremental_minhash streaming variant, sim_ann_recall,
#: ops_agg_hll_rollup, pipeline_clean_corpus, pipeline_version_diff,
#: pipeline_merge_upsert, pipeline_tombstone_purge, pipeline_split_leakage,
#: text_bloom_decontam, ops_zorder_pruning, ops_winsorize, text_pmi_pairs,
#: pipeline_data_expectations, ev_attribution, ev_rfm_segments,
#: sim_centroid_drift, sim_ivf_pq, pipeline_ks_drift, dedup_minhash_accuracy,
#: ev_path_topk, ops_mad_outliers, ops_join_cardinality, dedup_graph_triangles,
#: sim_pq_code_dedup, ev_forecast_naive, text_source_overlap_matrix,
#: ev_hopping_window, ops_distinct_on, sim_matryoshka_recall,
#: snapshot_timetravel_agg, sim_knn_label_agreement, text_zipf_slope,
#: ev_interarrival_profile, text_ngram_diversity, pipeline_source_balance,
#: udf_grouped_map_normalize, ev_time_to_convert, ops_qualify_rewrite,
#: ev_ab_chisquare, dedup_entity_blocking, pipeline_benford_audit,
#: sim_covariance_matrix, sample_pps_systematic, ev_decay_weighted,
#: pipeline_compaction_plan, sim_ndcg_eval, text_classifier_calibration,
#: ev_activity_streaks, sim_triplet_margin, ev_pareto_share,
#: ev_chisquare_matrix, text_source_entropy_kl, mm_scene_cuts,
#: ev_bot_detection, dedup_containment, asof_tolerance_attribution,
#: sim_hard_negatives, sim_mmr_rerank, sample_kcenter_coreset,
#: text_rake_keyphrases, ev_survival_retention, ops_recursive_cte,
#: sim_cluster_purity_nmi, ops_quantile_sketch_merge,
#: text_winnowing_fingerprint, asof_nearest_alignment,
#: ev_markov_stationary, text_burstiness, ops_mix_rate_decomposition,
#: partitioned_roundtrip_agg, pipeline_rowcount_anomaly,
#: ops_countmin_sketch, ops_listagg_within_group, ev_first_touch,
#: ops_pipe_syntax, ops_collation_group, ops_bitmap_distinct,
#: ev_funnel_regex, xml_roundtrip_agg, schema_evolution_agg,
#: sim_pca_power_iteration, orc_roundtrip_agg, ops_try_arithmetic,
#: ops_calendar_intervals
#: (all local-green via tests/driver_diff.py + tools/drive_contract.py but
#: never driver-verdicted) — then any query whose code changed in r4.
EXPORT_PRIORITY: list[str] = [
    # temporal / sampling / splits (7)
    "range_recent_clicks",
    "split_hash_assign",
    "sample_stratified_hash",
    "sample_topk_per_group",
    "pack_token_bins",
    "mix_resample_sources",
    "sample_negative_pairs",
    # text analysis (16)
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
    # event analytics (16)
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
    # relational leftovers (8)
    "ops_empty_relation",
    "ops_unpivot",
    "yoy_sales_growth",
    "ops_sort_null_order",
    "ops_array_hof",
    "ops_lateral_explode",
    "ops_explode_outer",
    "ops_lateral_join",
    # changed this round — need fresh verdicts (3)
    "ops_agg_approx",
    "mm_decode_features",
    "sim_cosine_topk",
]


def export_ordered(d: dict[str, object]) -> dict:
    """Reorder a registry dict: EXPORT_PRIORITY entries first (in that
    order), everything else after in registration order."""
    prio = [k for k in EXPORT_PRIORITY if k in d]
    rest = [k for k in d if k not in set(prio)]
    return {k: d[k] for k in [*prio, *rest]}
