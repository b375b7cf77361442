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


#: Driver-facing export order (round 4). The driver's correctness gate
#: consumes only the FIRST 50 registered queries, so export order IS
#: coverage. Cumulative record: r1+r2+r3 driver-verified 141/141 of the
#: r2-era surface; the 96 queries added in r3 are all local-green
#: (tests/driver_diff.py, judge re-ran 96/96 green) but have NO driver
#: verdict. The 50 below are the first rotation tranche: connectors,
#: pipeline/lifecycle, text r3, dedup r3, multimodal, plus the three
#: queries materially CHANGED this round (sim_ivf_topk map-side argmax
#: rewrite, sim_knn_label_agreement bounded-candidate rewrite,
#: dedup_simhash single-digest rewrite) and seven sim/PQ queries.
#:
#: ROUND-5 ROTATION NOTE: the remaining never-verdicted r3 queries —
#: sim_centroid_drift, sim_matryoshka_recall, sim_ndcg_eval,
#: sim_triplet_margin, sim_hard_negatives, sim_mmr_rerank,
#: sim_cluster_purity_nmi, sim_silhouette, asof_tolerance_attribution,
#: asof_nearest_alignment, sample_pps_systematic, ev_hll_partition_merge,
#: ev_attribution, ev_rfm_segments, ev_path_topk, ev_forecast_naive,
#: ev_hopping_window, ev_interarrival_profile, ev_time_to_convert,
#: ev_ab_chisquare, ev_decay_weighted, ev_activity_streaks,
#: ev_pareto_share, ev_chisquare_matrix, ev_bot_detection,
#: ev_survival_retention, ev_markov_stationary, ev_first_touch,
#: ev_funnel_regex, ev_cusum_changepoint, ops_agg_regr, ops_agg_boolean,
#: ops_winsorize, ops_mad_outliers, ops_join_cardinality, ops_distinct_on,
#: ops_qualify_rewrite, ops_recursive_cte, ops_quantile_sketch_merge,
#: ops_mix_rate_decomposition, ops_countmin_sketch,
#: ops_listagg_within_group, ops_pipe_syntax, ops_collation_group,
#: ops_bitmap_distinct, ops_try_arithmetic, ops_calendar_intervals,
#: ops_zorder_pruning — then the queries ADDED in r4 (also never
#: verdicted): dedup_cdc_chunks, dedup_sorted_neighborhood,
#: sim_dbscan_core, ops_group_order_by_all, ops_session_variables,
#: ops_execute_immediate, ev_entropy_rate, ops_hll_sketch_union,
#: ops_approx_top_k, mm_image_dhash, text_crosslingual_confusion,
#: pipeline_incremental_agg, snapshot_pysource_agg, ops_identifier_clause,
#: ev_forecast_holt, ops_lateral_column_alias, sample_weighted_expjump,
#: text_bpe_merges, mm_audio_vad_segments, text_gopher_filters,
#: pipeline_dataset_card, text_bpe_tokenize, mm_image_neardup_pairs,
#: ops_agg_mode_deterministic, ev_linear_interpolate, ops_skyline_pareto,
#: sample_neyman_allocation, pipeline_k_anonymity, ev_new_vs_returning,
#: text_feature_hashing, ops_not_in_null_semantics, mm_image_entropy,
#: sim_anisotropy_audit, sim_class_separation, ev_seasonality_profile,
#: dedup_keep_best, ops_interval_bucket_join, mix_temperature_sampling,
#: sample_bootstrap_ci, sim_srp_agreement_audit, ev_theil_sen_trend,
#: ev_click_debounce, ev_sliding_hll_7d, mix_source_caps,
#: pack_shard_manifest, ev_lttb_downsample,
#: dedup_url_canonical, sim_residual_quantize, text_boilerplate_lines,
#: text_mojibake_score, sim_ivf_balance_audit, ev_mann_kendall,
#: ev_rfm_segmentation, ssb_q1_1, ssb_q2_1, ssb_q3_1, ssb_q4_1,
#: dedup_lsh_tuning_curve, ev_markov_attribution, sim_recall_at_k_curve,
#: ev_conversion_latency, ev_path_analysis, mix_token_apportionment,
#: dedup_bucket_skew_audit
#: — then anything whose code changed in r5. All
#: names above are asserted against QUERIES at import (see bottom of
#: load_all in __init__); a typo here raises instead of silently
#: dropping a verdict slot.
EXPORT_PRIORITY: list[str] = [
    # connectors / formats / snapshots (6)
    "udf_grouped_map_normalize",
    "snapshot_timetravel_agg",
    "partitioned_roundtrip_agg",
    "xml_roundtrip_agg",
    "schema_evolution_agg",
    "orc_roundtrip_agg",
    # corpus lifecycle / pipeline (11)
    "pipeline_clean_corpus",
    "pipeline_version_diff",
    "pipeline_merge_upsert",
    "pipeline_tombstone_purge",
    "pipeline_split_leakage",
    "pipeline_data_expectations",
    "pipeline_ks_drift",
    "pipeline_source_balance",
    "pipeline_benford_audit",
    "pipeline_compaction_plan",
    "pipeline_rowcount_anomaly",
    # text analysis, r3 batch (13)
    "text_quality_classifier",
    "text_heavy_hitters",
    "text_dsir_weights",
    "text_bloom_decontam",
    "text_pmi_pairs",
    "text_source_overlap_matrix",
    "text_zipf_slope",
    "text_ngram_diversity",
    "text_classifier_calibration",
    "text_source_entropy_kl",
    "text_rake_keyphrases",
    "text_winnowing_fingerprint",
    "text_burstiness",
    # dedup, r3 batch (7)
    "dedup_incremental_lsh",
    "dedup_substring_spans",
    "dedup_minhash_accuracy",
    "dedup_graph_triangles",
    "dedup_entity_blocking",
    "dedup_containment",
    "dedup_kcore_peel",
    # multimodal, r3 batch (3)
    "mm_image_ahash",
    "mm_audio_features",
    "mm_scene_cuts",
    # similarity / PQ, r3 batch (7)
    "sim_ivf_pq",
    "sim_pq_adc",
    "sim_ann_recall",
    "sim_pq_code_dedup",
    "sim_covariance_matrix",
    "sim_pca_power_iteration",
    "sample_kcenter_coreset",
    # changed this round — need fresh verdicts (3)
    "sim_ivf_topk",
    "sim_knn_label_agreement",
    "dedup_simhash",
]


def export_ordered(d: dict[str, object]) -> dict:
    """Reorder a registry dict: EXPORT_PRIORITY entries first (in that
    order), everything else after in registration order."""
    prio = [k for k in EXPORT_PRIORITY if k in d]
    rest = [k for k in d if k not in set(prio)]
    return {k: d[k] for k in [*prio, *rest]}
