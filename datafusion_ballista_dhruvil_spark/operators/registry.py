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


#: Driver-facing export order (round 11). The driver's correctness gate
#: consumes only the FIRST 50 registered queries, so export order IS
#: coverage. Cumulative record through r10: every registered query has a
#: green latest verdict (VERDICT r10 recomputed: never-verified = none,
#: latest-red = none).
#: Tranche composition (changed-code-first, then least-recently-verified —
#: VERDICT r10 #7 asked for staleness rotation, and as of r10 exactly 40
#: rows' latest verdict dated from round 3):
#: 1) the 7 queries whose code/plan changed in r11 (ev_markov explode
#:    rewrite, purity_nmi + crosslingual argmin-by-min(struct), pca cache
#:    lifecycle + empty contract, lsh_tuning prepare hook, agg_approx
#:    staged cache, bpe final-persist skip);
#: 2) 3 representative consumers of the r11 scale-adaptive shingle-spread
#:    code path (plans provably unchanged at local SFs — the hash gate
#:    confirms the no-op);
#: 3) all 40 rows last verified in round 3 (the ev_* streaming family,
#:    the r3 text_* block, sim_cosine_topk, sample_*/split/mix/pack,
#:    range_recent_clicks, yoy_sales_growth, and the 3 ops rows displaced
#:    from the r10 tranche) — after this tranche no row's latest verdict
#:    is older than round 4.
#: All names below are asserted against QUERIES at import (see bottom of
#: load_all in __init__); a typo here raises instead of silently dropping
#: a verdict slot.
EXPORT_PRIORITY: list[str] = [
    # ---- r11 changed code/plans
    "ev_markov_attribution",
    "sim_cluster_purity_nmi",
    "sim_pca_power_iteration",
    "dedup_lsh_tuning_curve",
    "ops_agg_approx",
    "text_bpe_merges",
    "text_crosslingual_confusion",
    # ---- r11 shingle-spread code-path representatives
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "pipeline_clean_corpus",
    # ---- r3-era refresh (all 40 rows whose latest verdict is round 3)
    "ev_anomaly_zscore", "ev_cohort_retention", "ev_date_bin",
    "ev_dau_wau_mau", "ev_funnel_stages", "ev_gapfill_series",
    "ev_props_json", "ev_props_variant", "ev_rollup_multires",
    "ev_scd2_intervals", "ev_session_window", "ev_sessionize",
    "ev_transition_matrix", "ev_tumbling_window", "ev_type_pivot",
    "ev_watermark_audit", "mix_resample_sources", "ops_lateral_join",
    "ops_sort_null_order", "ops_unpivot", "pack_token_bins",
    "range_recent_clicks", "sample_negative_pairs",
    "sample_stratified_hash", "sample_topk_per_group", "sim_cosine_topk",
    "split_hash_assign", "text_bm25_topk", "text_chunk_crossdup",
    "text_chunk_windows", "text_decontam_overlap", "text_fingerprint",
    "text_langid", "text_ngram_profile", "text_pii_redact",
    "text_regex_tokens", "text_repetition_filter", "text_tokens_quality",
    "text_vocab_topk", "yoy_sales_growth",
]


def export_ordered(d: dict[str, object]) -> dict:
    """Reorder a registry dict: EXPORT_PRIORITY entries first (in that
    order), everything else after in registration order."""
    prio = [k for k in EXPORT_PRIORITY if k in d]
    rest = [k for k in d if k not in set(prio)]
    return {k: d[k] for k in [*prio, *rest]}
