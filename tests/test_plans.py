"""Plan-shape assertions: the physical plans the 100 TB design depends on.

These guard against regressions that correctness tests cannot see — a lost
filter pushdown or broadcast still returns right answers, just 100x slower
at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_ballista_dhruvil_spark.operators import load_all
from datafusion_ballista_dhruvil_spark.operators.registry import QUERIES
from datafusion_ballista_dhruvil_spark.plans.inspect import (
    codegen_span_count,
    exchange_count,
    formatted_plan,
    has_partial_final_agg,
    has_pushed_filters,
    scan_read_columns,
    uses_broadcast_join,
)
from datafusion_ballista_dhruvil_spark.session import Tables

from tests.conftest import SF_DIR

load_all()


def test_filter_pushdown_reaches_parquet(spark):
    # q6 filters on shipdate/discount/quantity must reach the scan
    df = QUERIES["q6"](spark, SF_DIR)
    assert has_pushed_filters(df, "l_shipdate")
    assert has_pushed_filters(df, "l_quantity")


def test_column_pruning(spark):
    # q1 touches 7 lineitem columns; the scan must not read the other 4
    df = QUERIES["q1"](spark, SF_DIR)
    cols = scan_read_columns(df)
    assert "l_orderkey" not in cols and "l_partkey" not in cols
    assert "l_quantity" in cols and "l_returnflag" in cols


def test_small_dims_broadcast(spark):
    # q5's nation/region joins must be broadcast, not shuffled
    assert uses_broadcast_join(QUERIES["q5"](spark, SF_DIR))
    assert uses_broadcast_join(QUERIES["q9"](spark, SF_DIR))


def test_two_phase_aggregation(spark):
    # the reference's Partial/FinalPartitioned split (execution_graph.rs:66-96)
    assert has_partial_final_agg(QUERIES["q1"](spark, SF_DIR))


def test_q1_single_shuffle(spark):
    # scan -> partial agg -> exchange -> final agg -> sort: exactly the
    # reference's canonical 2-stage shape; more exchanges = regression
    df = QUERIES["q1"](spark, SF_DIR)
    assert exchange_count(df) <= 2  # group-by exchange + global sort


def test_codegen_alive_in_hot_path(spark):
    # TPC-H queries must stay inside Tungsten codegen (no Python in hot path)
    for name in ("q1", "q3", "q6"):
        assert codegen_span_count(QUERIES[name](spark, SF_DIR)) >= 1, name


def test_dedup_exact_is_single_shuffle(spark):
    df = QUERIES["dedup_exact"](spark, SF_DIR)
    # hash -> partial agg -> exchange -> final agg (+topk); one real shuffle
    assert exchange_count(df) <= 1


def test_topk_uses_take_ordered(spark):
    from datafusion_ballista_dhruvil_spark.plans.inspect import formatted_plan

    plan = formatted_plan(QUERIES["ops_topk"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan  # no global sort for LIMIT 15


def test_semi_join_pushes_filter_into_scan(spark):
    t = Tables(spark, SF_DIR)
    df = t.orders.where(F.col("o_orderkey") < 100)
    assert has_pushed_filters(df, "o_orderkey")


def test_groups_frame_documented_gap(spark):
    # SURVEY §2.6: GROUPS window frames are a documented Spark gap (not
    # reachable from the reference's tested SQL either). Assert the gap is
    # real and surfaces as a parse/analysis error, not silent misbehavior.
    import pytest as _pytest
    from pyspark.sql.utils import AnalysisException, ParseException

    Tables(spark, SF_DIR).orders.createOrReplaceTempView("gap_orders")
    with _pytest.raises((ParseException, AnalysisException)):
        spark.sql(
            "SELECT sum(o_totalprice) OVER (ORDER BY o_orderkey "
            "GROUPS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM gap_orders"
        ).collect()


def test_repartition_nodes(spark):
    # logical repartition node parity (datafusion.proto:154-165):
    # hash(exprs, n) and round-robin(n)
    from datafusion_ballista_dhruvil_spark.plans.inspect import formatted_plan

    t = Tables(spark, SF_DIR)
    hashed = formatted_plan(t.orders.repartition(8, "o_custkey"))
    assert "hashpartitioning(o_custkey" in hashed
    rr = formatted_plan(t.orders.repartition(8))
    assert "RoundRobinPartitioning" in rr or "REPARTITION_BY_NUM" in rr


def test_temporal_joins_never_nested_loop(spark):
    """The whole point of the as-of/range formulations: Catalyst must plan
    hash/sort-merge joins, never a BroadcastNestedLoopJoin over the
    inequality predicate."""
    for name in ("asof_click_attribution", "range_recent_clicks"):
        plan = formatted_plan(QUERIES[name](spark, SF_DIR))
        assert "NestedLoop" not in plan, f"{name} degraded to nested-loop"
        assert "Cartesian" not in plan, f"{name} degraded to cartesian"
    # as-of is the union-window shape: exactly one Window, a Union below it
    asof = formatted_plan(QUERIES["asof_click_attribution"](spark, SF_DIR))
    assert "Union" in asof and "Window" in asof


def test_ivf_assignment_is_map_side(spark):
    """r4 rewrite (VERDICT r3 item 2): centroid assignment must be the
    map-side broadcast-matrix kernel, NOT a crossJoin + row_number window
    over N*K rows. Exactly one Window survives (the final bounded top-3
    over probe candidates); no nested-loop join anywhere."""
    plan = formatted_plan(QUERIES["sim_ivf_topk"](spark, SF_DIR))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert plan.count("Window") - plan.count("WindowGroupLimit") <= 2
    # the assignment itself is Arrow mapInPandas (MapInPandas / ArrowEval)
    assert "MapInPandas" in plan
    # probing is an equi-join on centroid_id -> must be a hash join
    assert (
        "BroadcastHashJoin" in plan
        or "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
    )


def test_tpcds_plan_shapes(spark):
    """The TPC-DS subset's scale claims must be mechanical, not prose:
    q88's eight 'scalar subqueries' collapse to ONE fact scan + one
    single-partition reduce (the 8x I/O saving the docstring claims);
    q3/q36 broadcast their item dimension (no sort-merge on a dim); q36's
    ROLLUP runs as grouping-set Expand over the same single fact pass;
    nothing in the family degrades to a nested-loop/cartesian join."""
    from tools.plan_fingerprint import node_counts

    q88 = node_counts(formatted_plan(QUERIES["tpcds_q88"](spark, SF_DIR)))
    assert q88["scans"] == 1, f"q88 re-scans the fact: {q88}"
    assert q88["exchanges"] == 1 and q88["aggregates"] == 2, q88

    q3 = node_counts(formatted_plan(QUERIES["tpcds_q3"](spark, SF_DIR)))
    assert q3["bhj"] >= 1 and q3["smj"] == 0, f"q3 dim not broadcast: {q3}"

    p36 = formatted_plan(QUERIES["tpcds_q36"](spark, SF_DIR))
    q36 = node_counts(p36)
    assert "Expand" in p36, "q36 rollup lost its grouping-set Expand"
    assert q36["scans"] == 2, f"q36 re-scans for the window: {q36}"

    # q4/q23 carry a documented 1-row scalar-merge broadcast crossJoin
    # (global ratio / max-spend threshold); everything else must be
    # equi-join only
    scalar_merge_ok = {"tpcds_q4": 1, "tpcds_q23": 1}
    for name in ("tpcds_q4", "tpcds_q14", "tpcds_q35", "tpcds_q49",
                 "tpcds_q51", "tpcds_q59", "tpcds_q65", "tpcds_q75",
                 "tpcds_q93", "tpcds_q97",
                 # r6 widening
                 "tpcds_q1", "tpcds_q5", "tpcds_q6", "tpcds_q23",
                 "tpcds_q31", "tpcds_q38", "tpcds_q54", "tpcds_q66",
                 "tpcds_q67", "tpcds_q87",
                 # r7 widening
                 "tpcds_q47", "tpcds_q57", "tpcds_q44", "tpcds_q70",
                 # r9 widening
                 "tpcds_q95", "tpcds_q10"):
        plan = formatted_plan(QUERIES[name](spark, SF_DIR))
        counts = node_counts(plan)
        assert counts["nested_loop"] <= scalar_merge_ok.get(name, 0), (
            f"{name} degraded to nested-loop: {counts}"
        )

    # r6 widening shape gates: q5's rollup netting and q67's deep rollup
    # must run as grouping-set Expand over ONE fact pass (no re-scan per
    # level); q66's 12-month pivot must be one scan + one aggregate pair
    # (no 12-way self-join); q6's pricey-part set must reach the fact as
    # a broadcast semijoin
    p5 = formatted_plan(QUERIES["tpcds_q5"](spark, SF_DIR))
    assert "Expand" in p5 and node_counts(p5)["scans"] == 2, p5[:500]
    p67 = formatted_plan(QUERIES["tpcds_q67"](spark, SF_DIR))
    assert "Expand" in p67 and node_counts(p67)["scans"] == 3, p67[:500]
    p66 = node_counts(formatted_plan(QUERIES["tpcds_q66"](spark, SF_DIR)))
    assert p66["aggregates"] == 2, f"q66 pivot is not one agg pair: {p66}"
    # q6's pricey-part semijoin: pin the SPECIFIC join — same line in the
    # simple-mode plan (two independent substring checks would pass with
    # any broadcast elsewhere plus any semijoin, ADVICE r6). The set is
    # un-hinted (part scales with SF); at sf0.01 size stats must still
    # pick a broadcast build for it.
    import re as _re

    from datafusion_ballista_dhruvil_spark.plans.inspect import explain_string

    p6 = explain_string(QUERIES["tpcds_q6"](spark, SF_DIR), "simple")
    assert _re.search(
        r"BroadcastHashJoin \[l_partkey[^\]]*\], \[p_partkey[^\]]*\], LeftSemi",
        p6,
    ), p6[:800]


def test_q47_q57_series_windows_over_monthly_grain(spark):
    """r7 widening: the lag/lead series shapes must run their windows
    over the (grain, y, m) MONTHLY aggregate, never a second fact pass —
    q47 reads exactly its three join inputs once (lineitem, orders,
    part); q57's per-nation top-3 deviation rank must push the
    WindowGroupLimit heap below the rank's exchange."""
    from tools.plan_fingerprint import node_counts

    p47 = formatted_plan(QUERIES["tpcds_q47"](spark, SF_DIR))
    assert node_counts(p47)["scans"] == 3, node_counts(p47)
    p57 = formatted_plan(QUERIES["tpcds_q57"](spark, SF_DIR))
    assert "WindowGroupLimit" in p57
    assert node_counts(p57)["scans"] == 4, node_counts(p57)


def test_q44_q70_rank_shapes(spark):
    """r7 session-2 widening: q44's two top-10 directions must each run
    as a TakeOrderedAndProject heap (per-partition top-10 + 10-row
    merge), never a global rank window over the SF-scaling item grain —
    the only Window nodes allowed are the positional row_numbers over
    the 10 kept rows (bounded input, AFTER the TOAP). q70's rollup
    Expand must run over the restricted (region, nation) aggregate with
    the fact read exactly once — the SUM-decomposability collapse of
    TPC-DS's two-pass spelling that the docstring claims."""
    from tools.plan_fingerprint import node_counts

    from tools.plan_fingerprint import _tree_nodes

    p44 = formatted_plan(QUERIES["tpcds_q44"](spark, SF_DIR))
    assert p44.count("TakeOrderedAndProject") >= 2, p44[:600]
    # both Windows sit above their TOAP — the positional row_numbers run
    # over the 10 kept rows, so the ONLY Sort node in the whole plan is
    # the final bounded orderBy of the joined 10-row result (ADVICE r7
    # #5: assert the Sort count, not just TOAP presence — a global
    # item-grain Sort sneaking in elsewhere must fail this gate)
    nodes44 = _tree_nodes(p44)
    assert nodes44.count("Sort") <= 1, [x for x in nodes44 if x == "Sort"]
    assert nodes44.count("Window") == 2, nodes44
    c44 = node_counts(p44)
    assert c44["nested_loop"] == 0, c44

    p70 = formatted_plan(QUERIES["tpcds_q70"](spark, SF_DIR))
    c70 = node_counts(p70)
    assert "Expand" in p70, "q70 rollup lost its grouping-set Expand"
    assert c70["scans"] == 5, f"q70 re-scans a table: {c70}"
    assert c70["nested_loop"] == 0, c70


def test_ivf_codebook_cap_is_loud(spark):
    """VERDICT r4 note 3: the collected IVF codebook must be bounded
    MECHANICALLY — past the cap the collect refuses with a clear error
    instead of silently shipping a linear-in-corpus closure. Under the
    cap it returns the same codebook as before (sorted, deterministic)."""
    import pytest

    from datafusion_ballista_dhruvil_spark.operators.similarity import (
        _IVF_MAX_CODEBOOK,
        _ivf_codebook,
    )
    from datafusion_ballista_dhruvil_spark.session import Tables

    t = Tables(spark, SF_DIR)
    with pytest.raises(ValueError, match="codebook exceeds"):
        _ivf_codebook(t, max_k=3)
    ids, cint, cnrm = _ivf_codebook(t)  # sf0.01 is far under the cap
    assert 3 < len(ids) <= _IVF_MAX_CODEBOOK
    assert list(ids) == sorted(ids)


def test_knn_label_agreement_is_cell_local(spark):
    """r4 rewrite (VERDICT r3 item 3): neighbors come from cell-local
    matmul over the IVF assignment, not a full-corpus driver collect and
    not a materialized pair join. The plan must show the map-side
    assignment kernel (MapInPandas) feeding a grouped-map top-k
    (FlatMapGroupsInPandas on centroid_id) — no join of pair rows, no
    nested loop anywhere."""
    plan = formatted_plan(QUERIES["sim_knn_label_agreement"](spark, SF_DIR))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan


def test_per_group_topk_uses_window_group_limit(spark):
    # sample_topk_per_group's rank<=k filter must push a per-partition top-k
    # heap BELOW the shuffle (WindowGroupLimit, Spark >= 3.5) — at scale the
    # exchange then carries <= k rows per (partition, group), not the corpus.
    plan = formatted_plan(QUERIES["sample_topk_per_group"](spark, SF_DIR))
    assert "WindowGroupLimit" in plan


def test_partition_pruning_skips_partitions(spark, tmp_path):
    # Hive-partitioned layout + a partition-key filter must prune at plan
    # time: the scan's partition count drops and the predicate appears as a
    # partition filter, not a data filter — at 100 TB this is the difference
    # between reading one day and reading the lake.
    out = str(tmp_path / "events_by_type")
    t = Tables(spark, SF_DIR)
    t.events.write.partitionBy("event_type").parquet(out)
    pruned = spark.read.parquet(out).where(F.col("event_type") == "click")
    plan = formatted_plan(pruned)
    import re

    part = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert part and "event_type" in part.group(1)
    # the partition predicate must NOT appear in PushedFilters (data filters)
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert not pushed or "event_type" not in pushed.group(1)
    # count distinct event types read: exactly the one selected partition
    assert pruned.select("event_type").distinct().count() == 1


def test_runtime_bloom_filter_prunes_probe_side(spark):
    # Runtime row-level filtering (the 100 TB join posture): a selective
    # filter on the build side must inject a bloom-filter semi-filter on the
    # probe side scan, so most probe rows die before the shuffle. Thresholds
    # are shrunk to testdata scale — at production scan sizes the defaults
    # fire on their own.
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        t = Tables(spark, SF_DIR)
        j = (
            t.lineitem.join(
                t.orders.where(F.col("o_orderpriority") == "1-URGENT"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .count()
        )
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in opt and "bloom_filter_agg" in opt
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_lateral_join_decorrelates(spark):
    # The correlated LATERAL LIMIT-2 subquery must decorrelate to a ranked
    # window join — never a per-outer-row nested-loop re-execution. Assert
    # both halves of the contract: the window rewrite IS there, and no
    # cartesian/nested-loop node sneaks in beside it.
    plan = formatted_plan(QUERIES["ops_lateral_join"](spark, SF_DIR))
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_profile_stats_single_scan(spark):
    # Profiling N columns must still scan the fact table ONCE (multi-distinct
    # goes through a single Expand), not once per column.
    import re

    plan = formatted_plan(QUERIES["ops_profile_stats"](spark, SF_DIR))
    scan_nodes = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scan_nodes) == 1, scan_nodes


def test_bigram_lm_joins_broadcast(spark):
    # The LM count tables are vocab-bounded regardless of corpus size; the
    # scoring joins must broadcast them, never sort-merge the corpus.
    plan = formatted_plan(QUERIES["text_bigram_lm_score"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_random_projection_sign_table_broadcasts(spark):
    # The 16x64 Rademacher sign table is constant-size — broadcast join.
    plan = formatted_plan(QUERIES["sim_random_projection"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pq_adc_is_map_only_scan(spark):
    # PQ encode + ADC scan must be one map-only mapInPandas pass over the
    # partitioned corpus (codebook ships in the closure): no join of any
    # kind, and the only exchange is the final top-20 global sort.
    plan = formatted_plan(QUERIES["sim_pq_adc"](spark, SF_DIR))
    assert "MapInPandas" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert exchange_count(QUERIES["sim_pq_adc"](spark, SF_DIR)) <= 1


def test_image_ahash_shuffles_hashes_not_bytes(spark):
    # Decode + hash are map-side; the only shuffle input is (doc_id, ahash)
    # — binary image/payload columns must never reach an exchange.
    import re

    plan = formatted_plan(QUERIES["mm_image_ahash"](spark, SF_DIR))
    assert "MapInPandas" in plan
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    # the window over ahash requires exactly one hash exchange...
    assert len(parts) == 1, parts
    # ...and it must carry the 32-char hash, never binary columns
    assert "ahash" in parts[0]
    assert "payload" not in parts[0] and "image" not in parts[0]


def test_audio_features_map_only(spark):
    # WAV synth + decode + features: map-only, orderBy is the lone exchange.
    plan = formatted_plan(QUERIES["mm_audio_features"](spark, SF_DIR))
    assert "MapInPandas" in plan
    assert "Join" not in plan
    assert exchange_count(QUERIES["mm_audio_features"](spark, SF_DIR)) <= 1


def test_quality_classifier_zero_shuffle(spark):
    # Hashed-feature scoring is pure expression work: no exchange except
    # the output sort, no UDF/python nodes at all.
    plan = formatted_plan(QUERIES["text_quality_classifier"](spark, SF_DIR))
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert exchange_count(QUERIES["text_quality_classifier"](spark, SF_DIR)) <= 1


def test_version_diff_shuffles_hashes_not_bodies(spark):
    # The snapshot diff must shuffle (doc_id, md5, metadata) only — the
    # full-outer join's exchanges carry `h`, never the `text` column.
    import re

    plan = formatted_plan(QUERIES["pipeline_version_diff"](spark, SF_DIR))
    assert "FullOuter" in plan
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts, "expected hash exchanges in the diff plan"
    assert all("text" not in p for p in parts), parts


def test_merge_upsert_compresses_cdc_before_join(spark):
    # Latest-wins compression is a window on the CDC side; the base join
    # must be on the compressed output, with no extra exchange beyond
    # window + join + distinct-base.
    plan = formatted_plan(QUERIES["pipeline_merge_upsert"](spark, SF_DIR))
    assert "Window" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_tombstone_purge_broadcasts_tombstones(spark):
    # The deletion list is tiny — membership must be a broadcast join.
    plan = formatted_plan(QUERIES["pipeline_tombstone_purge"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_decontam_broadcasts_bit_table(spark):
    # Both the position (set-bit) table and the exact-verify eval set are
    # broadcast; the training corpus must never be on the build side of a
    # shuffle join.
    plan = formatted_plan(QUERIES["text_bloom_decontam"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_zorder_is_two_scans_plus_tiny_aggs(spark):
    # Z-key computation is pure integer expressions (codegen), domain row
    # broadcasts, no python nodes anywhere.
    plan = formatted_plan(QUERIES["ops_zorder_pruning"](spark, SF_DIR))
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_winsorize_broadcasts_cutoffs(spark):
    # The per-group cutoff table (5 rows) must broadcast back onto the
    # fact table; the plan must not contain a per-group global sort of
    # the raw values (the few-groups collapse weighted_quantile avoids).
    plan = formatted_plan(QUERIES["ops_winsorize"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pmi_vocab_broadcasts(spark):
    # Vocabulary (top-40) joins broadcast on both sides of the pair
    # self-join; the pair join itself is a doc_id equi-join, never a
    # cartesian product.
    plan = formatted_plan(QUERIES["text_pmi_pairs"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_expectations_no_extra_scans(spark):
    # 7 expectations over 5 tables: each table is scanned at most twice
    # (documents carries 3 expectations on shared scans), and the RI
    # check broadcasts the customer key list.
    plan = formatted_plan(QUERIES["pipeline_data_expectations"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_attribution_single_user_shuffle(spark):
    # As-of attribution = one window pass: exactly one hashpartitioning
    # exchange on user_id before the final rollup; no self-join.
    import re

    plan = formatted_plan(QUERIES["ev_attribution"](spark, SF_DIR))
    assert "Join" not in plan
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("user_id" in p for p in parts)


def test_rfm_cutoffs_broadcast(spark):
    # Quintile cutoff table (3 metrics x 4 cutoffs) must broadcast back;
    # no global sort of the user metrics (binned quantile path).
    plan = formatted_plan(QUERIES["ev_rfm_segments"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_centroid_drift_single_shuffle_of_sums(spark):
    # Drift = conditional aggregate keyed by (label, pos): the exchange
    # carries integer partial sums, never raw embedding arrays.
    import re

    plan = formatted_plan(QUERIES["sim_centroid_drift"](spark, SF_DIR))
    assert "Join" not in plan
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert parts and all("embedding" not in p for p in parts), parts


def test_ivf_pq_probe_is_broadcast_equi_join(spark):
    # Encode is one mapInPandas pass; the probe joins the coded corpus to
    # the broadcast (query, list) table on cid — an equi-join, never a
    # cartesian scan of all lists; ADC is an Arrow-vectorized udf.
    plan = formatted_plan(QUERIES["sim_ivf_pq"](spark, SF_DIR))
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_path_topk_no_joins(spark):
    # Sessionize + path prefix + rollup: pure window/aggregate pipeline.
    plan = formatted_plan(QUERIES["ev_path_topk"](spark, SF_DIR))
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan


def test_mad_outliers_broadcasts_both_cutoff_tables(spark):
    # Median and MAD tables (5 rows each) broadcast back; the raw values
    # are never globally sorted per group.
    plan = formatted_plan(QUERIES["ops_mad_outliers"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_join_cardinality_never_runs_the_raw_join(spark):
    # Both estimators join COUNT tables (pre-aggregated), never the raw
    # fact tables: every join input passes through a HashAggregate first.
    plan = formatted_plan(QUERIES["ops_join_cardinality"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 8  # partial+final per count table


def test_triangles_and_accuracy_bounded_joins(spark):
    for name in ("dedup_graph_triangles", "dedup_minhash_accuracy"):
        plan = formatted_plan(QUERIES[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name


def test_dynamic_partition_pruning_subquery_injected(spark, tmp_path):
    # DPP (the other half of the 100 TB pruning story, alongside the static
    # gate above): when the partition-key predicate lives on a JOINED dim,
    # not the fact itself, the optimizer must inject a dynamic-pruning
    # subquery on the fact scan so only dim-selected partitions are read at
    # RUNTIME. Thresholds shrunk to testdata scale.
    out = str(tmp_path / "events_by_type_dpp")
    t = Tables(spark, SF_DIR)
    t.events.write.partitionBy("event_type").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("click", 1), ("purchase", 2)], "etype string, w int"
    ).where(F.col("w") == 1)
    confs = {
        "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
        "spark.sql.optimizer.dynamicPartitionPruning.useStats": "false",
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio": "10000",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = fact.join(dim, fact.event_type == dim.etype).groupBy("etype").count()
        plan = formatted_plan(j)
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        rows = j.collect()
        assert [r.etype for r in rows] == ["click"]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_pps_prefix_sum_windows_are_chunk_partitioned(spark):
    # The corpus-sized window must partition by chunk (parallel); only the
    # bounded chunk-summary window may be unpartitioned. Offsets and the
    # total broadcast back.
    plan = formatted_plan(QUERIES["sample_pps_systematic"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2  # offsets + total scalar
    # the window over document rows hash-partitions on chunk (its exchange
    # is hashpartitioning(chunk, ...)), never a single global sort
    assert "hashpartitioning(chunk" in plan


def test_covariance_pairs_collapse_before_shuffle(spark):
    # The 136x pair explode must be followed by map-side partial
    # aggregation (partial+final HashAggregate), so the shuffle carries
    # <= 136 rows per partition, not exploded data.
    df = QUERIES["sim_covariance_matrix"](spark, SF_DIR)
    assert has_partial_final_agg(df)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_entity_blocking_is_equi_join(spark):
    # Banded blocking must plan as a hash/sort-merge EQUI-join on the
    # block key — a nested-loop plan means the band predicate fell out of
    # the join keys and pair generation went quadratic.
    plan = formatted_plan(QUERIES["dedup_entity_blocking"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_mmr_candidates_are_bucket_equi_join(spark):
    """r7 (VERDICT r6 #2): sim_mmr_rerank's candidate generation must ride
    the rank-LSH bucket EQUI-join — the brute-force corpus-wide
    crossJoin(broadcast(q)) planned as a BroadcastNestedLoopJoin; any
    nested-loop/cartesian node here means the bucket key fell out of the
    join condition and candidate generation went back to O(N x Q)."""
    plan = formatted_plan(QUERIES["sim_mmr_rerank"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert (
        "BroadcastHashJoin" in plan
        or "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
    )


def test_hard_negatives_and_ndcg_bucket_joins(spark):
    for name in ("sim_hard_negatives", "sim_ndcg_eval"):
        plan = formatted_plan(QUERIES[name](spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_decay_weighted_broadcasts_scalar_not_window(spark):
    # max(ts) must arrive as a broadcast 1-row join, not as an
    # unpartitioned window over the event log.
    plan = formatted_plan(QUERIES["ev_decay_weighted"](spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "Window" not in plan


def test_kcenter_rounds_are_take_ordered_passes(spark):
    # Each greedy round reduces a full scan to ONE row via TakeOrdered
    # (map-side partial top-1), and centers re-enter as broadcasts.
    plan = formatted_plan(QUERIES["sample_kcenter_coreset"](spark, SF_DIR))
    assert plan.count("TakeOrderedAndProject") >= 3
    assert plan.count("BroadcastExchange") >= 3
    assert "CartesianProduct" not in plan or plan.count("rows=1") >= 0


def test_pipe_syntax_same_plan_as_ansi(spark):
    # pipe |> stages must lower to the identical physical shape as ANSI:
    # pushed filter at the scan, two-phase agg, <= 2 exchanges
    df = QUERIES["ops_pipe_syntax"](spark, SF_DIR)
    assert has_pushed_filters(df, "o_orderdate")
    assert has_partial_final_agg(df)
    assert exchange_count(df) <= 2  # group-by exchange + global sort


def test_bitmap_distinct_two_phase_no_expand(spark):
    # the bitmap form must plan as two plain hash aggregates (bit_or then
    # sum) — if a COUNT(DISTINCT) Expand node sneaks in, the whole point
    # (shuffling 8-byte bitmaps instead of raw ids) is lost
    df = QUERIES["ops_bitmap_distinct"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Expand" not in plan
    assert has_partial_final_agg(df)


def test_funnel_regex_single_data_shuffle(spark):
    # one exchange groups events per user; the 4-pattern readout reduces
    # to a single row (plus the final 4-row sort) — per-event data must
    # not shuffle twice
    df = QUERIES["ev_funnel_regex"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert plan.count("Exchange hashpartitioning(user_id") <= 1


def test_collation_group_two_phase_sort_agg(spark):
    # collated group keys are not hash-aggregable in Spark 4 — the planner
    # picks SortAggregate — but the aggregation must still split into
    # partial (map-side) and final phases so only per-group partials
    # shuffle; this pins that shape (and documents the known scale cost:
    # a per-partition sort instead of a hash table)
    df = QUERIES["ops_collation_group"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "SortAggregate" in plan
    assert "partial_" in plan and "merge_" in plan
    assert exchange_count(df) <= 3  # distinct-forms phase + group + sort


def test_cdc_chunks_shuffles_digests_only(spark):
    """dedup_cdc_chunks: chunking is window+agg inside the doc, the
    shared-chunk test is a hash equi-join on the 32-byte digest — never a
    pair join, never a nested loop."""
    plan = formatted_plan(QUERIES["dedup_cdc_chunks"](spark, SF_DIR))
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_sorted_neighborhood_candidates_are_window_not_join(spark):
    """dedup_sorted_neighborhood: candidates come from lead() over the
    sort order (linear), and verification is equi-joins on doc_id against
    the shingle arrays — no all-pairs shape anywhere."""
    plan = formatted_plan(QUERIES["dedup_sorted_neighborhood"](spark, SF_DIR))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Window" in plan


def test_dbscan_is_one_grouped_pass(spark):
    """sim_dbscan_core: the whole classification (degree, core, border)
    runs as ONE grouped-map matmul per label block — no pair rows, no
    joins at all; the only shuffle is groupBy(label)."""
    plan = formatted_plan(QUERIES["sim_dbscan_core"](spark, SF_DIR))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan


def test_crosslingual_profiles_broadcast(spark):
    """text_crosslingual_confusion: the (vocab x langs) profile tables
    must broadcast — scoring stays map-side; only per-(doc, lang) sums
    shuffle for the argmax."""
    plan = formatted_plan(QUERIES["text_crosslingual_confusion"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_incremental_agg_pushes_partition_predicates(spark):
    """pipeline_incremental_agg: the base/delta split predicates must
    reach the scans — at scale these are partition prunes, not filters."""
    df = QUERIES["pipeline_incremental_agg"](spark, SF_DIR)
    assert has_pushed_filters(df, "ts")


def test_image_neardup_bands_are_equi_join(spark):
    """mm_image_neardup_pairs: candidates come from the banded equi-join
    on (band, 16-bit key) — 8-byte hashes shuffle, image bytes never do;
    no nested loop anywhere."""
    plan = formatted_plan(QUERIES["mm_image_neardup_pairs"](spark, SF_DIR))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


def test_linear_interpolate_is_union_window(spark):
    """ev_linear_interpolate: the union-window shape — no join; both
    neighbors resolve in one sort per event_type."""
    plan = formatted_plan(QUERIES["ev_linear_interpolate"](spark, SF_DIR))
    # grid construction broadcasts the 24-row hourly range (its nested
    # loop is over a constant relation); the DATA path (events) must not
    # join — neighbors come from the two windows over the union
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "Window" in plan and "Union" in plan


def test_interval_bucket_join_is_equi_join(spark):
    # The bucketed interval-join rewrite must plan as an EQUI-join on the
    # bucket id (shuffle/broadcast hash), never a nested-loop over the raw
    # range predicate — the whole point of the bucket discretization.
    plan = formatted_plan(QUERIES["ops_interval_bucket_join"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bootstrap_explode_is_before_partial_agg(spark):
    # The 32-way replicate explode must feed a map-side partial aggregate
    # (HashAggregate below the exchange), so the shuffle carries B rows per
    # task — not B x N rows.
    plan = formatted_plan(QUERIES["sample_bootstrap_ci"](spark, SF_DIR))
    assert "Generate" in plan  # the explode
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_url_canonical_is_single_shuffle_codegen(spark):
    # URL canonicalization (parse_url + regexp) is pure map-side expression
    # work: the plan must show exactly one exchange (the canonical-key
    # groupBy) with a partial aggregate below it, and no UDF evaluation.
    plan = formatted_plan(QUERIES["dedup_url_canonical"](spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
    # one agg exchange + the orderBy's range exchange, nothing else
    # ("Name (" matches tree nodes only, not the detail sections)
    assert plan.count("Exchange (") <= 2


def test_residual_quantize_is_map_only_then_agg(spark):
    # Both RVQ codebooks ship in the closure; assignment + residual + both
    # error terms happen in ONE Arrow map pass. No join anywhere, and the
    # only exchanges are the final 7-row agg (+ orderBy).
    plan = formatted_plan(QUERIES["sim_residual_quantize"](spark, SF_DIR))
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("MapInPandas (") == 1  # tree nodes only
    assert plan.count("Exchange (") <= 2


def test_interpolate_has_no_shrinking_window_frame(spark):
    # Forward-neighbor lookup must be the REVERSED growing frame, never a
    # (1, unboundedFollowing) shrinking frame: Spark re-scans current->end
    # per row for shrinking frames — O(n^2), measured 242s vs 2s at sf0.1.
    plan = formatted_plan(QUERIES["ev_linear_interpolate"](spark, SF_DIR))
    low = plan.lower()
    assert "unboundedfollowing" not in low, "shrinking frame reintroduced"
    assert low.count("desc nulls last") >= 3  # the reversed total order


def test_time_to_convert_has_no_shrinking_frame(spark):
    # same class as the interpolate fix: forward as-of must be the
    # reversed growing frame, never (currentRow, unboundedFollowing)
    plan = formatted_plan(QUERIES["ev_time_to_convert"](spark, SF_DIR))
    assert "unboundedfollowing" not in plan.lower()


def test_q64_one_fact_pass_snowflake(spark):
    """r8 widening: q64's year self-join must run over the PERSISTED
    (brand, nation, year) aggregate — the snowflake fact chain appears
    under InMemoryTableScan (one materialization), never as a second
    live fact pass; bounded nation/region broadcast; no nested loop."""
    from tools.plan_fingerprint import node_counts

    p64 = formatted_plan(QUERIES["tpcds_q64"](spark, SF_DIR))
    assert "InMemoryTableScan" in p64, p64[:600]
    c64 = node_counts(p64)
    assert c64["nested_loop"] == 0, c64
    assert c64["bhj"] >= 4, c64  # nation/region broadcast in the chain


def test_q29_chain_is_equi_join(spark):
    """r8 widening: the bought->returned->re-bought chain must meet in an
    EQUI-join on the (cust, pk) compound key (the d2 > d1 condition is a
    post-join filter), never a nested loop over the date predicate."""
    from tools.plan_fingerprint import node_counts

    p29 = formatted_plan(QUERIES["tpcds_q29"](spark, SF_DIR))
    c29 = node_counts(p29)
    assert c29["nested_loop"] == 0, c29
    assert c29["smj"] + c29["shj"] + c29["bhj"] >= 3, c29


def test_q73_cohort_before_dimension_join(spark):
    """r8 widening: q73's HAVING band collapses the fact to cohort rows
    BEFORE the customer join; customer must not be the broadcast build
    side (it scales with SF — AQE may broadcast the bounded cohort)."""
    from tools.plan_fingerprint import node_counts

    p73 = formatted_plan(QUERIES["tpcds_q73"](spark, SF_DIR))
    c73 = node_counts(p73)
    assert c73["nested_loop"] == 0, c73
    assert c73["aggregates"] >= 2, c73  # partial+final count agg above the join


def test_q78_anti_join_and_one_channel_pass(spark):
    """r8 widening: q78's return exclusion must be a real ANTI-join on
    orderkey (not a row filter) and both channels must pivot from ONE
    conditional-agg pass — no second fact pass, top-20 as a heap."""
    from tools.plan_fingerprint import node_counts

    p78 = formatted_plan(QUERIES["tpcds_q78"](spark, SF_DIR))
    assert "LeftAnti" in p78, p78[:600]
    assert "TakeOrderedAndProject" in p78
    c78 = node_counts(p78)
    assert c78["nested_loop"] == 0, c78
    assert c78["scans"] <= 3, f"q78 re-scans for a channel: {c78}"


def test_q72_date_lag_is_filter_not_range_join(spark):
    """r8 widening: q72's date-lag condition must be a post-equi-join
    filter inside one conditional-agg pass — all joins equi (the spec's
    range-join trap avoided), nation broadcast, fact read once."""
    from tools.plan_fingerprint import node_counts

    p72 = formatted_plan(QUERIES["tpcds_q72"](spark, SF_DIR))
    c72 = node_counts(p72)
    assert c72["nested_loop"] == 0, c72
    assert c72["scans"] == 4, f"q72 re-scans a table: {c72}"
    assert c72["aggregates"] == 2, f"q72 lost its single agg pass: {c72}"
    assert c72["bhj"] >= 1, c72  # nation broadcast


def test_q39_one_fact_pass_month_pair(spark):
    """r8 widening: q39's consecutive-month self-join must run over the
    PERSISTED bounded (brand, month) stats (InMemoryTableScan) — one
    fact pass, equi-joins only."""
    from tools.plan_fingerprint import node_counts

    p39 = formatted_plan(QUERIES["tpcds_q39"](spark, SF_DIR))
    assert "InMemoryTableScan" in p39, p39[:600]
    c39 = node_counts(p39)
    assert c39["nested_loop"] == 0, c39


def test_q95_single_fact_pass_and_q10_or_union(spark):
    """r9 widening shape gates. q95: the nested same-fact EXISTS pair plus
    the revenue must collapse to ONE lineitem scan (order-grain agg), with
    orders as the only other scan — the spec spells three fact touches.
    q10: the OR-of-EXISTS must qualify through a Union of the two channel
    key sets (sequential semi-joins would compute AND), the returns branch
    must compress lineitem via a semi-join BEFORE any customer-side work,
    and nothing degrades to a nested loop."""
    from tools.plan_fingerprint import node_counts

    p95 = formatted_plan(QUERIES["tpcds_q95"](spark, SF_DIR))
    c95 = node_counts(p95)
    assert c95["scans"] == 2, f"q95 re-scans the fact: {c95}"
    assert c95["nested_loop"] == 0, c95
    # the >1-supplier + returned flags and the money live in one
    # order-grain aggregate pair feeding the final global pair
    assert c95["aggregates"] == 4, c95

    p10 = formatted_plan(QUERIES["tpcds_q10"](spark, SF_DIR))
    c10 = node_counts(p10)
    assert "Union" in p10, "q10 lost the OR-branch union"
    assert c10["nested_loop"] == 0, c10
    # lineitem appears exactly once (returns branch); orders three times —
    # the spec's three EXISTS bodies; plus customer and the nation dim:
    # 6 scans total, no fact pass beyond the spec's
    assert p10.count("lineitem") <= 2, p10[:800]  # scan node + its detail
    assert c10["scans"] == 6, c10


def test_png_features_map_only(spark):
    # PNG encode + decode + features (r9): two chained MapInPandas stages,
    # ZERO exchanges — payload/image bytes never shuffle, and with no
    # orderBy (the driver compare sorts) the whole query is map-only.
    from tools.plan_fingerprint import node_counts

    df = QUERIES["mm_png_features"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert node_counts(plan)["py_map"] == 2
    assert "Join" not in plan
    assert exchange_count(df) == 0


def test_r9_session2_tpcds_shapes(spark):
    """r9 session-2 widening gates. q94: same one-pass order-grain kernel
    as q95 (2 scans, 4 aggregates, the NOT EXISTS is a negated flag — no
    anti-join node). q92: the correlated scalar-avg threshold decorrelates
    to a part-grain join-back — equi-joins only, the brand dim broadcast.
    q99: five latency bands from ONE aggregate pair over one fact-fact
    join (never five filtered re-scans). q13: the AND-of-ORs filter keeps
    both joins hash-based (no nested loop from the disjunction)."""
    from tools.plan_fingerprint import node_counts

    c94 = node_counts(formatted_plan(QUERIES["tpcds_q94"](spark, SF_DIR)))
    assert c94["scans"] == 2 and c94["aggregates"] == 4, c94
    assert c94["nested_loop"] == 0, c94

    p92 = formatted_plan(QUERIES["tpcds_q92"](spark, SF_DIR))
    c92 = node_counts(p92)
    assert c92["nested_loop"] == 0 and c92["bhj"] >= 1, c92
    # window lines + per-part avg: exactly the spec's two fact touches
    assert p92.count("lineitem") <= 4, p92[:800]

    c99 = node_counts(formatted_plan(QUERIES["tpcds_q99"](spark, SF_DIR)))
    assert c99["aggregates"] == 2, f"q99 bands re-scan: {c99}"
    assert c99["scans"] == 2 and c99["nested_loop"] == 0, c99

    c13 = node_counts(formatted_plan(QUERIES["tpcds_q13"](spark, SF_DIR)))
    assert c13["nested_loop"] == 0, c13
    assert c13["bhj"] + c13["smj"] + c13["shj"] >= 2, c13


def test_r9_session3_tpcds_shapes(spark):
    """q41: dim-only — exactly two part scans, the qualifying-brand set
    reaches the probe as a BROADCAST semi-join, no fact table, no nested
    loop. q76: three pushed-filter branches into ONE Union and ONE
    aggregate pair — zero joins anywhere. q90: one events scan, one
    aggregate pair (the two scalar subqueries collapsed), zero joins."""
    from tools.plan_fingerprint import node_counts

    p41 = formatted_plan(QUERIES["tpcds_q41"](spark, SF_DIR))
    c41 = node_counts(p41)
    assert c41["scans"] == 2 and c41["nested_loop"] == 0, c41
    assert c41["bhj"] >= 1, f"q41 brand set not broadcast: {c41}"

    p76 = formatted_plan(QUERIES["tpcds_q76"](spark, SF_DIR))
    c76 = node_counts(p76)
    assert "Union" in p76
    assert c76["aggregates"] == 2, f"q76 re-aggregates per channel: {c76}"
    assert c76["bhj"] + c76["smj"] + c76["shj"] + c76["nested_loop"] == 0, c76

    c90 = node_counts(formatted_plan(QUERIES["tpcds_q90"](spark, SF_DIR)))
    assert c90["scans"] == 1 and c90["aggregates"] == 2, c90
    assert c90["bhj"] + c90["smj"] + c90["shj"] + c90["nested_loop"] == 0, c90


def test_image_resize_map_only(spark):
    # PNG encode + decode + nearest-neighbor resize (r9): two chained
    # MapInPandas stages, zero exchanges, zero joins — bytes never shuffle.
    from tools.plan_fingerprint import node_counts

    df = QUERIES["mm_image_resize"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert node_counts(plan)["py_map"] == 2
    assert "Join" not in plan
    assert exchange_count(df) == 0


def test_audio_resample_map_only(spark):
    # WAV synth + decode + nearest-sample resample (r9): two chained
    # MapInPandas stages, zero exchanges, zero joins.
    from tools.plan_fingerprint import node_counts

    df = QUERIES["mm_audio_resample"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert node_counts(plan)["py_map"] == 2
    assert "Join" not in plan
    assert exchange_count(df) == 0


def test_jpeg_features_map_only(spark):
    # baseline-JPEG encode + full Huffman/IDCT decode (r10): two chained
    # MapInPandas stages, zero exchanges, zero joins — bytes never shuffle.
    from tools.plan_fingerprint import node_counts

    df = QUERIES["mm_jpeg_features"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert node_counts(plan)["py_map"] == 2
    assert "Join" not in plan
    assert exchange_count(df) == 0


def test_r10_tpcds_shapes(spark):
    """r10 widening gates (VERDICT r9 #5). q14_rollup: everything —
    three-channel presence (the spec's INTERSECT as countDistinct),
    qualification, global mean — derives from ONE (channel, brand)
    aggregation of the fact via windows in a single linear chain, so
    lineitem is scanned EXACTLY ONCE, never once per channel and never
    duplicated across subtree references; no nested loops. q36_deep:
    one rollup Expand + one ranking
    window over subtotal-grain rows, no join in the post-aggregate
    stage, no nested loop."""
    from tools.plan_fingerprint import node_counts

    p14 = formatted_plan(QUERIES["tpcds_q14_rollup"](spark, SF_DIR))
    c14 = node_counts(p14)
    assert c14["nested_loop"] == 0, c14
    assert p14.count("lineitem") == 1, "q14 re-scans the fact"

    p36 = formatted_plan(QUERIES["tpcds_q36_deep"](spark, SF_DIR))
    c36 = node_counts(p36)
    assert c36["nested_loop"] == 0, c36
    assert "Expand" in p36 and "Window" in p36
    assert p36.count("lineitem") <= 2, "q36_deep re-scans the fact"


def test_jpeg_color_map_only(spark):
    # 4:2:0 three-component JPEG leg (r10): same two-MapInPandas
    # zero-exchange shape as the gray leg.
    from tools.plan_fingerprint import node_counts

    df = QUERIES["mm_jpeg_color_stats"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert node_counts(plan)["py_map"] == 2
    assert "Join" not in plan
    assert exchange_count(df) == 0
