"""LLM-pipeline extension operators (dedup / similarity / text / multimodal /
events) vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from datafusion_ballista_dhruvil_spark.operators import load_all
from datafusion_ballista_dhruvil_spark.operators.registry import ORACLES, QUERIES

from tests.conftest import SF_DIR, assert_query_matches

load_all()

PREFIXES = ("dedup_", "sim_", "text_", "mm_", "ev_", "split_", "sample_", "pack_")
PIPELINE = sorted(n for n in QUERIES if n.startswith(PREFIXES))

# queries whose result can legitimately be empty at small SF (near-dup
# detectors over random text may find nothing)
MAY_BE_EMPTY = {
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_cluster_cc",
    "sim_embedding_neardup",
}


@pytest.mark.parametrize("name", PIPELINE)
def test_pipeline_matches_oracle(spark, oracle, name):
    if name not in ORACLES:
        df = QUERIES[name](spark, SF_DIR)
        assert len(df.collect()) > 0
        return
    min_rows = 0 if name in MAY_BE_EMPTY else 1
    assert_query_matches(spark, oracle, QUERIES[name], ORACLES[name], min_rows=min_rows)


def test_decode_stub_features_deterministic(spark):
    """mapInPandas stub decoder: Arrow plumbing yields stable, repeatable rows."""
    df1 = QUERIES["mm_decode_features"](spark, SF_DIR).collect()
    df2 = QUERIES["mm_decode_features"](spark, SF_DIR).collect()
    assert sorted(map(tuple, df1)) == sorted(map(tuple, df2))
    assert all(r.decode_ok for r in df1)
    assert len(df1) == 200


def test_cluster_cc_is_transitive_closure(spark):
    """Every verified near-dup pair lands in one cluster; cluster_id is the
    member minimum (the canonical keep-doc)."""
    from datafusion_ballista_dhruvil_spark.operators.dedup import _verified_pairs

    members = QUERIES["dedup_cluster_cc"](spark, SF_DIR).collect()
    label = {r.doc_id: r.cluster_id for r in members}
    assert label, "sf0.01 corpus is expected to contain near-dup pairs"
    for p in _verified_pairs(spark, SF_DIR).collect():
        assert label[p.d1] == label[p.d2], (p.d1, p.d2)
    by_cluster: dict[int, list[int]] = {}
    for doc, c in label.items():
        by_cluster.setdefault(c, []).append(doc)
    for c, docs in by_cluster.items():
        assert c == min(docs)
        assert len(docs) >= 2  # singletons never enter the edge list
    sizes = {r.doc_id: r.n_docs for r in members}
    for doc, c in label.items():
        assert sizes[doc] == len(by_cluster[c])


def test_hash_split_is_partition_invariant(spark):
    """The split assignment must not depend on physical layout: recomputing
    after a repartition yields identical per-split counts."""
    from datafusion_ballista_dhruvil_spark.operators.sampling import _hash_bucket
    from datafusion_ballista_dhruvil_spark.session import Tables

    import pyspark.sql.functions as F

    docs = Tables(spark, SF_DIR).documents
    a = (
        docs.select((_hash_bucket(F.col("doc_id"), 100) < 10).alias("s"))
        .groupBy("s").count().collect()
    )
    b = (
        docs.repartition(13)
        .select((_hash_bucket(F.col("doc_id"), 100) < 10).alias("s"))
        .groupBy("s").count().collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_recursive_cte_gapfill_equivalence(spark):
    """Spark 4 WITH RECURSIVE end-to-end: the recursive-CTE formulation of
    the calendar axis returns exactly what the sequence()-based registered
    query returns (the query avoids recursion only for per-iteration job
    overhead — see ev_gapfill_series docstring)."""
    from datafusion_ballista_dhruvil_spark.session import Tables
    from datafusion_ballista_dhruvil_spark.streaming.events import (
        GAPFILL_RECURSIVE_SQL,
    )

    Tables(spark, SF_DIR).events.createOrReplaceTempView("gapfill_events_v")
    rec = spark.sql(GAPFILL_RECURSIVE_SQL).collect()
    seq = QUERIES["ev_gapfill_series"](spark, SF_DIR).collect()
    assert sorted(map(tuple, rec)) == sorted(map(tuple, seq))
    assert len(rec) == 30  # contiguous day axis


def test_pack_token_bins_invariants(spark):
    """Sequence packing: every doc lands in exactly one pack, pack ids are
    contiguous from 0 within each shard, and the assignment is invariant to
    input partitioning (hash-sharded, not partition-ordered)."""
    from datafusion_ballista_dhruvil_spark.session import Tables

    packs = QUERIES["pack_token_bins"](spark, SF_DIR).collect()
    n_docs = Tables(spark, SF_DIR).documents.count()
    assert sum(r.n_docs for r in packs) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in packs:
        by_shard.setdefault(r.shard, []).append(r.pack_id)
    for ids in by_shard.values():
        assert sorted(ids) == list(range(len(ids)))
    again = QUERIES["pack_token_bins"](spark, SF_DIR).collect()
    assert sorted(map(tuple, packs)) == sorted(map(tuple, again))
