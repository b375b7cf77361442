"""LLM-pipeline extension operators (dedup / similarity / text / multimodal /
events) vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from datafusion_ballista_dhruvil_spark.operators import load_all
from datafusion_ballista_dhruvil_spark.operators.registry import ORACLES, QUERIES

from tests.conftest import SF_DIR, assert_query_matches

load_all()

PREFIXES = ("dedup_", "sim_", "text_", "mm_", "ev_")
PIPELINE = sorted(n for n in QUERIES if n.startswith(PREFIXES))

# queries whose result can legitimately be empty at small SF (near-dup
# detectors over random text may find nothing)
MAY_BE_EMPTY = {"dedup_ngram_jaccard", "dedup_minhash_lsh", "sim_embedding_neardup"}


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
