"""Catch-all oracle coverage: every registered query must be exercised by
pytest, not only by the driver/contract tools.

The family tests (test_relational / test_pipeline_ops / test_h2o_udf /
test_tpch / test_temporal) parametrize over name prefixes; queries whose
names fall outside every family — the connector round-trips, the snapshot
time-travel query, hybrid retrieval, the mixture resampler, YoY growth,
and anything added later under a new prefix — land here automatically, so
a new query can never silently skip the pytest oracle gate.
"""

from __future__ import annotations

import re

import pytest

from datafusion_ballista_dhruvil_spark.operators import load_all
from datafusion_ballista_dhruvil_spark.operators.registry import ORACLES, QUERIES

from tests.conftest import SF_DIR, assert_query_matches

load_all()

#: prefixes parametrized by the dedicated family test modules
_FAMILY_PREFIXES = (
    "ops_", "dedup_", "sim_", "text_", "mm_", "ev_", "split_", "sample_",
    "pack_", "pipeline_", "h2o_", "udf_", "nyctaxi",
)
#: individually tested in test_temporal.py
_TESTED_ELSEWHERE = {"asof_click_attribution", "range_recent_clicks"}

REMAINDER = sorted(
    n
    for n in QUERIES
    if not n.startswith(_FAMILY_PREFIXES)
    and not re.fullmatch(r"q\d+", n)
    and n not in _TESTED_ELSEWHERE
)


def test_every_query_has_a_pytest_home():
    # if a family module drops a prefix, its queries reappear in REMAINDER
    # and get tested below — this is just a sanity floor
    assert len(REMAINDER) >= 10


@pytest.mark.parametrize("name", REMAINDER)
def test_remainder_matches_oracle(spark, oracle, name):
    if name not in ORACLES:
        df = QUERIES[name](spark, SF_DIR)
        assert len(df.collect()) > 0
        return
    assert_query_matches(spark, oracle, QUERIES[name], ORACLES[name], min_rows=1)
