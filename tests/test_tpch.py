"""All 22 TPC-H-derived queries vs the DuckDB oracle (SURVEY.md §5).

Stronger than the reference's own harness, which row-verifies only q4/q12/q13
and skips q16 (reference benchmarks/run.sh). Runs at sf0.01 — the same scale
the driver's t2 correctness gate uses.
"""

from __future__ import annotations

import pytest

from datafusion_ballista_dhruvil_spark.operators import load_all
from datafusion_ballista_dhruvil_spark.operators.registry import ORACLES, QUERIES
from datafusion_ballista_dhruvil_spark.operators.tpch import ALL_TPCH

from tests.conftest import assert_query_matches

load_all()


@pytest.mark.parametrize("name", ALL_TPCH)
def test_tpch_matches_oracle(spark, oracle, name):
    # every query must also do real work (non-empty) at the gate SF
    assert_query_matches(spark, oracle, QUERIES[name], ORACLES[name], min_rows=1)
