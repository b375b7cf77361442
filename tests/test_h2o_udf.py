"""h2o db-benchmark groupby shapes + UDF surface vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from datafusion_ballista_dhruvil_spark.operators import load_all
from datafusion_ballista_dhruvil_spark.operators.registry import ORACLES, QUERIES

from tests.conftest import SF_DIR, assert_query_matches

load_all()

NAMES = sorted(n for n in QUERIES if n.startswith(("h2o_", "udf_", "nyctaxi")))


@pytest.mark.parametrize("name", NAMES)
def test_matches_oracle(spark, oracle, name):
    if name not in ORACLES:
        df = QUERIES[name](spark, SF_DIR)
        assert len(df.collect()) > 0
        return
    assert_query_matches(spark, oracle, QUERIES[name], ORACLES[name], min_rows=1)


def test_registered_udf_callable_from_sql(spark):
    from datafusion_ballista_dhruvil_spark.functions.udf import register_udfs

    register_udfs(spark)
    row = spark.sql("SELECT signal_score(2.0) AS s").collect()[0]
    assert row.s == 0.3 * 2.0 + 0.1 * 4.0 - 2.0
