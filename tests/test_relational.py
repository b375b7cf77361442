"""Operator-checklist queries vs the DuckDB oracle."""

from __future__ import annotations

import pytest

from datafusion_ballista_dhruvil_spark.operators import load_all
from datafusion_ballista_dhruvil_spark.operators.registry import ORACLES, QUERIES

from tests.conftest import assert_query_matches

load_all()

OPS = sorted(n for n in QUERIES if n.startswith("ops_"))


@pytest.mark.parametrize("name", OPS)
def test_ops_matches_oracle(spark, oracle, name):
    if name not in ORACLES:
        # rows-only operators: still must run and return rows
        df = QUERIES[name](spark, "/root/testdata/sf0.01")
        assert len(df.collect()) > 0
        return
    assert_query_matches(spark, oracle, QUERIES[name], ORACLES[name], min_rows=1)


def test_weighted_quantile_helper(spark):
    from datafusion_ballista_dhruvil_spark.operators.relational import weighted_quantile

    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 3, 10), ("h", 5, 1)],
        "grp string, v int, w int",
    )
    out = {
        r.grp: r
        for r in weighted_quantile(
            df, "v", "w", ["grp"], {"wp50": (1, 2), "wp90": (9, 10)}
        ).collect()
    }
    # g: total weight 12; cum 1,2,12 -> first v with 2*cw>=12 is 3
    assert out["g"].wp50 == 3 and out["g"].wp90 == 3
    # single-row group: every quantile is that row
    assert out["h"].wp50 == 5 and out["h"].wp90 == 5
