"""Temporal joins: as-of semantics on hand-built cases + oracle parity."""

from __future__ import annotations

from datetime import datetime

from datafusion_ballista_dhruvil_spark.operators.registry import ORACLES
from datafusion_ballista_dhruvil_spark.operators.temporal import (
    asof_click_attribution,
    asof_join,
    range_recent_clicks,
)
from tests.conftest import assert_query_matches


def _ts(s: int):
    return datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(30)), (2, 10, _ts(5)), (3, 20, _ts(30)), (4, 30, _ts(30))],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        # k=10: matches at 10 and 30 (tie at 30 between rid 102/103);
        # k=20: only a LATER row (no match); k=30: no rows at all
        [
            (101, 10, _ts(10), 1.0),
            (102, 10, _ts(30), 2.0),
            (103, 10, _ts(30), 3.0),
            (201, 20, _ts(40), 9.0),
        ],
        "rid long, k long, ts timestamp, v double",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = {
        r.lid: r
        for r in asof_join(
            left, right, on="k", ts="ts", payload=["rid", "v"], tie="rid"
        ).collect()
    }
    assert out[1].asof_rid == 103 and out[1].asof_v == 3.0  # inclusive <=, max tie
    assert out[2].asof_rid is None  # right rows all later
    assert out[3].asof_rid is None  # k=20 right row is at ts=40 > 30
    assert out[4].asof_rid is None  # key absent from right
    assert set(out[1].asDict()) == {"lid", "k", "ts", "asof_rid", "asof_v"}


def test_asof_join_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r.lid: r
        for r in asof_join(
            left,
            right,
            on="k",
            ts="ts",
            payload=["rid"],
            tie="rid",
            tolerance_us=5_000_000,  # 5 s lookback
        ).collect()
    }
    assert out[1].asof_rid == 103  # exact-ts match survives any tolerance
    # lid=2 at ts=5: nearest earlier right row would be none anyway; shrink
    # the check to the real tolerance case — a match 20 s stale is dropped
    out2 = {
        r.lid: r
        for r in asof_join(
            left.where("lid = 1"),
            right.where("rid = 101"),  # only the ts=10 row, 20 s before lid 1
            on="k",
            ts="ts",
            payload=["rid"],
            tie="rid",
            tolerance_us=5_000_000,
        ).collect()
    }
    assert out2[1].asof_rid is None


def test_asof_click_attribution_oracle(spark, oracle):
    assert_query_matches(
        spark,
        oracle,
        asof_click_attribution,
        ORACLES["asof_click_attribution"],
        min_rows=10,
    )


def test_range_recent_clicks_oracle(spark, oracle):
    assert_query_matches(
        spark, oracle, range_recent_clicks, ORACLES["range_recent_clicks"], min_rows=10
    )
