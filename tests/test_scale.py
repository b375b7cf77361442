"""Scale-technique tests: salted joins produce identical results to plain
joins; bucketed tables join without exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_ballista_dhruvil_spark.operators.scale import (
    cohort_join_bucketed,
    salted_join,
    write_bucketed,
)
from datafusion_ballista_dhruvil_spark.plans.inspect import exchange_count, formatted_plan
from datafusion_ballista_dhruvil_spark.session import Tables

from tests.conftest import SF_DIR


def test_salted_join_equals_plain_join(spark):
    t = Tables(spark, SF_DIR)
    fact = t.lineitem.select("l_orderkey", "l_suppkey", "l_quantity")
    dim = t.supplier.select("s_suppkey", "s_name")
    plain = (
        fact.join(dim, fact.l_suppkey == dim.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(fact, dim, "l_suppkey", "s_suppkey", salt=8)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b and len(a) > 0


def test_bucketed_join_has_no_shuffle(spark):
    t = Tables(spark, SF_DIR)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed(
        t.orders.select("o_orderkey", "o_totalprice"), "b_orders", ["o_orderkey"], 8
    )
    write_bucketed(
        t.lineitem.select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity"),
        "b_lineitem",
        ["o_orderkey"],
        8,
    )
    joined = cohort_join_bucketed(spark, "b_orders", "b_lineitem", ["o_orderkey"])
    # co-located join: zero shuffle exchanges in the join plan
    assert exchange_count(joined) == 0, formatted_plan(joined)[:500]
    assert joined.count() > 0
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_lineitem")


def test_results_partition_invariant(spark):
    """Determinism under re-partitioning: the engine's hash-based operators
    (splits, packing, dedup signatures) must produce IDENTICAL results when
    the shuffle partition count changes — the property that makes results
    reproducible across cluster sizes (4 partitions here stands in for a
    different executor count than 8/32)."""
    from datafusion_ballista_dhruvil_spark.operators import load_all
    from datafusion_ballista_dhruvil_spark.operators.registry import QUERIES

    load_all()
    names = [
        "split_hash_assign",
        "pack_token_bins",
        "dedup_exact",
        "ops_table_checksum",
        "text_bigram_lm_score",
        "text_chunk_crossdup",
    ]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for n in ("4", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for name in names:
                rows = sorted(map(tuple, QUERIES[name](spark, SF_DIR).collect()))
                assert rows, f"{name} empty at {n} partitions"
                results.setdefault(name, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    for name, (a, b) in results.items():
        assert a == b, f"{name} differs across partition counts"
