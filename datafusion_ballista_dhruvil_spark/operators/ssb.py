"""Star Schema Benchmark (SSB) flight queries — SURVEY.md §5's "optional
stretch" row (the reference ships TPC-H + db-benchmark only; SSB is the
other canonical OLAP suite, O'Neil et al. 2009). SSB's denormalized
``lineorder`` star is expressed here through the standard academic
mapping onto the normalized TPC-H schema (lineorder = lineitem ⋈ orders;
the date dimension = functions of o_orderdate; supply cost uses
p_retailprice, the same substitution TPC-H q9 makes because the driver
testdata carries no partsupp).

Each flight keeps SSB's signature plan shape, which is what makes the
suite worth benchmarking separately from TPC-H:
  F1  fact-only scan with selective filters and ONE global aggregate
  F2  fact ⋈ two small dims, grouped by (year, brand)
  F3  fact ⋈ customer+supplier dims, revenue matrix by nation pair
  F4  the "profit" flight joining every dimension

All money math uses the exact-decimal contract (functions/compat.py);
dimension joins broadcast (nation/region/part/supplier are dims by
construction); dates are adapted to the driver corpus range (1995-2001).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_ballista_dhruvil_spark.functions.compat import (
    SQL_DISC_PRICE,
    dec2,
    dec4,
    disc_price_expr,
    dsum,
    sql_dsum,
)
from datafusion_ballista_dhruvil_spark.operators.registry import query
from datafusion_ballista_dhruvil_spark.session import Tables


def _date(s: str):
    return F.lit(s).cast("date")


# --------------------------------------------------------------------------
# Flight 1: how much revenue lift would a discount-band change produce —
# fact-table-only scan, every filter pushed to the parquet scan, one
# global two-phase aggregate. (SSB Q1.1; year filter lives on orders in
# the normalized schema, so the one dim join broadcasts.)
# --------------------------------------------------------------------------
@query(
    "ssb_q1_1",
    oracle="""
SELECT CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_discount AS DECIMAL(7,4))), 4) AS DOUBLE) AS revenue
FROM lineitem, orders
WHERE l_orderkey = o_orderkey
  AND CAST(extract(year FROM o_orderdate) AS INT) = 1996
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 25
""",
)
def ssb_q1_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    orders_1996 = t.orders.where(
        (F.col("o_orderdate") >= _date("1996-01-01"))
        & (F.col("o_orderdate") < _date("1997-01-01"))
    ).select("o_orderkey")
    return (
        t.lineitem.where(
            F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 25)
        )
        .join(orders_1996, F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(dsum(dec2("l_extendedprice") * dec4("l_discount")).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Flight 2: revenue trend per brand within a part segment, for suppliers
# of one region — fact ⋈ part ⋈ supplier ⋈ nation ⋈ region ⋈ orders,
# grouped by (order year, brand). All dims broadcast.
# --------------------------------------------------------------------------
@query(
    "ssb_q2_1",
    oracle=f"""
SELECT CAST(extract(year FROM o_orderdate) AS INT) AS d_year, p_brand,
       {sql_dsum(SQL_DISC_PRICE)} AS revenue
FROM lineitem, orders, part, supplier, nation, region
WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
  AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND p_size BETWEEN 1 AND 15 AND r_name = 'ASIA'
GROUP BY d_year, p_brand
ORDER BY d_year, p_brand
""",
)
def ssb_q2_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    part = F.broadcast(
        t.part.where(F.col("p_size").between(1, 15)).select(
            "p_partkey", "p_brand"
        )
    )
    supp_region = F.broadcast(
        t.supplier.join(
            t.nation, F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            t.region.where(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    return (
        t.lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp_region, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.year("o_orderdate").alias("d_year"), F.col("p_brand")
        )
        .agg(dsum(disc_price_expr()).alias("revenue"))
        .orderBy("d_year", "p_brand")
    )


# --------------------------------------------------------------------------
# Flight 3: the revenue matrix between customer and supplier nations of
# one region over a year band — the shape TPC-H q7 shares; both nation
# dims broadcast, the fact shuffles once for the group-by.
# --------------------------------------------------------------------------
@query(
    "ssb_q3_1",
    oracle=f"""
SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
       CAST(extract(year FROM o_orderdate) AS INT) AS d_year,
       {sql_dsum(SQL_DISC_PRICE)} AS revenue
FROM lineitem, orders, customer, supplier,
     nation cn, nation sn, region cr, region sr
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = cn.n_nationkey AND cn.n_regionkey = cr.r_regionkey
  AND s_nationkey = sn.n_nationkey AND sn.n_regionkey = sr.r_regionkey
  AND cr.r_name = 'ASIA' AND sr.r_name = 'ASIA'
  AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1998-01-01'
GROUP BY c_nation, s_nation, d_year
ORDER BY d_year ASC, revenue DESC, c_nation, s_nation
""",
)
def ssb_q3_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    asia_nations = (
        t.nation.join(
            t.region.where(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    cust = F.broadcast(
        t.customer.join(
            asia_nations, F.col("c_nationkey") == F.col("n_nationkey")
        ).select("c_custkey", F.col("n_name").alias("c_nation"))
    )
    supp = F.broadcast(
        t.supplier.join(
            asia_nations, F.col("s_nationkey") == F.col("n_nationkey")
        ).select("s_suppkey", F.col("n_name").alias("s_nation"))
    )
    return (
        t.lineitem.join(
            t.orders.where(
                (F.col("o_orderdate") >= _date("1995-01-01"))
                & (F.col("o_orderdate") < _date("1998-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            "c_nation", "s_nation", F.year("o_orderdate").alias("d_year")
        )
        .agg(dsum(disc_price_expr()).alias("revenue"))
        .orderBy(
            F.asc("d_year"), F.desc("revenue"), "c_nation", "s_nation"
        )
    )


# --------------------------------------------------------------------------
# Flight 4: profit by (year, customer nation) joining EVERY dimension —
# SSB's widest flight. Profit uses the q9 substitution (p_retailprice
# for the absent partsupp supply cost).
# --------------------------------------------------------------------------
@query(
    "ssb_q4_1",
    oracle=f"""
SELECT CAST(extract(year FROM o_orderdate) AS INT) AS d_year,
       cn.n_name AS c_nation,
       {sql_dsum(
           SQL_DISC_PRICE
           + " - CAST(p_retailprice AS DECIMAL(12,2))"
             " * CAST(l_quantity AS DECIMAL(12,2))"
       )} AS profit
FROM lineitem, orders, customer, supplier, part,
     nation cn, nation sn, region cr, region sr
WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey AND l_partkey = p_partkey
  AND c_nationkey = cn.n_nationkey AND cn.n_regionkey = cr.r_regionkey
  AND s_nationkey = sn.n_nationkey AND sn.n_regionkey = sr.r_regionkey
  AND cr.r_name = 'AMERICA' AND sr.r_name = 'AMERICA'
  AND p_size < 25
GROUP BY d_year, c_nation
ORDER BY d_year, c_nation
""",
)
def ssb_q4_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    america = (
        t.nation.join(
            t.region.where(F.col("r_name") == "AMERICA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    cust = F.broadcast(
        t.customer.join(
            america, F.col("c_nationkey") == F.col("n_nationkey")
        ).select("c_custkey", F.col("n_name").alias("c_nation"))
    )
    supp = F.broadcast(
        t.supplier.join(
            america, F.col("s_nationkey") == F.col("n_nationkey")
        ).select("s_suppkey")
    )
    part = F.broadcast(
        t.part.where(F.col("p_size") < 25).select(
            "p_partkey", "p_retailprice"
        )
    )
    return (
        t.lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.year("o_orderdate").alias("d_year"), F.col("c_nation")
        )
        .agg(
            dsum(
                disc_price_expr()
                - dec2("p_retailprice") * dec2("l_quantity")
            ).alias("profit")
        )
        .orderBy("d_year", "c_nation")
    )
