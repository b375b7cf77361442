"""Function-name + numeric-determinism compatibility layer.

Two jobs:

1. **Deterministic money math.** The testdata stores monetary columns as
   doubles. Summing doubles is order-dependent, so a Spark aggregate and a
   DuckDB oracle would drift in the last ulps and fail a value-hash compare.
   Fix: cast operands to exact DECIMAL types, do all arithmetic and the SUM in
   decimal (exact, order-independent), and cast the final aggregate back to
   DOUBLE. Both engines then produce bit-identical doubles. Precisions are
   sized so products never exceed DECIMAL(38): price DECIMAL(12,2) x
   rate DECIMAL(8,4) x rate DECIMAL(8,4) -> scale 10, precision <= 30.

   This mirrors the reference's semantics, which runs TPC-H on
   Decimal128(15,2) columns (benchmarks/src/bin/tpch.rs:861-957) — decimal
   aggregation there is exact too.

2. **DataFusion function-name shims** for the SQL surface
   (reference enum ScalarFunction, ballista/core/proto/datafusion.proto:448-521
   and AggregateFunction :529-549): names DataFusion has but Spark spells
   differently are registered as session SQL functions so the reference's
   queries run verbatim through ``spark.sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# --- deterministic decimal money math ---------------------------------------

MONEY = "decimal(12,2)"  # prices/quantities/balances (|x| < 1e10)
RATE = "decimal(7,4)"  # discounts/taxes in [0, 1]


def dec2(col: Column | str) -> Column:
    """Monetary operand as exact DECIMAL(12,2)."""
    return F.col(col).cast(MONEY) if isinstance(col, str) else col.cast(MONEY)


def dec4(col: Column | str) -> Column:
    """Rate operand as exact DECIMAL(7,4)."""
    return F.col(col).cast(RATE) if isinstance(col, str) else col.cast(RATE)


def dsum(col: Column) -> Column:
    """Exact decimal SUM, surfaced as DOUBLE (order-independent result).

    The sum is first reduced to scale 4 — both Spark and DuckDB round
    decimals half-away-from-zero, and at scale 4 the scaled integer stays
    under 2^53 for any realistic aggregate, so the final decimal->double
    conversion is a single exact rounding in both engines. (Casting a
    scale-10 sum directly diverges: DuckDB double-rounds via int128/1e10.)
    """
    return F.sum(col).cast("decimal(38,4)").cast("double")


def avg_money(col: Column) -> Column:
    """Deterministic AVG: exact decimal sum cast to double, / count."""
    return F.sum(col).cast("decimal(38,4)").cast("double") / F.count(F.lit(1))


def disc_price_expr(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """l_extendedprice * (1 - l_discount), exact decimal."""
    return dec2(price) * (F.lit(1) - dec4(discount)).cast("decimal(8,4)")


def charge_expr(
    price: str = "l_extendedprice", discount: str = "l_discount", tax: str = "l_tax"
) -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact decimal."""
    return disc_price_expr(price, discount) * (F.lit(1) + dec4(tax)).cast("decimal(8,4)")


# DuckDB-side spellings of the same expressions, used by oracle SQL strings so
# both engines compute the identical exact decimal before the final
# CAST(... AS DOUBLE).
SQL_DEC2 = "CAST({c} AS DECIMAL(12,2))"
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1 - CAST(l_discount AS DECIMAL(7,4)) AS DECIMAL(8,4))"
)
SQL_CHARGE = SQL_DISC_PRICE + " * CAST(1 + CAST(l_tax AS DECIMAL(7,4)) AS DECIMAL(8,4))"


# DuckDB's decimal->decimal cast TRUNCATES on scale-down, but its round()
# rounds half-away-from-zero, matching Spark's HALF_UP cast — so the oracle
# spells the scale-4 reduction as round(sum, 4).
def sql_dsum(expr: str) -> str:
    return f"CAST(round(SUM({expr}), 4) AS DOUBLE)"


def sql_avg(expr: str) -> str:
    return f"CAST(round(SUM({expr}), 4) AS DOUBLE) / COUNT(*)"


# --- DataFusion SQL function-name shims --------------------------------------

#: DataFusion name -> (typed arg list, return type, Spark SQL body).
#: Only names whose Spark spelling differs; everything else matches already
#: (abs, ceil, floor, concat, lower, trim, md5, coalesce, split_part, btrim,
#: starts_with, left, right, translate, repeat, initcap ... are identical in
#: Spark >= 3.5). Aggregate-name deltas (approx_distinct, array_agg) are
#: handled in the SQL rewrite layer because SQL UDFs cannot wrap aggregates.
_SQL_ALIASES: dict[str, tuple[str, str, str]] = {
    # proto value cites: datafusion.proto:448-521
    # character_length/btrim/split_part/startswith/left/right/translate/
    # octet_length/position are native in Spark >= 3.5 — no shim needed.
    "strpos": ("s STRING, sub STRING", "INT", "locate(sub, s)"),
    "to_hex": ("x BIGINT", "STRING", "lower(hex(x))"),
    "digest_sha256": ("s STRING", "STRING", "sha2(s, 256)"),
    "trunc_number": (
        "x DOUBLE",
        "DOUBLE",
        "CASE WHEN x >= 0 THEN floor(x) ELSE ceil(x) END",
    ),
}

#: Whole-word SQL text rewrites for constructs Spark spells differently and a
#: SQL UDF cannot express (aggregates). Used by sql/rewrite-style callers.
SQL_NAME_REWRITES: dict[str, str] = {
    "approx_distinct": "approx_count_distinct",
    "approx_percentile_cont": "percentile_approx",
}


def register_compat_functions(spark: SparkSession) -> None:
    """Register DataFusion-spelled SQL names in the session catalog.

    Spark cannot alias builtin SQL functions directly, so each shim is a
    SQL-bodied temporary function (JVM-side, inlined by Catalyst — stays
    inside whole-stage codegen, no Python round-trip).
    """
    for name, (args, ret, body) in _SQL_ALIASES.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) "
            f"RETURNS {ret} RETURN {body}"
        )
