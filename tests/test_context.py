"""Context/API parity tests — mirrors the reference's client e2e tests
(ballista/client/src/context.rs:512-1043 and python/pyballista/tests/
test_context.py:21-78): SELECT 1, SHOW TABLES/COLUMNS, UNION vs UNION ALL
dedup, aggregate SQL, read/register/write roundtrips, DDL translation."""

from __future__ import annotations

import os
import tempfile

import pytest

from datafusion_ballista_dhruvil_spark.context import BallistaSparkContext
from datafusion_ballista_dhruvil_spark.sql.rewrite import rewrite_sql

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def ctx(spark):
    c = BallistaSparkContext(spark)
    c.register_parquet("ctx_lineitem", f"{SF_DIR}/lineitem.parquet")
    return c


def test_select_one(ctx):
    # reference: EmptyRelation one-row test (context.rs:765-780)
    assert ctx.sql("SELECT 1 AS one").collect()[0].one == 1


def test_show_tables_and_columns(ctx):
    # reference: SHOW TABLES / SHOW COLUMNS with info schema (context.rs:585-668)
    tables = [r.tableName for r in ctx.sql("SHOW TABLES").collect()]
    assert "ctx_lineitem" in tables
    cols = [r.col_name for r in ctx.sql("SHOW COLUMNS IN ctx_lineitem").collect()]
    assert "l_orderkey" in cols
    assert "ctx_lineitem" in ctx.tables()


def test_union_vs_union_all(ctx):
    # reference: dedup semantics test (context.rs:782-830)
    n_all = ctx.sql(
        "SELECT 1 AS x UNION ALL SELECT 1 AS x"
    ).count()
    n_dedup = ctx.sql("SELECT 1 AS x UNION SELECT 1 AS x").count()
    assert (n_all, n_dedup) == (2, 1)


def test_aggregate_sql_suite(ctx):
    # reference: aggregate e2e (context.rs:832-1016) incl. approx_distinct
    # and array_agg via the dialect layer
    row = ctx.sql(
        """
        SELECT min(l_quantity) AS mn, max(l_quantity) AS mx,
               avg(l_discount) AS av, sum(l_tax) AS sm,
               count(l_orderkey) AS cnt,
               approx_distinct(l_partkey) AS ad
        FROM ctx_lineitem
        """
    ).collect()[0]
    assert row.mn == 1.0 and row.mx == 50.0 and row.cnt > 0 and row.ad > 0
    arr = ctx.sql(
        "SELECT array_agg(DISTINCT l_returnflag) AS flags FROM ctx_lineitem"
    ).collect()[0]
    assert sorted(arr.flags) == ["A", "N", "R"]


def test_csv_json_roundtrip(ctx, tmp_path):
    df = ctx.sql("SELECT l_orderkey, l_quantity FROM ctx_lineitem LIMIT 100")
    csv_dir = str(tmp_path / "csv")
    json_dir = str(tmp_path / "json")
    ctx.write_csv(df, csv_dir)
    ctx.write_json(df, json_dir)
    back_csv = ctx.read_csv(csv_dir, schema="l_orderkey BIGINT, l_quantity DOUBLE")
    back_json = ctx.read_json(json_dir)
    assert back_csv.count() == 100 and back_json.count() == 100
    inferred = ctx.read_csv(csv_dir)  # schema inference path
    assert inferred.schema["l_orderkey"].dataType.typeName() in ("long", "integer")


def test_parquet_write_partitioned(ctx, tmp_path):
    # reference: write_parquet test (context.rs:522-538); partitioning is the
    # Spark-scale upgrade (hive-style partition pruning)
    df = ctx.sql("SELECT l_orderkey, l_returnflag, l_quantity FROM ctx_lineitem LIMIT 500")
    out = str(tmp_path / "part")
    ctx.write_parquet(df, out, partition_by=["l_returnflag"])
    assert any(p.startswith("l_returnflag=") for p in os.listdir(out))
    back = ctx.read_parquet(out)
    assert back.count() == 500


def test_create_external_table_ddl(ctx):
    # reference DDL path (context.rs:420-470): CREATE EXTERNAL TABLE ->
    # CREATE TABLE ... USING ... LOCATION
    ctx.sql("DROP TABLE IF EXISTS ext_orders")
    ctx.sql(
        f"CREATE EXTERNAL TABLE ext_orders STORED AS PARQUET "
        f"LOCATION '{SF_DIR}/orders.parquet'"
    )
    assert ctx.sql("SELECT count(*) AS n FROM ext_orders").collect()[0].n > 0
    ctx.sql("DROP TABLE ext_orders")


def test_parameterized_sql(ctx):
    # reference: Prepare/placeholder plan node (datafusion.proto:186-190)
    df = ctx.spark.sql(
        "SELECT count(*) AS n FROM ctx_lineitem WHERE l_quantity < :q",
        args={"q": 10},
    )
    assert df.collect()[0].n > 0


def test_rewrite_pg_cast_and_similar_to(ctx):
    assert rewrite_sql("SELECT '5'::INT") == "SELECT CAST('5' AS INT)"
    out = rewrite_sql("SELECT x FROM t WHERE name SIMILAR TO 'ab%'")
    assert "RLIKE '^ab.*$'" in out
    row = ctx.sql("SELECT 'abc123'::VARCHAR(10) AS s, 5 AS n WHERE 'abc' SIMILAR TO 'a%'").collect()
    assert len(row) == 1


def test_rewrite_similar_to_adversarial(ctx):
    # parenthesized operand (r2 VERDICT: \S+ operand grammar) — rewritten,
    # operand emitted verbatim
    out = rewrite_sql("SELECT * FROM t WHERE (a || b) SIMILAR TO 'x_y%'")
    assert "(a || b) RLIKE '^x.y.*$'" in out
    # NOT SIMILAR TO with parenthesized operand
    out = rewrite_sql("SELECT (lower(a)) NOT SIMILAR TO 'z%' FROM t")
    assert "(lower(a)) NOT RLIKE '^z.*$'" in out
    # a string literal CONTAINING the words must never be touched
    sql = "SELECT 'name SIMILAR TO pattern' AS doc FROM t"
    assert rewrite_sql(sql) == sql
    # literal with escaped quote next to a real SIMILAR TO
    out = rewrite_sql("SELECT 'it''s' AS s, a SIMILAR TO 'b%' AS m FROM t")
    assert "'it''s'" in out and "a RLIKE '^b.*$'" in out
    # end-to-end through the session
    rows = ctx.sql(
        "SELECT ('a' || 'bc') SIMILAR TO 'ab%' AS m, 'x SIMILAR TO y' AS lit"
    ).collect()
    assert rows[0].m is True and rows[0].lit == "x SIMILAR TO y"


def test_rewrite_qualify(ctx):
    # QUALIFY lowers to subquery + boolean filter; the OVER(...)'s ORDER BY
    # must not be mistaken for the outer ORDER BY (paren-aware tail split)
    out = rewrite_sql(
        "SELECT k, v AS val FROM t "
        "QUALIFY row_number() OVER (PARTITION BY k ORDER BY v DESC) = 1 "
        "ORDER BY k LIMIT 5"
    )
    assert out.startswith("SELECT k, val FROM (SELECT k, v AS val, (row_number()")
    assert out.endswith("WHERE __qualify ORDER BY k LIMIT 5")
    assert "OVER (PARTITION BY k ORDER BY v DESC) = 1) AS __qualify" in out
    # no outer ORDER BY / LIMIT: nothing appended
    out = rewrite_sql("SELECT k FROM t QUALIFY rank() OVER (ORDER BY k) <= 3")
    assert out.endswith("WHERE __qualify")
    # un-aliased expression in the select list: statement passes through
    sql = "SELECT k + 1 FROM t QUALIFY row_number() OVER (ORDER BY k) = 1"
    assert rewrite_sql(sql) == sql
    # QUALIFY inside a subquery passes through (single-SELECT guard)
    sql = (
        "SELECT * FROM (SELECT k FROM t "
        "QUALIFY row_number() OVER (ORDER BY k) = 1)"
    )
    assert rewrite_sql(sql) == sql
    # a literal containing the word QUALIFY is never touched
    sql = "SELECT 'how to QUALIFY leads' AS doc FROM t"
    assert rewrite_sql(sql) == sql
    # end-to-end through the session
    rows = ctx.sql(
        "SELECT l_orderkey, l_linenumber FROM ctx_lineitem "
        "QUALIFY row_number() OVER (PARTITION BY l_orderkey "
        "ORDER BY l_linenumber) = 1 ORDER BY l_orderkey LIMIT 3"
    ).collect()
    expected = {
        r.l_orderkey: r.m
        for r in ctx.sql(
            "SELECT l_orderkey, min(l_linenumber) AS m FROM ctx_lineitem "
            "GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 3"
        ).collect()
    }
    assert {r.l_orderkey: r.l_linenumber for r in rows} == expected


def test_compat_function_names(ctx):
    # DataFusion spellings through the session shims (functions/compat.py)
    row = ctx.sql(
        "SELECT strpos('hello', 'll') AS sp, character_length('abc') AS cl, "
        "to_hex(255) AS hx, digest_sha256('a') AS dg, trunc_number(-1.7) AS tr"
    ).collect()[0]
    assert (row.sp, row.cl, row.hx, row.tr) == (3, 3, "ff", -1.0)
    assert row.dg.startswith("ca978112")


def test_avro_jarless_fallback_missing_path(ctx):
    # With no spark-avro jar, read_avro routes to the pure-Python codec
    # (tests/test_avro.py covers the working path); a missing path must
    # surface a clean path error (PATH_NOT_FOUND from the binaryFile
    # listing, or FileNotFoundError for an empty dir), not a jar-gate
    # error.
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(
        (FileNotFoundError, AnalysisException), match="PATH_NOT_FOUND|no .avro"
    ):
        ctx.read_avro("/tmp/nonexistent_avro_dir_xyz")


def test_read_table_and_register_table(ctx):
    df = ctx.sql("SELECT 42 AS answer")
    ctx.register_table("answer_t", df)
    assert ctx.read_table("answer_t").collect()[0].answer == 42
