"""sqllogictest-subset conformance corpus — closes the last SURVEY.md §5
"not present" row. Each tests/slt/*.slt file runs EVERY query on both
``spark.sql`` and DuckDB via tools/slt_runner.py; results must match the
file's expected block AND each other, making each file simultaneously a
golden test and a dual-dialect conformance proof (the same property
tests/test_sql_dual_dialect.py establishes for the TPC-H strings).

The files deliberately cover the semantic corners where engine DEFAULTS
differ and portable SQL must be explicit: NULL ordering (Spark NULLS
FIRST vs DuckDB NULLS LAST), NOT IN over NULL-bearing sets, truncating
modulo on negatives, set-op deduplication, rank-vs-dense_rank ties, and
explicit window frames.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SLT_DIR = os.path.join(REPO, "tests", "slt")
SLT_FILES = sorted(glob.glob(os.path.join(SLT_DIR, "*.slt")))


def test_corpus_is_present():
    assert len(SLT_FILES) >= 7


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


@pytest.mark.parametrize(
    "path", SLT_FILES, ids=[os.path.basename(p) for p in SLT_FILES]
)
def test_slt_file(spark, duck, path):
    import sys

    sys.path.insert(0, REPO)
    from tools.slt_runner import run_slt

    failures = run_slt(path, spark, duck)
    assert not failures, "\n".join(failures)


def test_parser_rejects_malformed_query_block(tmp_path):
    from tools.slt_runner import parse_slt

    with pytest.raises(ValueError, match="no ---- block"):
        parse_slt("query I nosort\nSELECT 1\n")


def test_renderer_is_type_strict():
    from tools.slt_runner import _render

    assert _render(None, "I") == "NULL"
    assert _render(3, "I") == "3"
    assert _render(3, "R") == "3.0"
    assert _render(2.5, "R") == "2.5"
    assert _render("x y", "T") == "x y"
