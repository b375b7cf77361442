"""Property-based idempotence for the dialect shim (sql/rewrite.py).

A regex-based rewriter's classic failure mode is DOUBLE APPLICATION —
rewriting its own output again (which happens whenever a caller layers
shims, or a rewritten string round-trips through a view definition).
Property: rewrite_sql is idempotent on random compositions of the
dialect constructs it owns, with literals fuzzed to contain the trap
strings the masking pass exists for ('::', 'SIMILAR TO', 'QUALIFY',
quotes-adjacent text). Pure Python — no engines involved.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_ballista_dhruvil_spark.sql.rewrite import rewrite_sql

ident = st.sampled_from(["t", "orders", "x1", "colA"])
trap_lit = st.sampled_from(
    ["a::b", "SIMILAR TO", "QUALIFY", "ab%", "_x_", "plain", "5"]
)

template = st.sampled_from(
    [
        "SELECT {l!r}::INT FROM {t}",
        "SELECT {t}.a FROM {t} WHERE name SIMILAR TO {l!r}",
        "SELECT {t}.a FROM {t} WHERE name NOT SIMILAR TO {l!r}",
        "SELECT a, {l!r} FROM {t}",
        "SELECT approx_distinct(a) FROM {t}",
        "SELECT a FROM {t} QUALIFY row_number() OVER (ORDER BY a) = 1",
        "SELECT DISTINCT ON (a) a, b FROM {t} ORDER BY a, b",
        "SELECT a::DOUBLE, b::VARCHAR FROM {t} WHERE c = {l!r}",
    ]
)


@st.composite
def statement(draw):
    parts = [
        draw(template).format(t=draw(ident), l=draw(trap_lit))
        for _ in range(draw(st.integers(1, 2)))
    ]
    return "\nUNION ALL\n".join(parts)


@settings(max_examples=300, deadline=None)
@given(statement())
def test_rewrite_sql_is_idempotent(sql):
    once = rewrite_sql(sql)
    assert rewrite_sql(once) == once
