"""Small, test-driven SQL dialect shim: DataFusion/postgres-flavored SQL ->
Spark SQL (SURVEY.md §7 step 2; risk register item 4).

Deliberately narrow: only constructs the reference's own query corpus and
client tests use (sqlparser-rs dialect, reference benchmarks/queries/*.sql,
ballista/client/src/context.rs tests). Everything else passes through
untouched — Spark SQL accepts the vast majority of the reference dialect
as-is (ILIKE, FILTER clause, GROUPING SETS, VALUES, EXISTS, ...).

Handled rewrites:
- ``expr::type`` postgres cast        -> CAST(expr AS type)
- ``SIMILAR TO`` regex predicate      -> RLIKE with anchored pattern
- aggregate name deltas               -> approx_distinct -> approx_count_distinct,
                                         approx_percentile_cont -> percentile_approx
- CREATE EXTERNAL TABLE ... STORED AS fmt LOCATION p
                                      -> CREATE TABLE ... USING fmt LOCATION p
- ``SELECT DISTINCT ON (k) ... ORDER BY o``
                                      -> row_number window, rn = 1
  (postgres/DataFusion keep-first-per-key; single SELECT only — a
  DISTINCT ON inside a subquery passes through untouched)
- ``... QUALIFY <window predicate>``  -> subquery computing the predicate
  as a boolean column + outer WHERE (DuckDB/Snowflake QUALIFY; Spark has
  no QUALIFY clause). Single SELECT only; every select item must be a
  plain column or carry an AS alias so the outer projection can re-emit
  it by name — anything else passes through untouched.
"""

from __future__ import annotations

import re

from datafusion_ballista_dhruvil_spark.functions.compat import SQL_NAME_REWRITES

# expr::type -> CAST(expr AS type); conservative operand = masked string
# literal (\x00N\x00 placeholder), quoted identifier, identifier, or number.
_PG_CAST = re.compile(
    r"""(?P<operand>\x00\d+\x00|"[^"]*"|[A-Za-z_][\w.]*|\d+(?:\.\d+)?)\s*::\s*
        (?P<type>[A-Za-z_][\w]*(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)""",
    re.VERBOSE,
)

# Runs AFTER literal masking: the pattern operand is a \x00N\x00
# placeholder, so a string literal that merely CONTAINS the text
# "SIMILAR TO" can never trigger the rewrite. The left operand accepts a
# parenthesized expression (one nesting level, e.g. ``(a || b)``) or a
# single non-space token; it is re-emitted verbatim either way.
_SIMILAR_TO = re.compile(
    r"(?P<operand>\((?:[^()]|\([^()]*\))*\)|\S+)\s+"
    r"(?P<neg>NOT\s+)?SIMILAR\s+TO\s+(?P<pat>\x00\d+\x00)",
    re.IGNORECASE,
)

_EXTERNAL_TABLE = re.compile(
    r"CREATE\s+EXTERNAL\s+TABLE\s+(?P<if>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.\"]+)\s*"
    # column list may contain parenthesized types (DECIMAL(12,2)) — allow
    # one level of nesting
    r"(?P<cols>\((?:[^()]|\([^()]*\))*\))?\s*"
    r"STORED\s+AS\s+(?P<fmt>\w+)\s*"
    r"(?P<opts>WITH\s+ORDER\s+\([^)]*\)\s*)?"
    r"LOCATION\s+(?P<loc>\x00\d+\x00|'[^']*')",
    re.IGNORECASE | re.DOTALL,
)

# DataFusion's numeric trunc(x) collides with Spark's date trunc(date, fmt);
# rewrite only the single-argument form to the numeric shim.
_NUMERIC_TRUNC = re.compile(r"\btrunc\s*\(\s*([^(),]+)\s*\)", re.IGNORECASE)


def _similar_to_regex(pat: str) -> str:
    """SQL SIMILAR TO pattern -> anchored regex: % -> .*, _ -> . (regex
    metachars in the remainder are kept — SIMILAR TO patterns already use a
    regex-like syntax for alternation/classes)."""
    body = pat[1:-1].replace("%", ".*").replace("_", ".")
    return f"'^{body}$'"


_STRING_LIT = re.compile(r"'(?:[^']|'')*'")

# SELECT DISTINCT ON (cols) select FROM rest [ORDER BY ord]: single-SELECT
# statements only (no later SELECT keyword — subqueries pass through).
_DISTINCT_ON = re.compile(
    r"^\s*SELECT\s+DISTINCT\s+ON\s*\((?P<on>[^)]+)\)\s*"
    r"(?P<select>.*?)\s+FROM\s+(?P<rest>.*?)"
    r"(?:\s+ORDER\s+BY\s+(?P<order>.*?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


# SELECT sel FROM rest QUALIFY pred [ORDER BY o] [LIMIT n]: the head split
# is regex (QUALIFY is a reserved-enough keyword at depth 0 in practice);
# the tail split (ORDER BY / LIMIT after the predicate) must be paren-aware
# because the predicate itself contains ORDER BY inside OVER(...).
_QUALIFY = re.compile(
    r"^\s*SELECT\s+(?P<select>.*?)\s+FROM\s+(?P<rest>.*?)\s+"
    r"QUALIFY\s+(?P<tail>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_SIMPLE_COL = re.compile(r"^[A-Za-z_][\w.]*$")
_AS_ALIAS = re.compile(r"\s+AS\s+([A-Za-z_]\w*)\s*$", re.IGNORECASE)


def _split_top_commas(s: str) -> list[str]:
    """Split on commas at paren depth 0."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts]


def _find_top_keyword(s: str, kw_re: re.Pattern) -> int:
    """Index of the first match of kw_re at paren depth 0, or -1."""
    depth = 0
    for m in kw_re.finditer(s):
        depth = s[: m.start()].count("(") - s[: m.start()].count(")")
        if depth == 0:
            return m.start()
    return -1


def _rewrite_qualify(out: str) -> str:
    m = _QUALIFY.match(out)
    if not m or "SELECT" in (m.group("select") + m.group("rest")).upper():
        return out
    tail = m.group("tail")
    # peel trailing LIMIT / ORDER BY at depth 0 (OVER(...) keeps its own
    # ORDER BY at depth >= 1, so a depth-0 scan never eats it)
    limit = order = ""
    i = _find_top_keyword(tail, re.compile(r"\bLIMIT\b", re.IGNORECASE))
    if i >= 0:
        limit, tail = f" LIMIT {tail[i + 5:].strip()}", tail[:i].rstrip()
    i = _find_top_keyword(tail, re.compile(r"\bORDER\s+BY\b", re.IGNORECASE))
    if i >= 0:
        order, tail = f" ORDER BY {tail[i:].split(None, 2)[2].strip()}", tail[:i].rstrip()
    pred = tail.strip()
    outer = []
    for item in _split_top_commas(m.group("select")):
        am = _AS_ALIAS.search(item)
        if am:
            outer.append(am.group(1))
        elif _SIMPLE_COL.match(item):
            outer.append(item.split(".")[-1])
        else:
            return out  # un-aliased expression: leave the statement alone
    return (
        f"SELECT {', '.join(outer)} FROM "
        f"(SELECT {m.group('select').strip()}, ({pred}) AS __qualify "
        f"FROM {m.group('rest').strip()}) WHERE __qualify{order}{limit}"
    )


def rewrite_sql(sql: str) -> str:
    # String literals are masked FIRST so no rewrite — token-level or
    # construct-level — can ever touch text inside quotes (e.g.
    # SELECT 'a::b', or a literal containing the words 'SIMILAR TO').
    literals: list[str] = []

    def _mask(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    out = _STRING_LIT.sub(_mask, sql)

    def _sim(m: re.Match) -> str:
        neg = "NOT " if m.group("neg") else ""
        idx = int(m.group("pat").strip("\x00"))
        literals[idx] = _similar_to_regex(literals[idx])
        return f"{m.group('operand')} {neg}RLIKE {m.group('pat')}"

    out = _SIMILAR_TO.sub(_sim, out)

    def _ext(m: re.Match) -> str:
        ifne = m.group("if") or ""
        cols = f" {m.group('cols')}" if m.group("cols") else ""
        return (
            f"CREATE TABLE {ifne}{m.group('name')}{cols} "
            f"USING {m.group('fmt')} LOCATION {m.group('loc')}"
        )

    out = _EXTERNAL_TABLE.sub(_ext, out)

    out = _rewrite_qualify(out)

    m = _DISTINCT_ON.match(out)
    if m and "SELECT" not in (m.group("select") + m.group("rest")).upper():
        on = m.group("on").strip()
        order = (m.group("order") or on).strip()
        out = (
            f"SELECT {m.group('select').strip()} FROM "
            f"(SELECT *, ROW_NUMBER() OVER (PARTITION BY {on} "
            f"ORDER BY {order}) AS __don_rn FROM {m.group('rest').strip()}) "
            f"WHERE __don_rn = 1 ORDER BY {order}"
        )

    out = _PG_CAST.sub(lambda m: f"CAST({m.group('operand')} AS {m.group('type')})", out)
    for old, new in SQL_NAME_REWRITES.items():
        out = re.sub(rf"\b{old}\s*\(", f"{new}(", out, flags=re.IGNORECASE)
    # single-arg numeric trunc -> trunc_number (Spark's trunc is date-only);
    # limitation: the argument must not itself contain parentheses/commas
    out = _NUMERIC_TRUNC.sub(lambda m: f"trunc_number({m.group(1)})", out)

    return re.sub(r"\x00(\d+)\x00", lambda m: literals[int(m.group(1))], out)
