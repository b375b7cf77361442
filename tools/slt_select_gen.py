"""Generate sqllogictest ``select*.test``-style conformance files.

The public sqllogictest corpus's ``select1.test``/``select2.test`` files
are machine-generated single-table query sweeps over ``t1(a,b,c,d,e)``
(integer columns, NULLs sprinkled): every query combines a handful of
expression shapes (linear combinations, abs(), searched and simple CASE,
correlated count(*) scalar subqueries) with condition shapes (column
comparisons, BETWEEN, AND/OR compounds, EXISTS). This container has no
network access, so the genuine files cannot be byte-imported (an
environmental gate, like ICEBERG_JAR); this generator reproduces the
corpus's documented grammar offline instead — same table shape, same
expression/condition pools, deterministic seed — and pins the expected
block from DuckDB AT GENERATION TIME, so the committed .slt files are
self-contained golden tests thereafter (tools/slt_runner.py then requires
BOTH engines to match the file and each other on every CI run).

Generation-time contract: every emitted query ran on BOTH engines and
agreed; a disagreement raises (that is a conformance bug to fix, not
skip); a Spark-side analysis error (unsupported shape) skips the query
LOUDLY (listed on stderr and counted in the file header).

Usage: python tools/slt_select_gen.py   # rewrites tests/slt/select_gen*.slt
"""

from __future__ import annotations

import os
import random
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

N_ROWS = 30
SEED = 2026

#: integer-exact, engine-portable expression pool (the select1.test
#: shapes; integer division is spelled floor(x/5.0) because bare ``/``
#: is float in both engines while sqllogictest's SQLite truncates)
EXPRS = [
    "a",
    "b",
    "c",
    "d",
    "e",
    "a+b*2",
    "a+b*2+c*3",
    "a+b*2+c*3+d*4",
    "a+b*2+c*3+d*4+e*5",
    "b-c",
    "a-b",
    "d-e",
    "abs(a)",
    "abs(b-c)",
    "CAST(floor((a+b+c+d+e)/5.0) AS BIGINT)",
    "CASE WHEN a<b-3 THEN 111 WHEN a<=b THEN 222"
    " WHEN a<b+3 THEN 333 ELSE 444 END",
    "CASE a+1 WHEN b THEN 111 WHEN c THEN 222 WHEN d THEN 333"
    " WHEN e THEN 444 ELSE 555 END",
    "(SELECT count(*) FROM t1 AS x WHERE x.b<t1.b)",
    "(SELECT count(*) FROM t1 AS x WHERE x.c>t1.c AND x.d<t1.d)",
    "coalesce(a+b*2, d+e, abs(b))",
]

CONDS = [
    "a>b",
    "b>c",
    "c>d",
    "d>e",
    "(e>a AND e<b)",
    "(e>c OR e<d)",
    "a>b-2 AND a<b+2",
    "c BETWEEN b-2 AND d+2",
    "d NOT BETWEEN 110 AND 150",
    "EXISTS(SELECT 1 FROM t1 AS x WHERE x.b<t1.b)",
    "coalesce(a,b,c,d,e)<>0",
]


def make_rows(rng: random.Random) -> list[tuple]:
    rows = []
    for _ in range(N_ROWS):
        vals = []
        for _ in range(5):
            # ~10% NULLs, like the genuine corpus's sprinkled NULLs
            vals.append(None if rng.random() < 0.10 else rng.randint(100, 250))
        rows.append(tuple(vals))
    return rows


def values_sql(rows: list[tuple]) -> str:
    def cell(v):
        return "NULL" if v is None else str(v)

    body = ",\n  ".join("(" + ", ".join(cell(v) for v in r) + ")" for r in rows)
    return (
        "CREATE OR REPLACE TEMP VIEW t1 AS\nSELECT * FROM (VALUES\n  "
        f"{body}\n) AS v(a, b, c, d, e)"
    )


def gen_queries(
    rng: random.Random, n: int, with_distinct: bool
) -> list[tuple[str, int, str]]:
    """(sql, n_select_columns, types) triples — the column count is
    tracked here because parsing it back out is ambiguous (correlated
    subqueries in the select list contain their own FROM t1)."""
    out = []
    for _ in range(n):
        k = rng.randint(1, 4)
        cols = rng.sample(EXPRS, k)
        sel = ",\n       ".join(cols)
        distinct = "DISTINCT " if (with_distinct and rng.random() < 0.3) else ""
        q = f"SELECT {distinct}{sel}\n  FROM t1"
        r = rng.random()
        if r < 0.45:
            q += f"\n WHERE {rng.choice(CONDS)}"
        elif r < 0.70:
            a, b = rng.sample(CONDS, 2)
            op = rng.choice(["AND", "OR"])
            q += f"\n WHERE {a}\n   {op} {b}"
        out.append((q, k, "I" * k))
    return out


#: integer-valued group keys that form multi-row groups over 30 rows
#: (raw columns are near-unique; the public aggregate sweeps group on
#: low-cardinality keys the same way)
GROUP_KEYS = ["a % 5", "b % 3", "c % 4", "(d + e) % 3", "abs(a - b) % 4"]

#: (aggregate expression, result type letter) — sums cast to BIGINT so
#: both engines render identical integers; avg stays R (sum is integer-
#: exact in double range, so the one divide is IEEE-identical)
AGGS = [
    ("CAST(count(*) AS BIGINT)", "I"),
    ("CAST(count(b) AS BIGINT)", "I"),
    ("CAST(count(DISTINCT c) AS BIGINT)", "I"),
    ("CAST(sum(a) AS BIGINT)", "I"),
    ("CAST(sum(b + c * 2) AS BIGINT)", "I"),
    ("CAST(min(d) AS BIGINT)", "I"),
    ("CAST(max(e) AS BIGINT)", "I"),
    ("avg(a)", "R"),
    ("CAST(sum(CASE WHEN a > b THEN 1 ELSE 0 END) AS BIGINT)", "I"),
]


def gen_agg_queries(rng: random.Random, n: int) -> list[tuple[str, int, str]]:
    """(sql, n_cols, types) triples in the public corpus's aggregate
    grammar: grouped aggregates with optional WHERE and HAVING."""
    out = []
    for _ in range(n):
        key = rng.choice(GROUP_KEYS)
        k = rng.randint(1, 3)
        aggs = rng.sample(AGGS, k)
        sel = ",\n       ".join(e for e, _ in aggs)
        types = "I" + "".join(t for _, t in aggs)
        q = f"SELECT {key} AS g,\n       {sel}\n  FROM t1"
        if rng.random() < 0.4:
            q += f"\n WHERE {rng.choice(CONDS)}"
        q += "\n GROUP BY g"
        if rng.random() < 0.3:
            q += "\nHAVING count(*) > 1"
        out.append((q, 1 + k, types))
    return out


def values_sql_t2(rows: list[tuple]) -> str:
    def cell(v):
        return "NULL" if v is None else str(v)

    body = ",\n  ".join("(" + ", ".join(cell(v) for v in r) + ")" for r in rows)
    return (
        "CREATE OR REPLACE TEMP VIEW t2 AS\nSELECT * FROM (VALUES\n  "
        f"{body}\n) AS v(v, w, x, y, z)"
    )


#: two-table expression pool (the public corpus's select4/select5-style
#: join sweeps reference both sides); integer-exact like EXPRS
JEXPRS = [
    "t1.a",
    "t2.v",
    "t1.b + t2.w",
    "t1.a - t2.v",
    "abs(t1.c - t2.x)",
    "coalesce(t1.d, t2.y, 0)",
    "CASE WHEN t1.a > t2.v THEN 111 WHEN t1.a = t2.v THEN 222 ELSE 333 END",
    "t1.e * 2 + t2.z",
    "coalesce(t1.a, 0) + coalesce(t2.w, 0)",
]

#: (join type, ON condition) pool — equi keys land in the 100-250 value
#: range both tables draw from, modular keys guarantee dense matches
JOINS = [
    ("JOIN", "t1.b = t2.w"),
    ("JOIN", "t1.c = t2.x"),
    ("JOIN", "t1.a % 5 = t2.v % 5"),
    ("JOIN", "t1.b % 4 = t2.w % 4 AND t1.a > t2.v"),
    ("LEFT JOIN", "t1.b = t2.w"),
    ("LEFT JOIN", "t1.a % 3 = t2.v % 3 AND t2.z > t1.e"),
    ("RIGHT JOIN", "t1.c = t2.x"),
    ("FULL JOIN", "t1.d = t2.y"),
]

#: cross-table WHERE conditions, including the correlated-subquery shapes
JCONDS = [
    "t1.a > t2.v",
    "t2.w BETWEEN t1.b - 5 AND t1.b + 5",
    "coalesce(t1.c, 0) + coalesce(t2.x, 0) > 300",
    "EXISTS(SELECT 1 FROM t2 AS s WHERE s.v < t1.a)",
    "NOT EXISTS(SELECT 1 FROM t2 AS s WHERE s.w = t1.b AND s.z > t1.e)",
    "t1.d IN (SELECT y FROM t2 AS s WHERE s.v > 150)",
]


def gen_join_queries(rng: random.Random, n: int) -> list[tuple[str, int, str]]:
    """(sql, n_cols, types) triples in the public corpus's multi-table
    grammar (select4/select5-style): t1 x t2 equi/outer joins with
    two-sided select expressions, optional cross-table WHERE (correlated
    EXISTS / IN included), and a grouped-aggregate-over-join variant."""
    out = []
    for i in range(n):
        jt, on = rng.choice(JOINS)
        if i % 4 == 3:
            # grouped aggregate over the join (one in four)
            key = rng.choice(
                ["t1.a % 4", "t2.v % 3", "abs(coalesce(t1.b, 0) - coalesce(t2.w, 0)) % 5"]
            )
            k = rng.randint(1, 2)
            aggs = rng.sample(
                [
                    "CAST(count(*) AS BIGINT)",
                    "CAST(count(t2.z) AS BIGINT)",
                    "CAST(sum(coalesce(t1.a, 0)) AS BIGINT)",
                    "CAST(min(t2.w) AS BIGINT)",
                    "CAST(max(coalesce(t1.e, 0) + coalesce(t2.z, 0)) AS BIGINT)",
                ],
                k,
            )
            sel = ",\n       ".join(aggs)
            q = (
                f"SELECT {key} AS g,\n       {sel}\n"
                f"  FROM t1 {jt} t2 ON {on}\n GROUP BY g"
            )
            out.append((q, 1 + k, "I" * (1 + k)))
            continue
        k = rng.randint(1, 3)
        cols = rng.sample(JEXPRS, k)
        sel = ",\n       ".join(cols)
        q = f"SELECT {sel}\n  FROM t1 {jt} t2 ON {on}"
        r = rng.random()
        if r < 0.45:
            q += f"\n WHERE {rng.choice(JCONDS)}"
        elif r < 0.65:
            a, b = rng.sample(JCONDS, 2)
            q += f"\n WHERE {a}\n   AND {b}"
        out.append((q, k, "I" * k))
    return out


def values_sql_t3(rows: list[tuple]) -> str:
    def cell(v):
        return "NULL" if v is None else str(v)

    body = ",\n  ".join("(" + ", ".join(cell(v) for v in r) + ")" for r in rows)
    return (
        "CREATE OR REPLACE TEMP VIEW t3 AS\nSELECT * FROM (VALUES\n  "
        f"{body}\n) AS v(p, q, r, s, t)"
    )


#: second-hop join pool for the 3-table chains (t2->t3 or t1->t3).
#: NO range predicate (BETWEEN) in a second-hop ON: a FULL JOIN first
#: hop followed by a LEFT JOIN whose ON is a range on the full-join's
#: left side intermittently LIVELOCKED DuckDB 1.x's executor (same
#: query: 0.01s on most runs, infinite-spin on others — three pytest
#: sessions wedged at 100% CPU with zero progress; reproduced and then
#: un-reproduced on identical fresh connections). The conformance sweep
#: must never depend on a racy engine path, so the hop pool is
#: equi/modular only; range predicates stay in WHERE clauses (gen4),
#: where both engines are stable.
JOINS3 = [
    ("JOIN", "t2.x = t3.p"),
    ("JOIN", "t1.a % 4 = t3.r % 4"),
    ("LEFT JOIN", "t2.w % 3 = t3.q % 3"),
    ("LEFT JOIN", "t3.s % 7 = t1.b % 7"),
    ("RIGHT JOIN", "t1.c = t3.q"),
]

#: three-table expression pool; integer-exact like EXPRS/JEXPRS
JEXPRS3 = [
    "t3.p",
    "t1.a + t3.q",
    "coalesce(t2.w, t3.r, 0)",
    "abs(coalesce(t1.b, 0) - coalesce(t3.s, 0))",
    "CASE WHEN t3.p > t1.a THEN 11 WHEN t3.p = t1.a THEN 22 ELSE 33 END",
    "coalesce(t1.e, 0) + coalesce(t2.z, 0) + coalesce(t3.t, 0)",
]

JCONDS3 = [
    "t3.p > t1.a",
    "coalesce(t3.q, 0) + coalesce(t2.w, 0) > 300",
    "EXISTS(SELECT 1 FROM t3 AS s3 WHERE s3.p < t1.a)",
    "t1.d IN (SELECT q FROM t3 AS s3 WHERE s3.r > 150)",
]

#: set operations — a grammar family gen1-4 do not cover; both engines
#: use identical NULLs-are-equal set-distinct semantics
SETOPS = ["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]
SETSIDES = [
    ("SELECT a, b FROM t1", "SELECT v, w FROM t2"),
    ("SELECT b, c FROM t1 WHERE a > 150", "SELECT w, x FROM t2"),
    ("SELECT a % 5, b % 3 FROM t1", "SELECT v % 5, w % 3 FROM t2"),
    ("SELECT d, e FROM t1", "SELECT s, t FROM t3 WHERE p > 120"),
    ("SELECT c, d FROM t1 WHERE b < 200", "SELECT q, r FROM t3"),
]


def gen_three_table_queries(rng: random.Random, n: int) -> list[tuple[str, int, str]]:
    """(sql, n_cols, types) triples: 3-table join chains (mixed
    inner/outer hops), grouped aggregates over the chain, and two-sided
    set operations (UNION [ALL] / INTERSECT / EXCEPT) — the select5-ish
    tail of the public corpus grammar."""
    out = []
    for i in range(n):
        if i % 5 == 0:
            left, right = rng.choice(SETSIDES)
            op = rng.choice(SETOPS)
            out.append((f"{left}\n{op}\n{right}", 2, "II"))
            continue
        jt1, on1 = rng.choice(JOINS)
        jt2, on2 = rng.choice(JOINS3)
        frm = f"  FROM t1 {jt1} t2 ON {on1}\n       {jt2} t3 ON {on2}"
        if i % 5 == 4:
            key = rng.choice(["t1.a % 4", "t3.p % 3", "coalesce(t2.v, 0) % 5"])
            aggs = rng.sample(
                [
                    "CAST(count(*) AS BIGINT)",
                    "CAST(count(t3.t) AS BIGINT)",
                    "CAST(sum(coalesce(t3.q, 0)) AS BIGINT)",
                    "CAST(max(coalesce(t1.e, 0) + coalesce(t3.t, 0)) AS BIGINT)",
                ],
                rng.randint(1, 2),
            )
            sel = ",\n       ".join(aggs)
            q = f"SELECT {key} AS g,\n       {sel}\n{frm}\n GROUP BY g"
            out.append((q, 1 + len(aggs), "I" * (1 + len(aggs))))
            continue
        k = rng.randint(1, 3)
        cols = rng.sample(JEXPRS3, k)
        sel = ",\n       ".join(cols)
        q = f"SELECT {sel}\n{frm}"
        if rng.random() < 0.5:
            q += f"\n WHERE {rng.choice(JCONDS3)}"
        out.append((q, k, "I" * k))
    return out


#: correlated scalar subqueries in the SELECT list that reach ACROSS
#: tables (gen1/2's only scalar subqueries are t1-self count(*)); every
#: one is aggregated (both engines require it) and integer-exact. Range
#: predicates live in subquery WHERE clauses — never join ONs (the
#: DuckDB livelock fence, see JOINS3).
SCALAR_SUBS = [
    "(SELECT CAST(count(*) AS BIGINT) FROM t2 WHERE t2.v < t1.a)",
    "(SELECT CAST(coalesce(sum(t2.w), 0) AS BIGINT)"
    " FROM t2 WHERE t2.v % 3 = t1.a % 3)",
    "(SELECT CAST(max(t2.x) AS BIGINT) FROM t2 WHERE t2.w > t1.b)",
    "(SELECT CAST(count(*) AS BIGINT)"
    " FROM t3 WHERE t3.p BETWEEN t1.a - 10 AND t1.a + 10)",
    "(SELECT CAST(min(t3.q) AS BIGINT) FROM t3 WHERE t3.r % 4 = t1.b % 4)",
    "(SELECT CAST(count(DISTINCT t2.x) AS BIGINT)"
    " FROM t2 WHERE t2.v <= t1.c)",
]

#: HAVING conditions over join aggregates (gen4's 1-in-4 agg-over-join
#: rows never drew a HAVING; the public aggregate grammar does)
JHAVINGS = [
    "count(*) > 2",
    "count(*) BETWEEN 2 AND 40",
    "sum(coalesce(t1.a, 0)) > 500",
    "min(t2.w) < 200",
]


def gen_scalar_sub_queries(rng: random.Random, n: int) -> list[tuple[str, int, str]]:
    """(sql, n_cols, types) triples for the two remaining public-grammar
    families (VERDICT r7 #8): correlated scalar subqueries in the SELECT
    list that cross tables, and grouped aggregates OVER joins with
    HAVING. Three shapes, round-robin weighted:
    - SELECT col(s) + 1-2 cross-table scalar subqueries FROM t1 [WHERE]
    - scalar subquery combined arithmetically with a base column
    - agg-over-join with HAVING (the gen4 family, HAVING added)"""
    out = []
    for i in range(n):
        if i % 3 == 2:
            jt, on = rng.choice(JOINS[:6])  # equi/left pool, no FULL hop
            key = rng.choice(["t1.a % 4", "t2.v % 3", "t1.b % 5"])
            k = rng.randint(1, 2)
            aggs = rng.sample(
                [
                    "CAST(count(*) AS BIGINT)",
                    "CAST(sum(coalesce(t1.a, 0)) AS BIGINT)",
                    "CAST(min(t2.w) AS BIGINT)",
                    "CAST(max(coalesce(t2.z, 0)) AS BIGINT)",
                ],
                k,
            )
            sel = ",\n       ".join(aggs)
            q = (
                f"SELECT {key} AS g,\n       {sel}\n"
                f"  FROM t1 {jt} t2 ON {on}\n GROUP BY g"
                f"\nHAVING {rng.choice(JHAVINGS)}"
            )
            out.append((q, 1 + k, "I" * (1 + k)))
            continue
        if i % 3 == 1:
            # scalar subquery in arithmetic with a base column
            sub = rng.choice(SCALAR_SUBS)
            base = rng.choice(["a", "b", "coalesce(c, 0)"])
            q = (
                f"SELECT {base},\n       {base} + coalesce({sub}, 0)\n"
                f"  FROM t1"
            )
            if rng.random() < 0.5:
                q += f"\n WHERE {rng.choice(CONDS)}"
            out.append((q, 2, "II"))
            continue
        k = rng.randint(1, 2)
        subs = rng.sample(SCALAR_SUBS, k)
        base = rng.choice(["a", "b", "c", "d"])
        sel = ",\n       ".join([base, *subs])
        q = f"SELECT {sel}\n  FROM t1"
        if rng.random() < 0.5:
            q += f"\n WHERE {rng.choice(CONDS)}"
        out.append((q, 1 + k, "I" * (1 + k)))
    return out


def main() -> int:
    import duckdb

    from datafusion_ballista_dhruvil_spark.session import create_session
    from tools.slt_runner import _render_rows

    rng = random.Random(SEED)
    rows = make_rows(rng)
    create = values_sql(rows)
    # t2 draws 25 rows from the SAME value range so equi-joins match. It
    # uses its OWN seeded stream (SEED + 1): drawing from `rng` here would
    # shift the stream feeding gen1-3 and silently regenerate those files.
    rng2 = random.Random(SEED + 1)
    rows2 = []
    for _ in range(25):
        vals = [
            None if rng2.random() < 0.10 else rng2.randint(100, 250)
            for _ in range(5)
        ]
        rows2.append(tuple(vals))
    create2 = values_sql_t2(rows2)
    # t3: 20 rows, own stream (SEED + 2) — gen1-4 files stay byte-stable
    rng3 = random.Random(SEED + 2)
    rows3 = []
    for _ in range(20):
        vals = [
            None if rng3.random() < 0.10 else rng3.randint(100, 250)
            for _ in range(5)
        ]
        rows3.append(tuple(vals))
    create3 = values_sql_t3(rows3)

    spark = create_session(app_name="slt-select-gen")
    duck = duckdb.connect()
    for stmt in (create, create2, create3):
        spark.sql(stmt)
        duck.execute(stmt)

    files = {
        "select_gen1.slt": ([create], gen_queries(rng, 40, with_distinct=False)),
        "select_gen2.slt": ([create], gen_queries(rng, 40, with_distinct=True)),
        # the aggregate sweep (the public corpus's random/aggregates
        # grammar): grouped aggregates + WHERE + HAVING
        "select_gen3.slt": ([create], gen_agg_queries(rng, 40)),
        # the multi-table sweep (select4/select5-style): t1 x t2
        # equi/outer joins, correlated EXISTS/IN, aggregates over joins
        # (rng2: gen1-3 streams stay untouched, files byte-stable)
        "select_gen4.slt": ([create, create2], gen_join_queries(rng2, 44)),
        # the 3-table + set-operation sweep (select5-ish tail): join
        # chains with mixed hops, aggregates over chains, UNION [ALL] /
        # INTERSECT / EXCEPT (rng3: gen1-4 streams untouched)
        "select_gen5.slt": (
            [create, create2, create3],
            gen_three_table_queries(rng3, 45),
        ),
        # the correlated-scalar-subquery-in-SELECT + agg-over-join-with-
        # HAVING sweep (VERDICT r7 #8 — the last public-grammar families
        # gen1-5 don't draw from; rng4: gen1-5 streams untouched)
        "select_gen6.slt": (
            [create, create2, create3],
            gen_scalar_sub_queries(random.Random(SEED + 3), 42),
        ),
    }
    for fname, (creates, queries) in files.items():
        blocks: list[str] = []
        skipped: list[str] = []
        for q, n_cols, types in queries:
            try:
                srows = [tuple(r) for r in spark.sql(q).collect()]
            except Exception as e:  # noqa: BLE001
                skipped.append(f"{q!r}: spark: {type(e).__name__}")
                continue
            drows = duck.execute(q).fetchall()
            sgot = _render_rows(srows, types, "rowsort")
            dgot = _render_rows(drows, types, "rowsort")
            if sgot != dgot:
                raise AssertionError(
                    f"ENGINE DISAGREEMENT (conformance bug, do not skip):\n"
                    f"{q}\nspark: {sgot[:5]}\nduck:  {dgot[:5]}"
                )
            # the expected block IS DuckDB's rendering (matching the
            # docstring/header provenance claim); the assertion above
            # guarantees it equals Spark's byte-for-byte, so committed
            # files are unchanged either way
            expected = "\n".join(dgot)
            blocks.append(
                f"query {types} rowsort\n{q}\n----\n{expected}\n"
            )
        create_blocks = "\n\n".join(f"statement ok\n{c}" for c in creates)
        header = (
            "# GENERATED by tools/slt_select_gen.py (seed "
            f"{SEED}) in the public sqllogictest select*.test grammar\n"
            "# (t1(a,b,c,d,e) integer sweep). Genuine files are not\n"
            "# importable in-container (no network); expected blocks were\n"
            "# pinned from DuckDB at generation time and both engines\n"
            f"# must match them on every run. {len(blocks)} queries"
            f"{'' if not skipped else f', {len(skipped)} skipped (unsupported on Spark)'}.\n"
            "# DO NOT EDIT BY HAND — re-run the generator.\n\n"
            f"{create_blocks}\n\n"
        )
        path = os.path.join(_REPO, "tests", "slt", fname)
        with open(path, "w") as f:
            f.write(header + "\n".join(blocks))
        print(f"{fname}: {len(blocks)} queries, {len(skipped)} skipped")
        for s in skipped:
            print(f"  SKIP {s}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
