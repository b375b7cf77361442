"""Minimal sqllogictest runner — the last SURVEY.md §5 "not present" row.

Implements the subset of the public sqllogictest format (D. R. Hipp's
SQLite test corpus format, as popularized by the DuckDB/DataFusion
runners) needed to drive dual-engine conformance files:

  statement ok          -- execute, assert success (both engines)
  query <types> [sort]  -- execute, compare results (both engines + file)
  ----                  -- expected block: one row per line, values
                           separated by tabs or runs of spaces

``types`` is the classic column-type string (I integer, R real, T text)
used to render values canonically; ``sort`` is ``nosort`` (default,
query must carry its own total ORDER BY) or ``rowsort`` (lexicographic
row sort before compare, for set-valued queries).

Every query runs on BOTH engines — ``spark.sql`` and DuckDB — and must
match the expected block AND each other, so each .slt file is
simultaneously a golden test and a dual-dialect conformance proof (the
same property tests/test_sql_dual_dialect.py establishes for the TPC-H
strings). NULL renders as the literal ``NULL``; reals render with
``repr``-exactness (files stick to exactly-representable values).

Statements execute on both engines too (shared-dialect DDL only:
CREATE TEMP VIEW over VALUES).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import duckdb


@dataclass
class Record:
    kind: str  # "statement" | "query"
    sql: str
    types: str = ""
    sort: str = "nosort"
    expected: list[str] = field(default_factory=list)
    line: int = 0


def parse_slt(text: str) -> list[Record]:
    """Parse a .slt file into records. Comments (#) and blank lines
    separate records, as in the reference format."""
    records: list[Record] = []
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        if line == "statement ok":
            # 1-based line of the DIRECTIVE, captured before the record
            # body is consumed — failure messages previously pointed at
            # the line following the record (ADVICE r5)
            directive_line = i + 1
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() and not lines[i].startswith("#"):
                sql_lines.append(lines[i])
                i += 1
            records.append(
                Record("statement", "\n".join(sql_lines), line=directive_line)
            )
            continue
        m = re.fullmatch(r"query\s+([ITR]+)(?:\s+(nosort|rowsort))?", line)
        if m:
            types, sort = m.group(1), m.group(2) or "nosort"
            directive_line = i + 1
            i += 1
            sql_lines = []
            while i < len(lines) and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            if i >= len(lines):
                raise ValueError(f"query at line {i} has no ---- block")
            i += 1  # skip ----
            expected = []
            while i < len(lines) and lines[i].strip():
                expected.append(lines[i].rstrip())
                i += 1
            records.append(
                Record(
                    "query",
                    "\n".join(sql_lines),
                    types=types,
                    sort=sort,
                    expected=expected,
                    line=directive_line,
                )
            )
            continue
        raise ValueError(f"unrecognized slt directive at line {i + 1}: {line!r}")
    return records


def _render(value, t: str) -> str:
    if value is None:
        return "NULL"
    if t == "I":
        return str(int(value))
    if t == "R":
        f = float(value)
        # integral reals render like the reference runners: 1.0 not 1
        return repr(f)
    return str(value)


def _render_rows(rows, types: str, sort: str) -> list[str]:
    out = []
    for row in rows:
        cells = [_render(v, types[j]) for j, v in enumerate(row)]
        out.append("\t".join(cells))
    if sort == "rowsort":
        out.sort()
    return out


def _norm_expected(lines: list[str], sort: str) -> list[str]:
    # expected cells may be separated by tabs or runs of >=2 spaces;
    # single spaces inside text cells survive
    out = [re.sub(r"\t| {2,}", "\t", ln.strip()) for ln in lines]
    if sort == "rowsort":
        out.sort()
    return out


#: per-query DuckDB watchdog. An engine livelock must surface as a test
#: FAILURE, not a wedged CI: a FULL-JOIN + range-LEFT-JOIN shape once
#: spun DuckDB's executor at 100% CPU indefinitely (three pytest
#: sessions hung at the same query; the identical query completes in
#: 0.01s on most fresh connections — a scheduler race, see
#: slt_select_gen.JOINS3). The timer calls connection.interrupt(),
#: which makes the in-flight execute raise duckdb.InterruptException.
_DUCK_TIMEOUT_S = 120


class DuckTimeout(Exception):
    """The watchdog interrupted a wedged DuckDB query."""


def _duck_with_watchdog(duck, sql: str):
    import threading

    # ADVICE r7 #2: the naive Timer(duck.interrupt) raced — a fire between
    # fetchall() returning and timer.cancel() landed interrupt() on the
    # idle shared connection and spuriously killed the NEXT query. The
    # lock + done flag makes fire-vs-finish atomic: once done is set under
    # the lock, the callback can never call interrupt().
    lock = threading.Lock()
    state = {"done": False, "fired": False}

    def _fire() -> None:
        with lock:
            if not state["done"]:
                state["fired"] = True
                duck.interrupt()

    timer = threading.Timer(_DUCK_TIMEOUT_S, _fire)
    timer.start()
    try:
        rows = duck.execute(sql).fetchall()
    except duckdb.InterruptException as e:
        if state["fired"]:
            raise DuckTimeout(f"timeout after {_DUCK_TIMEOUT_S}s") from e
        raise
    finally:
        with lock:
            state["done"] = True
        timer.cancel()
    return rows


def run_slt(path: str, spark, duck) -> list[str]:
    """Run one .slt file on both engines. Returns a list of failure
    strings (empty = pass). ``duck`` is a duckdb connection."""
    failures: list[str] = []
    records = parse_slt(open(path).read())
    for rec in records:
        if rec.kind == "statement":
            try:
                spark.sql(rec.sql)
            except Exception as e:  # noqa: BLE001
                failures.append(f"{path}:{rec.line} spark statement failed: {e}")
            try:
                duck.execute(rec.sql)
            except Exception as e:  # noqa: BLE001
                failures.append(f"{path}:{rec.line} duck statement failed: {e}")
            continue
        expected = _norm_expected(rec.expected, rec.sort)
        try:
            srows = [tuple(r) for r in spark.sql(rec.sql).collect()]
            sgot = _render_rows(srows, rec.types, rec.sort)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{path}:{rec.line} spark error: {e}")
            continue
        try:
            drows = _duck_with_watchdog(duck, rec.sql)
            dgot = _render_rows(drows, rec.types, rec.sort)
        except DuckTimeout as e:
            failures.append(
                f"{path}:{rec.line} duck TIMEOUT (watchdog {e}): {rec.sql}"
            )
            continue
        except Exception as e:  # noqa: BLE001
            failures.append(f"{path}:{rec.line} duck error: {e}")
            continue
        if sgot != expected:
            failures.append(
                f"{path}:{rec.line} SPARK mismatch\n  sql: {rec.sql}\n"
                f"  want: {expected}\n  got:  {sgot}"
            )
        if dgot != expected:
            failures.append(
                f"{path}:{rec.line} DUCK mismatch\n  sql: {rec.sql}\n"
                f"  want: {expected}\n  got:  {dgot}"
            )
    return failures
