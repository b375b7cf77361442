"""Interactive SQL CLI (parity: reference ballista-cli/ — a REPL that
registers tables and executes SQL against the engine).

Usage:
    python -m datafusion_ballista_dhruvil_spark.cli                # REPL
    python -m datafusion_ballista_dhruvil_spark.cli -c "SELECT 1"  # one-shot
    ... [--sf-dir /root/testdata/sf0.01]  # pre-register testdata tables

Dot-commands (reference CLI command set): .tables  .schema <t>  .quit
"""

from __future__ import annotations

import argparse
import sys


def _print_df(df, limit: int = 50) -> None:
    df.show(n=limit, truncate=False)


def run_statement(ctx, stmt: str) -> None:
    stmt = stmt.strip().rstrip(";")
    if not stmt:
        return
    if stmt == ".tables":
        for t in ctx.tables():
            print(t)
        return
    if stmt.startswith(".schema"):
        parts = stmt.split(None, 1)
        if len(parts) < 2 or not parts[1].strip():
            print("usage: .schema <table>", file=sys.stderr)
            return
        ctx.read_table(parts[1].strip()).printSchema()
        return
    _print_df(ctx.sql(stmt))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="SQL CLI for the engine")
    parser.add_argument("-c", "--command", help="run one SQL statement and exit")
    parser.add_argument(
        "--sf-dir", default=None, help="register testdata tables from this directory"
    )
    args = parser.parse_args(argv)

    from datafusion_ballista_dhruvil_spark.context import BallistaSparkContext
    from datafusion_ballista_dhruvil_spark.session import register_tables

    ctx = BallistaSparkContext()
    if args.sf_dir:
        register_tables(ctx.spark, args.sf_dir)

    def fmt_err(e: Exception) -> str:
        lines = [ln for ln in str(e).strip().splitlines() if ln.strip()]
        return lines[0] if lines else type(e).__name__

    if args.command:
        try:
            run_statement(ctx, args.command)
        except Exception as e:  # surface engine errors with exit code
            print(f"error: {fmt_err(e)}", file=sys.stderr)
            return 1
        return 0

    print("engine SQL shell — .tables .schema <t> .quit")
    while True:
        try:
            line = input("sql> ")
        except (EOFError, KeyboardInterrupt):
            print()
            return 0
        if line.strip() in (".quit", ".exit", "quit", "exit"):
            return 0
        try:
            run_statement(ctx, line)
        except Exception as e:
            print(f"error: {fmt_err(e)}", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
