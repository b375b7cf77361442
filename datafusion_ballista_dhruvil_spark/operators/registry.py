"""Query registry: the engine's declared operator surface.

Every implemented query/operator from SURVEY.md §2 registers here with a
PySpark DataFrame builder and (when SQL-expressible) a DuckDB oracle SQL
string. ``__spark_entry__.py`` exposes these to the driver's correctness
harness; ``bench.py`` times them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is equivalent DuckDB ANSI SQL.

    Omit ``oracle`` only for genuinely non-SQL-expressible operators (the
    driver then records a weaker rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
