"""Plan inspection utilities (SURVEY.md §4): assert that Catalyst produces
the physical plans the 100 TB design depends on.

The reference distributes plans by hand (stage split at exchanges,
planner.rs:59-166); Spark does it automatically — so our plan QA is not
"does it split" but "did the optimizer keep the cheap shape":

- filters reach the parquet scan (PushedFilters — reference analogue:
  pushed filters in ListingTableScanNode, datafusion.proto:105 +
  ballista.parquet.pruning row-group pruning);
- scans read only referenced columns (ReadSchema column pruning);
- tiny dims broadcast (reference CollectLeft partition mode,
  datafusion.proto:1173-1177);
- aggregates split partial/final (reference AggregateMode
  PARTIAL/FINAL_PARTITIONED, datafusion.proto:1225-1229);
- expressions stay in WholeStageCodegen spans (Tungsten).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """Single wrapper around PySpark's internal explain surface — the ONLY
    call site for this private API (context.explain delegates here)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def formatted_plan(df: DataFrame) -> str:
    return explain_string(df, "formatted")


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True if the scan node advertises PushedFilters containing every
    fragment (column names, operators)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and all(f in line for f in fragments):
            return True
    return False


def scan_read_columns(df: DataFrame, table_hint: str = "") -> list[str]:
    """Columns in the scan's ReadSchema (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line and (table_hint in line if table_hint else True):
            inside = line.split("struct<", 1)
            if len(inside) == 2:
                body = inside[1].rsplit(">", 1)[0]
                cols.extend(f.split(":")[0].strip() for f in body.split(",") if ":" in f)
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastExchange" in formatted_plan(df)


def has_partial_final_agg(df: DataFrame) -> bool:
    """Two-phase aggregation: a partial_ function before the final agg."""
    plan = formatted_plan(df)
    return "partial_" in plan and "HashAggregate" in plan


def codegen_span_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — zero means everything fell out of
    Tungsten (e.g. a Python UDF in the hot path). Under AQE the spans only
    materialize in the executed plan, so this triggers execution."""
    import re

    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen stages print as "*(n) Operator" in the plan tree
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


_EXCHANGE_DETAIL = "Exchange"


def exchange_count(df: DataFrame) -> int:
    """Number of distinct shuffle exchanges in the plan (each is a full
    shuffle — the quantity to minimize at 100 TB). Counts only the
    numbered detail entries of the formatted plan, so the tree header isn't
    double-counted; broadcast/reused exchanges are excluded."""
    import re

    plan = formatted_plan(df)
    n = 0
    for line in plan.splitlines():
        if re.match(r"^\(\d+\) Exchange\s*$", line.strip()):
            n += 1
    return n
