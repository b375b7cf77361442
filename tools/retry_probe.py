"""Task-retry probe: inject a first-attempt failure into an Arrow
(mapInPandas) task and assert Spark's retry produces the exact result —
the determinism-under-retries property every operator in this engine is
designed for (pure functions of input partitions; no rand()/now()).

Run standalone (own JVM — the test launches it as a subprocess because
local-mode retry needs master local[N, maxFailures], which the shared
test session doesn't use): python tools/retry_probe.py
"""

from __future__ import annotations

import sys

from pyspark import TaskContext
from pyspark.sql import SparkSession


def flaky(it):
    tc = TaskContext.get()
    if tc.partitionId() == 0 and tc.attemptNumber() == 0:
        raise RuntimeError("injected first-attempt failure (expected)")
    for pdf in it:
        pdf = pdf.copy()
        pdf["y"] = pdf["id"] * 2
        yield pdf


def main() -> int:
    spark = (
        SparkSession.builder.master("local[4, 3]")  # 3 task attempts
        .appName("retry-probe")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    try:
        df = spark.range(0, 1000, 1, 4).mapInPandas(flaky, "id long, y long")
        rows = df.collect()
        assert len(rows) == 1000, len(rows)
        assert sum(r.y for r in rows) == 999 * 1000, "wrong sum after retry"
        assert len({r.id for r in rows}) == 1000, "dup/missing ids after retry"
        print("RETRY_OK")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
