"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "tpch_total_sec", "value": N, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": 0.1}

Mirrors the reference harness (benchmarks/src/bin/tpch.rs:90-109,963-1000):
iterations=3 per query (override BENCH_ITERS), median reported. Each timing
covers logical plan construction through action completion (collect for small
results — same shape as the reference's collect-based runner).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from datafusion_ballista_dhruvil_spark.operators import load_all
    from datafusion_ballista_dhruvil_spark.operators.registry import QUERIES
    from datafusion_ballista_dhruvil_spark.session import create_session

    load_all()
    spark = create_session(app_name="bench")

    times: dict[str, float] = {}
    for name, fn in QUERIES.items():
        samples = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(samples), 4)

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "query_suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
