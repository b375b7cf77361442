"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "query_suite_total_sec", "value": N, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": 0.1}

Mirrors the reference harness (benchmarks/src/bin/tpch.rs:90-109,963-1000):
iterations=3 per query (override BENCH_ITERS), median reported. Each timing
covers logical plan construction through action completion (collect for small
results — same shape as the reference's collect-based runner).

Loadtest mode (reference tpch.rs:174-206: concurrent submission,
requests=100 concurrency=5 defaults): ``python bench.py --loadtest
[requests] [concurrency]`` fires random registry queries from a thread pool
against one session and reports throughput. Spark's scheduler interleaves
the jobs (FAIR-ready); this is the reference's multi-client scenario.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time


def loadtest(requests: int = 100, concurrency: int = 5) -> int:
    import random
    from concurrent.futures import ThreadPoolExecutor

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from datafusion_ballista_dhruvil_spark.operators import load_all
    from datafusion_ballista_dhruvil_spark.operators.registry import QUERIES
    from datafusion_ballista_dhruvil_spark.session import create_session

    load_all()
    spark = create_session(app_name="loadtest")
    rng = random.Random(42)
    names = [n for n in QUERIES if n.startswith("q")]
    picks = [rng.choice(names) for _ in range(requests)]

    def run_one(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=concurrency) as pool:
        lat = list(pool.map(run_one, picks))
    wall = time.perf_counter() - t0
    lat.sort()
    print(
        json.dumps(
            {
                "metric": "loadtest_qps",
                "value": round(requests / wall, 3),
                "unit": "queries/sec",
                "requests": requests,
                "concurrency": concurrency,
                "wall_sec": round(wall, 2),
                "p50_sec": round(lat[len(lat) // 2], 3),
                "p95_sec": round(lat[int(len(lat) * 0.95)], 3),
            }
        )
    )
    spark.stop()
    return 0


def main() -> int:
    if len(sys.argv) > 1:
        if sys.argv[1] == "--loadtest":
            return loadtest(
                int(sys.argv[2]) if len(sys.argv) > 2 else 100,
                int(sys.argv[3]) if len(sys.argv) > 3 else 5,
            )
        print(
            f"unknown argument {sys.argv[1]!r}; usage: bench.py [--loadtest "
            "[requests] [concurrency]]",
            file=sys.stderr,
        )
        return 2
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
