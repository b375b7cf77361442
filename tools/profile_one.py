"""Profile one registry query: per-iteration wall time + top stages by
executor run time (from the local Spark UI REST API).

Usage: SPARK_GRAFT_SF_DIR=... python tools/profile_one.py <name> [iters]

Guide §1 (measure first): the stage table maps wall-clock to operators via
the stage callsite / description, separating scan vs shuffle vs window vs
Python-boundary cost without guessing from the plan alone.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    from datafusion_ballista_dhruvil_spark.operators import load_all
    from datafusion_ballista_dhruvil_spark.operators.registry import QUERIES
    from datafusion_ballista_dhruvil_spark.session import create_session

    name = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = create_session(app_name=f"profile_{name}")
    fn = QUERIES[name]
    # warmup (JIT + page cache), mirroring bench.py --solo-one's discard
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    warm = time.perf_counter() - t0
    marks = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        marks.append(time.perf_counter() - t0)
    print(f"{name}: warm={warm:.3f}s iters={[round(m, 3) for m in marks]}")

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
        jobs = json.loads(r.read())
    jobs = [j for j in jobs if j["status"] == "SUCCEEDED"]
    print(f"jobs: {len(jobs)} (all iterations incl. warmup)")
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        stages = json.loads(r.read())
    # wall span per stage (serialized narrow stages show up here, not in
    # executorRunTime)
    from datetime import datetime

    def ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    spans = []
    for s in stages:
        if s["status"] == "COMPLETE" and s.get("firstTaskLaunchedTime"):
            spans.append(
                (
                    ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"]),
                    s.get("numCompleteTasks", 0),
                    s.get("executorRunTime", 0),
                )
            )
    spans.sort(key=lambda x: -x[0])
    print(
        f"stages: {len(spans)}, sum wall spans {sum(x[0] for x in spans):.2f}s; top:"
    )
    for w, nt, rt in spans[:15]:
        print(f"  wall {w:6.3f}s  tasks {nt:3d}  execRun {rt:6d}ms")
    done = [s for s in stages if s["status"] == "COMPLETE"]
    done.sort(key=lambda s: -s.get("executorRunTime", 0))
    total_ms = sum(s.get("executorRunTime", 0) for s in done)
    print(f"total executorRunTime across {len(done)} stages: {total_ms}ms")
    for s in done[:20]:
        nm = s.get("description") or s["name"]
        print(
            f"  {s.get('executorRunTime', 0):7d}ms run "
            f"{s.get('shuffleWriteBytes', 0) // 1024:6d}KiB-shw "
            f"{s.get('numCompleteTasks', s.get('numTasks', 0)):3d}t  "
            f"{nm[:140]}"
        )

    # SQL-node metrics of the LAST completed execution: operator-level time
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/sql?length=200&details=true&planDescription=false"
    ) as r:
        sqls = json.loads(r.read())
    if sqls:
        last = max(sqls, key=lambda e: e["id"])
        print(f"\nSQL execution {last['id']} ({last.get('duration')}ms) node metrics:")
        rows = []
        for node in last.get("nodes", []):
            for m in node.get("metrics", []):
                v = m.get("value", "")
                if (
                    "total (min, med, max" in m["name"]
                    or "time" in m["name"]
                    or m["name"] == "duration"
                ):
                    rows.append((node["nodeName"], m["name"], v))
        for nn, mn, v in rows:
            v1 = str(v).replace("\n", " ")[:60]
            print(f"  {nn[:44]:44s} {mn[:44]:44s} {v1}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
