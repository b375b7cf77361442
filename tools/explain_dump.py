"""Dump .explain("formatted") for registry queries to plans/<tag>/.

Usage: python tools/explain_dump.py <tag> <suffix> [names...]
  tag     e.g. r10  -> writes plans/r10/<name>_<suffix>.txt
  suffix  e.g. before | after
  names   registry query names; with none given, dumps every query.

Plan capture constructs the DataFrame and explains it without running the
result's action. NOTE (r11): construction is NOT always free — queries that
run their fixed point driver-side on collected metadata (ev_markov_*,
sim_pca_power_iteration) execute their bounded corpus-pass jobs at build
time. Caches stay unmaterialized (eager materialization is deferred to the
first action via owned_result's ``prepare``), and any owned registrations
are dropped via release_owned() after each capture, so nothing pins the
session. The formatted plan is the AQE initial plan (isFinalPlan=false),
which is what the plan-shape claims in OPTIMIZATION_*.md reference.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, here)
    from datafusion_ballista_dhruvil_spark.operators import load_all
    from datafusion_ballista_dhruvil_spark.operators.registry import QUERIES
    from datafusion_ballista_dhruvil_spark.session import create_session

    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or list(QUERIES)
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = create_session(app_name="explain_dump")
    import contextlib
    import io

    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        if hasattr(df, "release_owned"):
            df.release_owned()
        print(path)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
