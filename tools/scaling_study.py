"""Cross-scale timing study: the same queries at sf0.001 / sf0.01 / sf0.1
(a genuine 100x input-size range from the driver's own testdata) — measured
evidence for the 100 TB scaling claims in PERF.md.

For each representative query, reports wall seconds at each scale and the
sf0.01->sf0.1 growth factor (the 10x step where fixed overhead no longer
dominates). A map-only / well-partitioned operator should grow ~linearly
(factor <= ~10, usually far less because local[32] has idle slots at small
scale); a quadratic pair-explosion or few-groups collapse shows up as a
factor far above 10.

Usage: python tools/scaling_study.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

DEFAULT = [
    # scans + aggregation (TPC-H canonical)
    "q1",
    "q6",
    # joins incl. broadcast dims
    "q3",
    "q9",
    # dedup family (LSH equi-join, banded simhash, Pregel CC)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_cluster_cc",
    # similarity (map-only kernels, bucketed ANN, PQ)
    "sim_cosine_topk",
    "sim_ann_bucketed",
    "sim_pq_adc",
    # text + multimodal map-only pipelines
    "text_quality_classifier",
    "text_tfidf_topterms",
    "mm_image_ahash",
    # windows/sessionization over events
    "ev_sessionize",
    "ev_dau_wau_mau",
]


def main(names: list[str]) -> None:
    from datafusion_ballista_dhruvil_spark.operators import load_all, registry
    from datafusion_ballista_dhruvil_spark.session import create_session

    load_all()
    spark = create_session(app_name="scaling-study")
    spark.range(10).count()  # warm the session
    rows = []
    for name in names:
        fn = registry.QUERIES[name]
        times = []
        for sf in SCALES:
            # warm once (parquet footer cache, worker spin-up), time second
            fn(spark, sf).collect()
            t0 = time.perf_counter()
            fn(spark, sf).collect()
            times.append(round(time.perf_counter() - t0, 3))
        growth = round(times[2] / times[1], 2) if times[1] > 0 else None
        rows.append({"query": name, "sf0.001": times[0], "sf0.01": times[1],
                     "sf0.1": times[2], "x10_growth": growth})
        print(json.dumps(rows[-1]), flush=True)
    spark.stop()
    print("\n| query | sf0.001 | sf0.01 | sf0.1 | 10x growth |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['query']} | {r['sf0.001']:.2f} | {r['sf0.01']:.2f} "
            f"| {r['sf0.1']:.2f} | {r['x10_growth']} |"
        )


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT)
