"""Training-data pipeline example (beyond-reference surface): dedup a
document corpus, find near-duplicate embeddings, and attribute events with
an as-of join — the operators a 100 TB data-curation pipeline runs.

Run: python examples/pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from datafusion_ballista_dhruvil_spark.operators import load_all
from datafusion_ballista_dhruvil_spark.operators.registry import QUERIES
from datafusion_ballista_dhruvil_spark.session import create_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    load_all()
    spark = create_session(app_name="pipeline-example")

    print("== MinHash-LSH near-duplicate candidates ==")
    QUERIES["dedup_minhash_lsh"](spark, sf_dir).show(5, truncate=60)

    print("== Embedding near-duplicates (cosine >= 0.25) ==")
    QUERIES["sim_embedding_neardup"](spark, sf_dir).show(5)

    print("== As-of attribution: click -> latest prior view ==")
    QUERIES["asof_click_attribution"](spark, sf_dir).show(5)

    print("== Language-ID + quality scores ==")
    QUERIES["text_langid"](spark, sf_dir).show(5)

    print("== Gopher-style repetition filter (keep/drop) ==")
    QUERIES["text_repetition_filter"](spark, sf_dir).show(5)

    print("== Benchmark decontamination (5-gram overlap vs eval set) ==")
    QUERIES["text_decontam_overlap"](spark, sf_dir).show(5)

    print("== Mixture rebalancing to uniform language target ==")
    QUERIES["mix_resample_sources"](spark, sf_dir).show()

    print("== K-means assign (IVF training step) ==")
    QUERIES["sim_kmeans_assign"](spark, sf_dir).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
