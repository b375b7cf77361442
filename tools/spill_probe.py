"""Spill-resilience probe: run a shuffle-heavy sort + aggregation in a
DELIBERATELY memory-starved JVM and assert (a) results are exactly right
and (b) Spark actually SPILLED — proving the engine's plans degrade to
disk under pressure instead of OOMing, the property that separates
"works at sf0.1" from "survives a 100 TB skewed partition". (The r4
salted stress found real OOMs; this probe pins the fixed behavior.)

Run standalone (own JVM — needs its own tiny driver memory):
python tools/spill_probe.py
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = "1g"
    from pyspark.sql import functions as F

    from datafusion_ballista_dhruvil_spark.plans.metrics import executed_metrics
    from datafusion_ballista_dhruvil_spark.session import create_session

    spark = create_session(
        app_name="spill-probe",
        shuffle_partitions=4,
        extra_conf={
            # squeeze execution memory so the sort MUST spill
            "spark.memory.fraction": "0.2",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    # ~2M distinct string-keyed groups with fat values: the hash
    # aggregate's build map cannot fit 20% of a 1 GiB heap, so it MUST
    # fall back to sort-based aggregation and spill (a partial-agg
    # pre-collapse is impossible — every key is ~unique per partition)
    n = 6_000_000
    df = (
        spark.range(0, n, numPartitions=4)
        .select(
            F.pmod(F.xxhash64("id"), 2_000_000).alias("k"),
            F.concat(F.lit("pad_" * 16), F.col("id")).alias("payload"),
        )
        .groupBy("k")
        .agg(F.max("payload").alias("m"), F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("c").alias("n_rows"),
            F.sum(F.length("m")).alias("payload_bytes"),
        )
    )
    row = df.collect()[0]
    assert row.n_rows == n, row
    assert row.n_groups > 1_800_000, row  # xxhash64 covers ~all buckets

    # the executed plan's SQLMetrics carry per-operator spill sizes
    total_spill = sum(
        v
        for node in executed_metrics(df)
        for label, v in node["metrics"].items()
        if "spill" in label.lower()
    )
    print(f"rows_ok=True total_spill_bytes={total_spill}")
    assert total_spill > 0, "expected the starved sort to spill"
    print("SPILL_OK")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
