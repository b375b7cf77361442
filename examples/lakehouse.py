"""Lakehouse example: the snapshot manifest-log table format end-to-end —
transactional commits, time travel, the Python DataSource provider, and
an exactly-once streaming ingest.

Run: python examples/lakehouse.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from datafusion_ballista_dhruvil_spark.session import create_session, Tables
    from datafusion_ballista_dhruvil_spark.sources import snapshots
    from datafusion_ballista_dhruvil_spark.sources.pysource import register

    spark = create_session(app_name="lakehouse-example", shuffle_partitions=8)
    t = Tables(spark, sf_dir)
    root = os.path.join(tempfile.mkdtemp(prefix="lakehouse_"), "docs")

    # transactional commits: append, then an overwrite that edits rows
    docs = t.documents.select("doc_id", "lang", "n_chars")
    v0 = snapshots.commit(docs.where(F.col("doc_id") % 2 == 0), root, "append")
    v1 = snapshots.commit(docs, root, "overwrite")
    print("history:", [(h["snapshot_id"], h["op"]) for h in snapshots.history(root)])

    # time travel through the built-in reader
    print("v0 rows:", snapshots.read_snapshot(spark, root, version=v0).count())
    print("v1 rows:", snapshots.read_snapshot(spark, root, version=v1).count())

    # the same table through the pluggable Python DataSource (one input
    # partition per data file, Arrow-batch ingest)
    register(spark)
    df = spark.read.format("snapshot_log").option("version", v0).load(root)
    print(
        "datasource v0:",
        df.groupBy("lang").count().orderBy("lang").limit(3).collect(),
    )

    # exactly-once streaming ingest: each micro-batch commits as one
    # snapshot carrying its batch_id; a checkpoint replay publishes nothing
    from datafusion_ballista_dhruvil_spark.streaming.sinks import (
        start_snapshot_log_sink,
    )

    stream_root = os.path.join(tempfile.mkdtemp(prefix="lakehouse_"), "events")
    ck = tempfile.mkdtemp(prefix="lakehouse_ck_")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("event_id", "event_type")
    )
    start_snapshot_log_sink(stream, stream_root, ck).awaitTermination(120)
    print(
        "streamed snapshots:",
        [(h["snapshot_id"], h["op"]) for h in snapshots.history(stream_root)],
        "rows:",
        snapshots.read_snapshot(spark, stream_root).count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
