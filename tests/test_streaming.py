"""Structured Streaming parity: the tumbling-window aggregation produces the
same result via readStream + Trigger.AvailableNow as via batch.

The reference has no streaming surface (SURVEY.md §1.1) — this covers the
engine's beyond-reference event-stream capability.
"""

from __future__ import annotations

import uuid

from datafusion_ballista_dhruvil_spark.session import Tables
from datafusion_ballista_dhruvil_spark.streaming.events import (
    build_tumbling_counts,
    stream_tumbling_counts,
)

from tests.conftest import SF_DIR


def test_stream_matches_batch(spark):
    sink = f"stream_sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream_tumbling_counts(spark, SF_DIR)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = sorted(map(tuple, spark.table(sink).collect()))

    batch_rows = sorted(
        map(tuple, build_tumbling_counts(Tables(spark, SF_DIR).events).collect())
    )
    assert len(stream_rows) == len(batch_rows) > 0
    assert stream_rows == batch_rows


def test_stream_dedup_within_watermark(spark):
    from pyspark.sql import functions as F

    from datafusion_ballista_dhruvil_spark.streaming.events import stream_dedup_events

    sink = f"dedup_sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream_dedup_events(spark, SF_DIR)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    deduped = spark.table(sink)
    batch = Tables(spark, SF_DIR).events

    n_dedup = deduped.count()
    n_batch = batch.count()
    assert n_dedup == n_batch > 0  # doubled input collapsed to distinct
    assert deduped.select("event_id").distinct().count() == n_batch
    # spot-check content parity on a slice
    s = sorted(map(tuple, deduped.where(F.col("event_id") < 100).select("event_id", "user_id", "event_type").collect()))
    b = sorted(map(tuple, batch.where(F.col("event_id") < 100).select("event_id", "user_id", "event_type").collect()))
    assert s == b
