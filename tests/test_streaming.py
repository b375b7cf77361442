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
