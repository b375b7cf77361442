"""applyInPandasWithState sessionization: the streamed, incremental operator
must find the same closed sessions as the batch window-function form
(ev_sessionize), modulo sessions still open at end-of-stream."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from datafusion_ballista_dhruvil_spark.operators import load_all
from datafusion_ballista_dhruvil_spark.operators.registry import QUERIES
from datafusion_ballista_dhruvil_spark.streaming.stateful import stream_sessionize

from tests.conftest import SF_DIR

load_all()


def test_stateful_sessionize_matches_batch(spark):
    sink = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        stream_sessionize(spark, SF_DIR, user_limit=50)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)  # NoTimeout path: AvailableNow self-terminates
    streamed = {
        (r.user_id, r.n_events)
        for r in spark.table(sink).where(F.col("user_id") < 50).collect()
    }

    batch = QUERIES["ev_sessionize"](spark, SF_DIR).collect()
    # batch emits ALL sessions; the stream emits only CLOSED ones (the last
    # session per user stays open pending timeout) -> drop each user's last
    last_session = {}
    for r in batch:
        last_session[r.user_id] = max(r.session_id, last_session.get(r.user_id, 0))
    batch_closed = {
        (r.user_id, r.n_events) for r in batch if r.session_id < last_session[r.user_id]
    }

    assert streamed == batch_closed
    assert len(streamed) > 0
