"""applyInPandasWithState sessionization: the streamed, incremental operator
must find the same closed sessions as the batch window-function form
(ev_sessionize), modulo sessions still open at end-of-stream.

Runs twice: once on the default HDFS-backed state store and once on the
RocksDB provider (the store a production cluster would use for large state —
rocksdbjni ships with this Spark build)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from datafusion_ballista_dhruvil_spark.operators import load_all
from datafusion_ballista_dhruvil_spark.operators.registry import QUERIES
from datafusion_ballista_dhruvil_spark.streaming.stateful import (
    ROCKSDB_STATE_CONF,
    stream_sessionize,
)

from tests.conftest import SF_DIR

load_all()

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _run_stream(spark, extra_conf: dict[str, str]) -> set[tuple[int, int]]:
    old = {k: spark.conf.get(k, None) for k in extra_conf}
    for k, v in extra_conf.items():
        spark.conf.set(k, v)
    try:
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
        return {
            (r.user_id, r.n_events)
            for r in spark.table(sink).where(F.col("user_id") < 50).collect()
        }
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _batch_closed_sessions(spark) -> set[tuple[int, int]]:
    batch = QUERIES["ev_sessionize"](spark, SF_DIR).collect()
    # batch emits ALL sessions; the stream emits only CLOSED ones (the last
    # session per user stays open pending timeout) -> drop each user's last
    last_session = {}
    for r in batch:
        last_session[r.user_id] = max(r.session_id, last_session.get(r.user_id, 0))
    return {
        (r.user_id, r.n_events) for r in batch if r.session_id < last_session[r.user_id]
    }


@pytest.mark.parametrize(
    "conf", [{}, ROCKSDB_STATE_CONF], ids=["hdfs-store", "rocksdb-store"]
)
def test_stateful_sessionize_matches_batch(spark, conf):
    streamed = _run_stream(spark, conf)
    assert streamed == _batch_closed_sessions(spark)
    assert len(streamed) > 0
