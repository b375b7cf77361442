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


# ---------------------------------------------------------------------------
# Streaming LSH near-dup ingest (streaming/lsh_ingest.py)
# ---------------------------------------------------------------------------


def _batch_candidate_pairs(spark) -> set[tuple[int, frozenset]]:
    """The batch banded-LSH candidate set: unordered co-bucket pairs per
    band, from the same signature pipeline the stream uses."""
    from datafusion_ballista_dhruvil_spark.operators.dedup import (
        _band_signatures,
        _shingle_arrays,
    )

    bands = _band_signatures(_shingle_arrays(spark, SF_DIR)).collect()
    buckets: dict[tuple[int, str], list[int]] = {}
    for r in bands:
        buckets.setdefault((r.band, r.sig), []).append(r.doc_id)
    out: set[tuple[int, frozenset]] = set()
    max_bucket = 0
    for (band, _sig), ids in buckets.items():
        max_bucket = max(max_bucket, len(ids))
        for i, a in enumerate(sorted(ids)):
            for b in sorted(ids)[i + 1 :]:
                out.add((band, frozenset((a, b))))
    # the stream caps bucket state at BUCKET_CAP; equality below is only
    # exact while no bucket exceeds it — fail loudly if the corpus changes
    from datafusion_ballista_dhruvil_spark.streaming.lsh_ingest import BUCKET_CAP

    assert max_bucket <= BUCKET_CAP, f"bucket {max_bucket} exceeds cap"
    return out


def test_streaming_lsh_candidates_match_batch(spark, tmp_path):
    """Any micro-batch split of the corpus must emit exactly the batch
    banded candidate set, as unordered pairs: cross-batch pairs come from
    operator state, intra-batch pairs from the group's own rows."""
    from pyspark.sql import functions as F

    from datafusion_ballista_dhruvil_spark.session import Tables
    from datafusion_ballista_dhruvil_spark.streaming.lsh_ingest import (
        stream_lsh_candidates,
    )

    docs = Tables(spark, SF_DIR).documents.select("doc_id", "text")
    # 4 files -> 4 micro-batches (maxFilesPerTrigger=1); range-split by id
    src = tmp_path / "docs_stream"
    for lo, hi, name in [(0, 125, "a"), (125, 250, "b"), (250, 375, "c"), (375, 10**9, "d")]:
        docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.parquet(str(src / name))
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    n = 0
    for part in sorted(src.rglob("part-*.parquet")):
        shutil.copy(part, flat / f"{n:02d}.parquet")
        n += 1
    assert n == 4

    sink = f"lsh_cand_{uuid.uuid4().hex[:8]}"
    q = (
        stream_lsh_candidates(spark, str(flat), docs.schema)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {
        (r.band, frozenset((r.d_new, r.d_old)))
        for r in spark.table(sink).collect()
    }
    batch = _batch_candidate_pairs(spark)
    assert streamed == batch
    assert len(streamed) > 0


# ---------------------------------------------------------------------------
# transformWithState streak tracker (streaming/streaks.py) — Spark 4's
# StatefulProcessor API, the second stateful-operator surface next to
# applyInPandasWithState above.
# ---------------------------------------------------------------------------


def _batch_streaks(spark) -> set[tuple[int, int, int]]:
    """(user_id, best_streak, n_active_days) from the batch gaps-and-islands
    form (the ev_activity_streaks construction, pre-histogram)."""
    from pyspark.sql.window import Window

    from datafusion_ballista_dhruvil_spark.session import Tables

    t = Tables(spark, SF_DIR)
    days = (
        t.events.where(F.col("user_id") < 50)
        .select("user_id", F.expr("unix_micros(ts) div 86400000000").alias("day_no"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_no")
    isl = days.select(
        "user_id",
        "day_no",
        (F.col("day_no") - F.row_number().over(w)).alias("island"),
    )
    best = (
        isl.groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("run"))
        .groupBy("user_id")
        .agg(F.max("run").alias("best"), F.sum("run").alias("days"))
    )
    return {(r.user_id, r.best, r.days) for r in best.collect()}


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas drives its state server over the "
    "protobuf wire protocol; the 'protobuf' package is absent in this "
    "container (installs prohibited). On a real cluster (pip install "
    "protobuf) this parity test runs as-is.",
)
def test_transform_with_state_streaks_match_batch(spark):
    import uuid as _uuid

    from datafusion_ballista_dhruvil_spark.streaming.streaks import (
        stream_user_streaks,
    )

    sink = f"streaks_{_uuid.uuid4().hex[:8]}"
    q = (
        stream_user_streaks(spark, SF_DIR, user_limit=50)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r.user_id, r.best_streak, r.n_active_days)
        for r in spark.table(sink).collect()
    }
    assert streamed == _batch_streaks(spark)
    assert len(streamed) > 0


def test_streak_processor_kernel_logic():
    """The StatefulProcessor kernel verified directly (no streaming wire —
    that path is protobuf-gated above): consecutive days extend the
    streak, gaps reset it, duplicates and late days are no-ops, state
    round-trips across calls."""
    import pandas as pd

    from datafusion_ballista_dhruvil_spark.streaming.streaks import (
        StreakProcessor,
    )

    class FakeState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeState()

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.state

    p = StreakProcessor()
    h = FakeHandle()
    p.init(h)
    # batch 1: days 10, 11, 13 -> streak 2 then reset to 1; 3 active days
    [out1] = list(
        p.handleInputRows((7,), iter([pd.DataFrame({"day_no": [11, 10, 13]})]), None)
    )
    assert out1.iloc[0].to_dict() == {
        "user_id": 7, "best_streak": 2, "cur_streak": 1, "n_active_days": 3,
    }
    # batch 2: 14 extends (13,14), late 12 and dup 13 are no-ops, 15 extends
    [out2] = list(
        p.handleInputRows(
            (7,), iter([pd.DataFrame({"day_no": [14, 12, 13, 15]})]), None
        )
    )
    assert out2.iloc[0].to_dict() == {
        "user_id": 7, "best_streak": 3, "cur_streak": 3, "n_active_days": 5,
    }
    assert h.state.v == (15, 3, 3, 5)
