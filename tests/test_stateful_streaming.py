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
