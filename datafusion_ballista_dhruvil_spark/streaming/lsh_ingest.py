"""Streaming near-dup ingest: MinHash-LSH candidate detection as a custom
stateful operator (``applyInPandasWithState``), the streaming form of
operators/dedup.dedup_incremental_lsh.

A production ingest pipeline receives document micro-batches continuously
and must answer "does this doc near-duplicate ANYTHING already ingested?"
without ever re-pairing the corpus against itself. Batch re-runs (the
dedup_incremental_lsh shape) re-scan the corpus signatures each batch;
here the corpus lives as OPERATOR STATE keyed by (band, signature):

- map-side per-doc banded MinHash signatures (dedup.row_band_signatures —
  no aggregate before the stateful stage, so the query plan has exactly
  one stateful operator);
- state per (band, sig) bucket = the doc_ids previously seen in that
  bucket (capped at BUCKET_CAP smallest ids — the MAX_BUCKET_DOCS guard's
  streaming analogue, same deterministic keep-smallest rule);
- an arriving doc emits one candidate row per already-seen doc in its
  bucket, then joins the bucket.

Emission invariant (what the stream==batch test asserts): over any split
of the corpus into micro-batches, in ANY arrival order, the set of
UNORDERED candidate pairs {a, b} per band equals the batch banded-LSH
candidate set — each co-bucket pair is emitted exactly once, by whichever
member arrives last (ties within a batch resolved by ascending doc_id).

Scale posture: state is sharded by (band, sig) across executors — the
natural LSH partitioning; per-key state is a bounded id list (bytes), so
total state is O(corpus * BANDS) ids in the state store (RocksDB-backed
on a real cluster: disk-bounded, changelog-checkpointed — see
stateful.ROCKSDB_STATE_CONF). Candidate verification (exact Jaccard)
joins the emitted pairs against the shingle-set table downstream, exactly
as the batch pipeline does; candidates are the streaming-hard part
because only they need cross-batch memory.

The reference engine is batch-only (SURVEY.md §1.1); this operator is
beyond-reference capability, paired with dedup_incremental_lsh the way
stateful.sessionize_stateful pairs with ev_sessionize.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from datafusion_ballista_dhruvil_spark.operators.dedup import (
    row_band_signatures,
    shingle_arrays_of,
)

#: per-(band, sig) state cap: smallest ids win (deterministic, mirrors
#: MAX_BUCKET_DOCS). A bucket at the cap is a degenerate boilerplate
#: signature; its exact-dup mass is handled upstream by exact dedup.
BUCKET_CAP = 64

OUTPUT_SCHEMA = "d_new bigint, d_old bigint, band int"
STATE_SCHEMA = "ids string"


def lsh_candidates_stateful(band_sigs: DataFrame) -> DataFrame:
    """Stateful candidate emission over a (doc_id, band, sig) stream."""

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band, _sig = key
        incoming: set[int] = set()
        for pdf in pdfs:
            incoming.update(int(v) for v in pdf["doc_id"])
        existing: list[int] = []
        if state.exists:
            (ids_str,) = state.get
            if ids_str:
                existing = [int(x) for x in ids_str.split(",")]

        d_new: list[int] = []
        d_old: list[int] = []
        seen = list(existing)
        for d in sorted(incoming):
            for o in seen:
                if o != d:
                    d_new.append(d)
                    d_old.append(o)
            seen.append(d)

        keep = sorted(set(existing) | incoming)[:BUCKET_CAP]
        state.update((",".join(map(str, keep)),))
        if d_new:
            yield pd.DataFrame(
                {"d_new": d_new, "d_old": d_old, "band": [int(band)] * len(d_new)}
            )

    return band_sigs.groupBy("band", "sig").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_lsh_candidates(
    spark: SparkSession, docs_dir: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """readStream over a directory of document parquet files; each file
    becomes (at most) one micro-batch, so a multi-file corpus exercises
    genuine cross-batch state."""
    from datafusion_ballista_dhruvil_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(docs_dir)
    )
    return lsh_candidates_stateful(row_band_signatures(shingle_arrays_of(raw)))
