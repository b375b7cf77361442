"""Multimodal (image/audio/video) column plumbing (north-star extensions;
BASELINE.json).

Media are opaque ``binary`` payloads with a typed metadata struct; the
Spark-side plumbing — schema, partitioning, Arrow-batched UDF signature,
batch shape — is real and tested. The actual byte decoding (image decode,
audio resample, video frame extraction) is STUBBED with a deterministic fake
because codec libraries are not available in this container; the stub is
clearly marked and raises/flags when a real decoder is expected.

Scale posture at 100 TB:
- payloads live in their own column so column pruning keeps metadata-only
  queries from ever reading bytes;
- decode runs in ``mapInPandas`` (Arrow batches, no per-row Python overhead)
  and is map-only — no shuffle touches raw bytes;
- frame sampling emits (doc, offset) index rows, not byte slices, so the
  shuffle after sampling carries only coordinates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_ballista_dhruvil_spark.operators.registry import query
from datafusion_ballista_dhruvil_spark.session import Tables

#: set True only when a real decoder (PIL/ffmpeg/...) is installed.
REAL_DECODERS_AVAILABLE = False


def with_payload(documents: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    In production the payload column comes straight from the source (image
    bytes etc.); here the documents' utf-8 bytes stand in. The metadata
    struct mirrors what an ingestion service would attach.
    """
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        "doc_id",
        "source",
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            F.md5(F.col("text")).alias("checksum"),
        ).alias("meta"),
    )


# --------------------------------------------------------------------------
@query(
    "mm_metadata_stats",
    oracle="""
SELECT source,
  COUNT(*) AS n_assets,
  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
  CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
  COUNT(DISTINCT md5(text)) AS n_unique_payloads
FROM documents
GROUP BY source
ORDER BY source
""",
)
def mm_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over binary assets: byte totals + payload dedup
    counts per source. Reads only the metadata struct (column pruning keeps
    payload bytes out of the scan in a real split-column layout)."""
    t = Tables(spark, sf_dir)
    assets = with_payload(t.documents)
    return (
        assets.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(F.col("meta.n_bytes")).cast("bigint").alias("total_bytes"),
            F.max(F.col("meta.n_bytes")).cast("bigint").alias("max_bytes"),
            F.countDistinct(F.col("meta.checksum")).alias("n_unique_payloads"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
@query(
    "mm_frame_sample",
    oracle="""
SELECT doc_id, octet_length(encode(text)) AS n_bytes,
       len(range(0, octet_length(encode(text)), 64)) AS n_frames,
       array_to_string(range(0, octet_length(encode(text)), 64), ',') AS frame_offsets
FROM documents
WHERE doc_id < 100
ORDER BY doc_id
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame/window sampling plan over binary payloads: emit evenly-spaced
    byte offsets (one per 'frame'); downstream decode fetches only those
    ranges. Pure expression work — the payload itself is never shuffled."""
    t = Tables(spark, sf_dir)
    assets = with_payload(t.documents).where(F.col("doc_id") < 100)
    n_bytes = F.col("meta.n_bytes")
    # zero-byte payloads get an empty offset list (sequence(0,-1,64) throws)
    offsets = F.when(
        n_bytes > 0, F.sequence(F.lit(0), n_bytes - 1, F.lit(64))
    ).otherwise(F.array().cast("array<int>"))
    return assets.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.array_size(offsets).alias("n_frames"),
        F.array_join(offsets, ",").alias("frame_offsets"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
@query(
    "mm_resize_thumbnail",
    oracle="""
SELECT doc_id, length(text) AS orig_chars,
       length(thumb) AS thumb_chars, md5(thumb) AS thumb_md5
FROM (
  SELECT doc_id, text,
         array_to_string(list_transform(range(1, least(length(text), 1024) + 1, 4),
                                        i -> substring(text, i, 1)), '') AS thumb
  FROM documents WHERE doc_id < 200
)
ORDER BY doc_id
""",
)
def mm_resize_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample stage via mapInPandas — crop to the first 1024
    units and keep every 4th (a 4:1 'thumbnail').

    The downsample here runs on the decoded characters so it is exactly
    reproducible in the oracle (a hash-verified mapInPandas stage, not a
    rows-only stub); a real image resize swaps the batch body for
    PIL.Image.resize over decoded pixels with the same (binary in, typed
    row out) plumbing. Map-only: no shuffle ever carries the payload;
    output rows carry sizes + digest, not bytes.
    """

    def resize_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in it:
            s = pdf["payload"].map(lambda b: bytes(b).decode("utf-8"))
            thumb = s.map(lambda x: x[:1024:4])
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_chars": s.str.len().astype("int64"),
                    "thumb_chars": thumb.str.len().astype("int64"),
                    "thumb_md5": thumb.map(
                        lambda x: hashlib.md5(x.encode("utf-8")).hexdigest()
                    ),
                }
            )

    t = Tables(spark, sf_dir)
    assets = with_payload(t.documents).where(F.col("doc_id") < 200)
    return (
        assets.select("doc_id", "payload")
        .mapInPandas(
            resize_batch,
            schema="doc_id long, orig_chars long, thumb_chars long, thumb_md5 string",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
@query(
    "mm_decode_features",
    oracle="""
SELECT doc_id,
  CAST((octet_length(encode(text)) % 640) + 1 AS BIGINT) AS width,
  CAST((octet_length(encode(text)) % 480) + 1 AS BIGINT) AS height,
  CASE WHEN octet_length(encode(text)) = 0 THEN 0.0
       ELSE CAST(list_sum(list_transform(string_split(text, ''), c -> ord(c)))
                 AS DOUBLE) / octet_length(encode(text))
  END AS mean_byte,
  TRUE AS decode_ok
FROM documents WHERE doc_id < 200
ORDER BY doc_id
""",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    STUBBED decode (deterministic fake features: dimensions from payload
    length, a brightness proxy from byte values) — the Spark plumbing
    (binary column in, typed feature schema out, map-only execution) is the
    real deliverable; swap the body for PIL/libav when available.

    The stub features are exact byte math (integer byte-sum / length), so
    they hash-check against a DuckDB oracle: the test corpus is ASCII, so
    per-character code points == payload bytes. The byte sums are computed
    vectorized — one np.frombuffer over the whole Arrow batch + segmented
    reduceat — not a per-row Python loop.

    The batch fn is nested so cloudpickle ships it BY VALUE: Spark's Python
    workers don't have this package on their path when the driver is
    launched from outside the repo.
    """
    real_decoders = REAL_DECODERS_AVAILABLE

    def decode_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            if real_decoders:  # pragma: no cover
                raise NotImplementedError("plug a real decoder (PIL/ffmpeg) here")
            n = pdf["payload"].str.len().to_numpy()
            joined = _np.frombuffer(
                b"".join(pdf["payload"]), dtype=_np.uint8
            ).astype(_np.int64)
            offsets = _np.zeros(len(n), dtype=_np.int64)
            if len(n) > 1:
                _np.cumsum(n[:-1], out=offsets[1:])
            # reduceat only over the non-empty rows: their offsets are
            # strictly increasing and in-bounds (empty rows contribute no
            # bytes), so each segment sums exactly one payload.
            nz = n > 0
            sums = _np.zeros(len(n), dtype=_np.int64)
            if nz.any():
                sums[nz] = _np.add.reduceat(joined, offsets[nz])
            mean_byte = _np.where(nz, sums / _np.maximum(n, 1), 0.0)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": (pdf["payload"].str.len() % 640) + 1,
                    "height": (pdf["payload"].str.len() % 480) + 1,
                    "mean_byte": mean_byte,
                    "decode_ok": True,
                }
            )

    t = Tables(spark, sf_dir)
    assets = with_payload(t.documents).where(F.col("doc_id") < 200)
    return assets.select("doc_id", "payload").mapInPandas(
        decode_batch,
        schema="doc_id long, width long, height long, mean_byte double, decode_ok boolean",
    )
