"""Streaming sinks: the exactly-once foreachBatch pattern.

The reference engine is batch-only (SURVEY.md §1.1) and its serving side
returns Arrow Flight streams; a production Spark pipeline lands streaming
results in a table. Structured Streaming's parquet sink is append-only
exactly-once, but real pipelines need arbitrary writers (MERGE into a
table, JDBC, multi-table fan-out) — the canonical recipe is
``foreachBatch`` + an IDEMPOTENT epoch-keyed write:

- the checkpoint guarantees each micro-batch is delivered with a stable
  ``epoch_id`` (replayed after failure with the SAME id and contents);
- the writer makes the epoch's output a deterministic function of the
  epoch: here, ``mode("overwrite")`` into ``<out>/epoch=<id>`` — a replay
  rewrites the same directory byte-for-byte instead of duplicating rows.

Together: at-least-once delivery x idempotent write = exactly-once output.
tests/test_streaming.py proves it by running the sink twice from one
checkpoint (the restart must add NOTHING) and diffing the landed rows
against the batch read of the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def start_exactly_once_parquet_sink(
    stream_df: DataFrame, out_path: str, checkpoint: str
) -> StreamingQuery:
    """Land a stream into ``out_path`` exactly-once via epoch-keyed
    idempotent overwrites. Read the result back with
    ``spark.read.parquet(out_path)`` (``epoch`` appears as a partition
    column). Uses Trigger.AvailableNow: processes everything available,
    then stops — the backfill/catch-up shape."""

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_path}/epoch={epoch_id}")

    return (
        stream_df.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
