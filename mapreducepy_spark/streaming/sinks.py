"""Streaming sinks (SURVEY.md §2.9 T4/T5 — the sink half).

Structured Streaming's file sinks append; a failure BETWEEN the sink
write and the checkpoint commit replays the micro-batch on restart,
and a plain append sink then holds the batch twice. The production
answer is an IDEMPOTENT ``foreachBatch`` sink: key the physical
layout on ``batch_id`` so a replayed batch overwrites bit-identical
data instead of duplicating it — exactly-once END-TO-END from
at-least-once delivery plus idempotent writes (the standard Spark
recipe; same reasoning as the deterministic md5 samplers: re-running
must not change what's on disk).

At 100 TB/day the same shape holds: each micro-batch writes its own
``batch_id=N`` directory (a few files per trigger), readers see a
plain partitioned parquet dataset, and compaction is an offline
rewrite that never races the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_batch_idempotent(out_dir: str):
    """The ``foreachBatch`` function: overwrite THIS batch's own
    partition directory. Replaying batch N rewrites ``batch_id=N``
    with identical content — never appends a duplicate. Exposed
    standalone so tests (and recovery tooling) can invoke a replay
    directly."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    return write


def start_idempotent_parquet_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Drain a (bounded) stream into a batch-id-partitioned parquet
    dataset with exactly-once semantics (AvailableNow trigger; the
    checkpoint makes restarts resume, the idempotent writer makes
    replays harmless)."""
    return (
        stream_df.writeStream.foreachBatch(write_batch_idempotent(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
