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


def band_index_appender(table_name: str):
    """``foreachBatch`` function for CONTINUOUS band-index
    maintenance — the streaming twin of the nightly
    ``llm.dedup.append_band_index`` (VERDICT r12 #5): each micro-batch
    of new documents is shingled→minhashed→banded (delta-sized work)
    and ``insertInto`` the stored bucketed index, so the layout
    contract (probe joins on (band, sig) never re-shuffle the index)
    survives every trigger exactly as it survives the nightly INSERT.

    Delivery semantics, stated honestly: ``insertInto`` is an append,
    so a crash BETWEEN the insert and the checkpoint commit replays
    the batch and duplicates its band rows — at-least-once, not the
    batch_id-keyed overwrite ``write_batch_idempotent`` uses (a
    bucketed table has no per-batch partition to overwrite). That is
    SAFE for this index by construction: every consumer
    (``_incremental_triage``'s partner counts, collision probes)
    aggregates with countDistinct over partner doc_ids, so duplicate
    (doc_id, band, sig) facts can never change a verdict —
    tests/test_round16_refs.py pins exactly this replay invariance.
    An offline compaction (DISTINCT rewrite honoring the bucket spec)
    reclaims the space without racing the stream.

    Reader visibility: the insert runs in the micro-batch's CLONED
    session, which invalidates only its own relation cache — any
    OTHER session already holding the table's file listing must
    ``spark.catalog.refreshTable(name)`` (or re-create the session)
    before it sees the new bands, exactly as with any external
    writer to a shared table.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        from ..llm.dedup import append_band_index

        append_band_index(batch_df.sparkSession, table_name, batch_df)

    return write


def start_band_index_maintenance(
    docs_stream: DataFrame,
    table_name: str,
    checkpoint_dir: str,
):
    """Drain a (bounded) stream of new documents into the persisted
    band index (AvailableNow trigger; the checkpoint makes restarts
    resume where they left off — a finished stream restarted on the
    same checkpoint appends nothing)."""
    return (
        docs_stream.writeStream.foreachBatch(band_index_appender(table_name))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
