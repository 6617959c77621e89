"""Stream-stream joins over the ``events`` schema (SURVEY.md §2.9
T-family): the streaming twin of the batch attribution pair space.

The batch ``events_attribution`` operator answers "which single view
gets credit" with a join-free carried timeline; its streaming twin
cannot carry unbounded per-user state forward, so it uses Spark's
watermarked stream-stream INTERVAL JOIN instead: every
(purchase, view) pair within the lookback is emitted as it becomes
known, and last-touch selection happens downstream (a keyed compact
over purchase_id — trivially idempotent because later views for the
same purchase arrive before the watermark closes the interval).

State-boundedness is the whole design: the time-range predicate
``view_ts BETWEEN purchase_ts - lookback AND purchase_ts`` plus a
watermark on BOTH inputs lets Spark evict any buffered row once the
watermark passes its join interval — state is O(events inside one
lookback window per active user), never O(history). Without the
range condition the join would buffer both streams forever.

The join algebra is mode-agnostic (the ``streaming/windows.py``
rule): the same builder applied to two batch DataFrames produces the
batch pair space, which is exactly how ``tests/test_streaming.py``
checks it — replay the parquet fixture through a file-source stream
and compare against the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.temporal import _ATTR_LOOKBACK_US


def attribution_pairs(purchases: DataFrame, views: DataFrame) -> DataFrame:
    """All (purchase, view-within-lookback) candidate pairs for the
    same user — the streaming interval join.

    Inputs are events-shaped frames already filtered to their type
    and (when streaming) already watermarked by the caller; the
    equi-key is ``user_id`` and the interval is the batch operator's
    12-hour ``_ATTR_LOOKBACK_US``, so both twins describe the same
    pair space. Inner join: purchases with no prior view simply
    produce no row (the batch op reports those as NULL credit — the
    outer behavior needs the watermark-delayed null emission and is
    deliberately out of scope for the pair-space twin).
    """
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (
            # microsecond interval, NOT a // 1_000_000 to seconds:
            # the batch twin's lookback is a µs constant, and a
            # silent truncation here would diverge the two pair
            # spaces on any non-whole-second tuning
            F.col("view_ts")
            >= F.col("purchase_ts")
            - F.expr(f"INTERVAL {_ATTR_LOOKBACK_US} MICROSECOND")
        )
    )
    age_us = F.unix_micros("purchase_ts") - F.unix_micros("view_ts")
    return p.join(v, cond, "inner").select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "view_id",
        "view_ts",
        (age_us.cast("double") / 1000000.0).alias("age_sec"),
    )


def last_touch(pairs: DataFrame) -> DataFrame:
    """Batch-side last-touch compaction of the pair space: the most
    recent view (ties broken by largest view_id — the
    ``events_attribution`` DESC/DESC rule) per purchase. Kept as a
    separate batch step because an aggregation chained after a
    stream-stream join can only emit in append mode once the
    watermark closes, which a bounded replay never guarantees for
    the tail — production pipelines run this as the idempotent
    keyed compact on the sink table.
    """
    return (
        pairs.groupBy("purchase_id", "user_id", "purchase_ts")
        .agg(
            F.max(F.struct("view_ts", "view_id")).alias("best"),
        )
        .select(
            "purchase_id",
            "user_id",
            "purchase_ts",
            F.col("best.view_id").alias("view_id"),
            F.col("best.view_ts").alias("view_ts"),
        )
    )


def pit_enrich(events: DataFrame, versions: DataFrame) -> DataFrame:
    """Stream-STATIC point-in-time enrichment: each (sharded) event
    picks the SCD2 dimension version valid at its timestamp — the
    online half of ``operators.cdc.join_point_in_time`` (whose batch
    backfill fuses derivation and probe into one window; a live
    stream probes the MATERIALIZED dimension instead).

    Stream-static joins keep NO state: every micro-batch joins
    against the static table as-of that batch, which is exactly the
    feature-store read path (the dimension is broadcast when small —
    at 100 TB of events the static version table is keys × versions,
    usually broadcastable; otherwise it shuffles once per batch).
    The interval predicate (non-equi on ts) is allowed because the
    static side needs no watermark eviction. LEFT join keeps
    pre-first-version events with NULL attributes — the batch twin's
    contract, replay-pinned by tests/test_streaming.py.
    """
    e = events.filter(
        F.col("user_id").isNotNull() & (F.col("user_id") % 10 == 0)
    ).alias("e")
    v = versions.alias("v")
    return e.join(
        v,
        (F.col("e.user_id") == F.col("v.custkey"))
        & (F.col("v.valid_from") <= F.col("e.ts"))
        & (
            F.col("v.valid_to").isNull()
            | (F.col("e.ts") < F.col("v.valid_to"))
        ),
        "left",
    ).select(
        "e.event_id",
        "e.user_id",
        "e.ts",
        "v.version",
        "v.orderkey",
        "v.valid_from",
    )
