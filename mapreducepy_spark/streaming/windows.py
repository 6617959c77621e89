"""Streaming window/stateful operators over the ``events`` schema.

Every builder takes an events-shaped DataFrame (batch or streaming —
the algebra is mode-agnostic; Spark plans stateful incremental
execution when the input is a stream). Watermarks bound state: at
100 TB/day the state store only retains windows newer than the
watermark, so state size is O(active windows), not O(history).

Tested in ``tests/test_streaming.py`` by replaying the parquet
fixture through a file-source stream (``Trigger.AvailableNow``) into
a memory sink and comparing against the batch twin on the same data.

Late-data caveat for ARBITRARY-state operators (measured, round 9):
Spark's built-in late-row filter for ``applyInPandasWithState`` uses
the PREVIOUS micro-batch's watermark (the "late events" watermark
lags the "eviction" watermark by one batch), so a sub-watermark row
arriving in the batch right after a watermark jump IS delivered to
the user function. Windowed aggregations/joins are unaffected (their
operators handle it), but every custom-state function here drops
sub-watermark rows itself — re-admitting one can double-emit a
closed result or corrupt state. Both drops are replay-pinned by
mutation-checked tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..rounding import dround


def read_events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events parquet directory.

    Schema is taken from a batch read of the same path (file sources
    require an explicit schema). ``maxFilesPerTrigger`` simulates
    arrival in micro-batches; the production source would be Kafka
    with the same downstream algebra.
    """
    schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(events_dir)
    # same ns→µs rebuild as io.load (parquet TIMESTAMP(NANOS) arrives
    # as long under spark.sql.legacy.parquet.nanosAsLong)
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def with_watermark(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """T4 — declare event-time + allowed lateness. Events older than
    max(event time seen) − delay are dropped from stateful operators
    downstream; this is what bounds state at scale."""
    return events.withWatermark("ts", delay)


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Streaming twin of ``win_tumbling`` (identical aggregation)."""
    return (
        events.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def ohlc_bars(events: DataFrame) -> DataFrame:
    """Streaming twin of ``events_ohlc`` — delegates to the SHARED
    ``ohlc_aggregate`` expression tree (one place for every
    tie-break/rounding fix; the ``_candidate_jaccard`` rule), applied
    to a watermarked stream.

    State-bounded the same way every windowed aggregate here is: the
    watermark closes bars, so the store holds only open bars; the
    struct min/max combine state is 4 small fields per (bar, type) —
    the same incremental merge the batch SortAggregate does map-side.
    NULL event times never reach the operator (the watermark drops
    them — the shared helper also filters them for the batch path).
    """
    from ..operators.temporal import ohlc_aggregate

    return ohlc_aggregate(events)


def sliding_sums(events: DataFrame) -> DataFrame:
    """Streaming twin of ``win_sliding`` (10 min window, 5 min slide)."""
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "n_events", "sum_value")
    )


def session_stats(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming session windows (native ``session_window`` operator —
    the stateful twin of the batch lag/cumsum formulation in
    ``operators/temporal.py::win_session``)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """T5 — stateful exact dedup on event_id within the watermark
    horizon. State = seen keys newer than the watermark; without the
    watermark the state would grow unboundedly."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """T5 — custom stateful operator via ``applyInPandasWithState``:
    per-user running (count, value-total) carried across micro-batches
    in the state store — the arbitrary-state escape hatch for logic
    the built-in stateful operators can't express (rate limiting,
    session enrichment, per-key models).

    State is one (bigint, double) pair per user — O(users), not
    O(events); with timeouts (``GroupStateTimeout.ProcessingTimeTimeout``)
    idle keys expire, which is the state-bounding knob at 100 TB/day.
    Each update emits the new running totals for the key ('update'
    output mode).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        "user_id bigint, n_events bigint, total_value double",
        "n_events bigint, total_value double",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    stream_df: DataFrame,
    query_name: str,
    spark: SparkSession,
    output_mode: str | None = None,
):
    """Drain a (bounded) stream into a memory sink and return the
    results as a batch DataFrame. Output mode 'complete' for
    aggregations keeps the test single-shot; pass ``output_mode``
    explicitly for operators that mandate one (e.g. 'update' for
    ``applyInPandasWithState`` in update mode)."""
    if output_mode is not None:
        mode = output_mode
    else:
        mode = "complete" if stream_df.isStreaming and _has_aggregation(stream_df) else "append"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(120)
    if not finished:
        # On timeout the memory sink is only partially populated;
        # surface that as a hard error rather than returning a frame
        # that flakily mismatches downstream comparisons.
        q.stop()
        raise TimeoutError(
            f"streaming query {query_name!r} did not finish within 120s"
        )
    return spark.sql(f"SELECT * FROM {query_name}")


def _has_aggregation(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().logical().toString()
    return "Aggregate" in plan


def clicks_after_views(events: DataFrame, horizon: str = "10 minutes") -> DataFrame:
    """Stream-stream interval join: each click joined to the same
    user's views in the preceding ``horizon``. Both sides carry
    watermarks, so the state store retains only events inside the
    join horizon — the condition's time bound is what lets Spark
    evict state (an unbounded stream-stream join would grow forever).

    Batch twin: the same expression tree on a static frame (tested
    equal in ``tests/test_streaming.py``).
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", horizon)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", horizon)
    )
    return clicks.join(
        views,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("view_ts") < F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {horizon}")),
    ).select("c_user", "click_id", "click_ts", "view_id", "view_ts")


def views_without_click(events: DataFrame, horizon: str = "10 minutes") -> DataFrame:
    """The LEFT-OUTER side of :func:`clicks_after_views`: views that
    got NO click from the same user within ``horizon`` — the
    conversion-FAILURE rows the inner interval join cannot see.

    In streaming this is the watermarked stream-stream LEFT OUTER
    interval join: a view's NULL-click row is emitted only once the
    watermark proves no qualifying click can still arrive (the state
    store holds one horizon of views, then evicts-with-verdict). The
    time bound is mandatory on the outer side — without it Spark
    rejects the plan, because "no click yet" is undecidable on an
    unbounded wait.

    Batch twin (``events_views_unconverted``): the identical
    predicate as a LEFT ANTI join — same rows, no NULL-column
    filter pass; tests/test_streaming.py pins replay == batch.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", horizon)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", horizon)
    )
    joined = views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") > F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {horizon}")),
        "leftOuter",
    )
    # no-match flag = the JOIN KEY column, not click_id: a matched row
    # can carry a NULL event_id (NULL-id rows are in-contract — the
    # sweeps mint them), but c_user can never be NULL on a match (a
    # NULL key fails the equi condition), so this is the robust form
    # and keeps stream == batch-anti-twin under NULL-id fixtures
    return joined.filter(F.col("c_user").isNull()).select(
        "v_user", "view_id", "view_ts"
    )


def silent_user_alerts(events: DataFrame, threshold_min: int = 360,
                       watermark: str = "1 hour") -> DataFrame:
    """T5 — the EMIT-ON-ABSENCE stateful pattern (heartbeat / gap
    monitor): raise one alert row when a user produces NO event for
    ``threshold_min`` minutes of EVENT time. Every other stateful
    operator in this module emits on arriving data; absence can only
    be observed with an event-time TIMER — the state times out when
    the watermark passes ``last_seen + threshold`` and the key
    received nothing newer, which is exactly
    ``applyInPandasWithState`` + ``EventTimeTimeout``.

    Semantics (pinned by the replay test): an alert (user, last_seen)
    asserts that at the moment the watermark crossed
    ``last_seen + threshold`` the user had produced no event newer
    than ``last_seen``. A user who returns later simply starts a new
    state — silence followed by reappearance yields one alert, which
    is what a monitoring consumer wants.

    Scale: state is ONE bigint per live user and the timer erases it
    at threshold — O(currently-active users), self-bounding; output
    is alert-rate, not event-rate. This is the 100 TB/day shape for
    SLA monitors, heartbeat loss, and session-abandonment triggers.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    thr_ms = int(threshold_min) * 60_000

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (last_us,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([key[0]], dtype="int64"),
                    "last_seen": pd.Series(
                        [last_us], dtype="datetime64[us]"
                    ),
                }
            )
            return
        last_us = state.get[0] if state.exists else None
        # Late-data contract (the burst_alerts rule): Spark's built-in
        # late filter for applyInPandasWithState LAGS one batch (the
        # late-events watermark is the PREVIOUS batch's value), so a
        # sub-watermark row arriving in the batch right after a
        # watermark jump still reaches this function. A below-watermark
        # event carries no admissible liveness evidence — accepting it
        # would overwrite last_seen with stale data (or re-create
        # state after an alert) and corrupt the alert's claim
        # (replay-pinned by the late-event test, mutation-checked).
        wm_us = state.getCurrentWatermarkMs() * 1000
        for pdf in pdfs:
            if len(pdf):
                us = pdf["ts"].astype("datetime64[us]").astype("int64")
                us = us[us > wm_us]
                if not len(us):
                    continue
                mx = int(us.max())
                last_us = mx if last_us is None else max(last_us, mx)
        if last_us is not None:
            state.update((last_us,))
            # Clamp to just past the current watermark: when
            # threshold_min is smaller than the watermark delay (plus
            # event lateness) the raw deadline can be <= the current
            # watermark and Spark throws IllegalArgumentException at
            # runtime (ADVICE r7). The clamp fires the alert at the
            # earliest legal instant instead — semantics preserved
            # ("no event for >= threshold of event time" still holds;
            # the alert is just emitted as soon as it is provable).
            deadline = last_us // 1000 + thr_ms
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(deadline, wm + 1))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "last_seen": pd.Series([], dtype="datetime64[us]"),
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            "user_id bigint, last_seen timestamp",
            "last_us bigint",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def burst_alerts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """T5 — streaming twin of ``events_burst_detect`` (the rate-burst
    monitor, which is natively a streaming concern: the batch key
    certifies the algebra; THIS is how it deploys). Per event type,
    flag a closed 10-minute bucket whose count exceeds 3× the
    trailing mean of the previous (up to 6) CLOSED buckets, with a
    ≥3-bucket cold-start gate — identical semantics to the batch
    key's ``ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING`` frame, because
    buckets close in event-time order so the trailing set is exactly
    the previous active buckets of the same type.

    Why ``applyInPandasWithState`` and not a window aggregate: the
    trailing frame runs OVER the bucket aggregate, and Spark does not
    allow a second stateful window over a streaming aggregation. The
    state carries (open bucket counts, last ≤6 closed counts); a
    bucket is emitted exactly once, when the watermark passes its
    end — arrival-driven when newer data shows up, timer-driven
    (EventTimeTimeout) when the type goes quiet, so a flood followed
    by silence still alarms.

    Scale: state per type is ≤ (open buckets within the lateness
    horizon) + 6 longs — watermark-bounded, O(|types|) keys; output
    is bucket-rate, not event-rate.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    bucket_ms = 600_000
    trail_n, factor, min_trail = 6, 3.0, 3

    def _empty() -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype="object"),
                "bucket": pd.Series([], dtype="datetime64[us]"),
                "n_events": pd.Series([], dtype="int64"),
                "trail_avg": pd.Series([], dtype="float64"),
                "is_burst": pd.Series([], dtype="int32"),
            }
        )

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            starts, counts, trail = state.get
            open_b = dict(zip(starts, counts))
            trail = list(trail)
        else:
            open_b, trail = {}, []
        # Late-data contract: unlike windowed aggregations, Spark does
        # NOT pre-filter sub-watermark rows for applyInPandasWithState
        # — the operator owns that rule. A row whose bucket already
        # closed (bucket end <= watermark) must be DROPPED, not
        # re-opened: re-opening would emit the bucket a second time,
        # breaking the emit-once contract the sink relies on
        # (replay-pinned by the late-data test).
        wm = state.getCurrentWatermarkMs()
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            for t in ts_us:
                b = (int(t) // 1000) // bucket_ms * bucket_ms
                if b + bucket_ms <= wm:
                    continue  # late: its bucket is already closed
                open_b[b] = open_b.get(b, 0) + 1
        rows = []
        for b in sorted(open_b):
            if b + bucket_ms > wm:
                break  # buckets close strictly in event-time order
            n = open_b.pop(b)
            tc = len(trail)
            avg = (sum(trail) / tc) if tc else None
            rows.append(
                (
                    key[0],
                    b * 1000,  # ms -> us for datetime64[us]
                    n,
                    None
                    if avg is None
                    else (int(avg * 1_000_000.0 + 0.5) / 1_000_000.0),
                    1 if (tc >= min_trail and n > factor * avg) else 0,
                )
            )
            trail.append(n)
            trail = trail[-trail_n:]
        if open_b:
            ks = sorted(open_b)
            state.update((ks, [open_b[k] for k in ks], trail))
            # earliest legal instant past the current watermark (the
            # silent_user_alerts clamp, ADVICE r7)
            state.setTimeoutTimestamp(max(ks[0] + bucket_ms, wm + 1))
        elif trail:
            state.update(([], [], trail))  # keep history, no timer
        if not rows:
            yield _empty()
            return
        yield pd.DataFrame(
            {
                "event_type": pd.Series(
                    [r[0] for r in rows], dtype="object"
                ),
                "bucket": pd.Series(
                    [r[1] for r in rows], dtype="datetime64[us]"
                ),
                "n_events": pd.Series([r[2] for r in rows], dtype="int64"),
                "trail_avg": pd.Series(
                    [r[3] for r in rows], dtype="float64"
                ),
                "is_burst": pd.Series([r[4] for r in rows], dtype="int32"),
            }
        )

    return (
        events.filter(
            F.col("ts").isNotNull() & F.col("event_type").isNotNull()
        )
        .withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            fn,
            "event_type string, bucket timestamp, n_events bigint, "
            "trail_avg double, is_burst int",
            "starts array<bigint>, counts array<bigint>, "
            "trail array<bigint>",
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
