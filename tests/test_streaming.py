"""Streaming twins produce the same results as their batch
formulations when the whole fixture is replayed (SURVEY.md §5.2:
streaming ops are tested via micro-batch unit tests, outside
``queries()``)."""

from __future__ import annotations

import shutil

import pytest

from mapreducepy_spark.io import load
from mapreducepy_spark.streaming import windows as sw

from .parity_util import canon_frame


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory, sf_dir):
    # file-source streams want a directory; stage the fixture file
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-000.parquet")
    return str(d)


def _batch_events(spark, sf_dir):
    return load(spark, sf_dir, "events")


def test_tumbling_stream_matches_batch(spark, sf_dir, events_dir):
    stream = sw.read_events_stream(spark, events_dir)
    got = sw.run_available_now(
        sw.tumbling_counts(sw.with_watermark(stream)), "t_tumbling", spark
    ).toPandas()
    want = sw.tumbling_counts(_batch_events(spark, sf_dir)).toPandas()
    assert canon_frame(got) == canon_frame(want)


def test_sliding_stream_matches_batch(spark, sf_dir, events_dir):
    stream = sw.read_events_stream(spark, events_dir)
    got = sw.run_available_now(
        sw.sliding_sums(sw.with_watermark(stream)), "t_sliding", spark
    ).toPandas()
    want = sw.sliding_sums(_batch_events(spark, sf_dir)).toPandas()
    assert canon_frame(got) == canon_frame(want)


def test_session_stream_matches_batch(spark, sf_dir, events_dir):
    stream = sw.read_events_stream(spark, events_dir)
    got = sw.run_available_now(
        sw.session_stats(sw.with_watermark(stream)), "t_session", spark
    ).toPandas()
    want = sw.session_stats(_batch_events(spark, sf_dir)).toPandas()
    assert canon_frame(got) == canon_frame(want)


def test_session_native_agrees_with_batch_lag_formulation(spark, sf_dir):
    """The native session_window operator and the lag/cumsum batch
    formulation (queries()['win_session']) must find the same
    sessions: same count, same per-user totals."""
    from mapreducepy_spark.operators.temporal import win_session

    native = sw.session_stats(_batch_events(spark, sf_dir)).toPandas()
    lag_based = win_session(spark, sf_dir).toPandas()
    assert len(native) == len(lag_based)
    a = native.groupby("user_id")["n_events"].sum().to_dict()
    b = lag_based.groupby("user_id")["n_events"].sum().to_dict()
    assert a == b


def test_streaming_dedup_drops_replayed_batch(spark, events_dir, tmp_path):
    """Replaying the same file twice within the watermark horizon
    yields each event_id once."""
    import shutil as _sh

    d = tmp_path / "dup_events"
    d.mkdir()
    _sh.copy(f"{events_dir}/part-000.parquet", d / "a.parquet")
    _sh.copy(f"{events_dir}/part-000.parquet", d / "b.parquet")
    stream = sw.read_events_stream(spark, str(d))
    got = sw.run_available_now(sw.dedup_events(stream), "t_dedup", spark).toPandas()
    n_unique = spark.read.parquet(str(d)).select("event_id").distinct().count()
    assert len(got) == n_unique
    assert got["event_id"].is_unique


def test_watermark_present_in_plan(spark, events_dir):
    stream = sw.with_watermark(sw.read_events_stream(spark, events_dir), "7 minutes")
    assert "EventTimeWatermark" in stream._jdf.queryExecution().logical().toString()


def test_stateful_running_totals_across_batches(spark, sf_dir, events_dir, tmp_path):
    """applyInPandasWithState carries per-user state across
    micro-batches: replaying the fixture as TWO single-file triggers
    must end at the same totals as one batch groupBy."""
    import shutil as _sh

    import pandas as pd
    from pyspark.sql import functions as F

    d = tmp_path / "two_batches"
    d.mkdir()
    src = f"{events_dir}/part-000.parquet"
    half_a = spark.read.parquet(src).filter(F.col("event_id") % 2 == 0)
    half_b = spark.read.parquet(src).filter(F.col("event_id") % 2 == 1)
    half_a.coalesce(1).write.parquet(str(d / "a"))
    half_b.coalesce(1).write.parquet(str(d / "b"))
    for i, sub in enumerate(("a", "b")):
        for f in (d / sub).glob("*.parquet"):
            _sh.move(str(f), d / f"{i}.parquet")
        _sh.rmtree(d / sub)

    stream = sw.read_events_stream(spark, str(d), max_files_per_trigger=1)
    got = sw.run_available_now(
        sw.running_user_totals(stream), "t_stateful", spark, output_mode="update"
    ).toPandas()
    # 'update' mode emits one row per key per touching batch; the
    # final state is the row with the max running count per user
    final = got.loc[got.groupby("user_id")["n_events"].idxmax()]
    want = (
        _batch_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .toPandas()
    )
    merged = final.merge(want, on="user_id", suffixes=("_got", "_want"))
    assert len(merged) == len(want) == len(final)
    assert (merged["n_events_got"] == merged["n_events_want"]).all()
    # pandas sums pairwise, Spark's fold is sequential — tolerance, not hash
    assert (merged["total_value_got"] - merged["total_value_want"]).abs().max() < 1e-6


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_dir):
    """Clicks⋈views within 10 minutes per user: the streaming
    stream-stream join (stateful, watermark-evicted) must equal the
    same join on the static frame."""
    stream = sw.read_events_stream(spark, events_dir)
    got = sw.run_available_now(
        sw.clicks_after_views(stream), "t_ssjoin", spark
    ).toPandas()
    want = sw.clicks_after_views(_batch_events(spark, sf_dir)).toPandas()
    assert len(got) > 0
    assert canon_frame(got) == canon_frame(want)


def test_attribution_pairs_stream_matches_batch(spark, sf_dir, events_dir):
    """Stream-stream interval join (watermarked both sides) emits
    exactly the batch pair space when the fixture is replayed."""
    from mapreducepy_spark.streaming import joins as sj

    def typed(df, t):
        return df.filter(df.event_type == t)

    stream = sw.read_events_stream(spark, events_dir)
    got = sw.run_available_now(
        sj.attribution_pairs(
            sw.with_watermark(typed(stream, "purchase")),
            sw.with_watermark(typed(stream, "view")),
        ),
        "t_attr_pairs",
        spark,
    ).toPandas()
    batch = _batch_events(spark, sf_dir)
    want = sj.attribution_pairs(
        typed(batch, "purchase"), typed(batch, "view")
    ).toPandas()
    assert len(want) > 0
    assert canon_frame(got) == canon_frame(want)


def test_attribution_stream_across_batches_matches_events_attribution(
    spark, sf_dir, tmp_path
):
    """The full streaming attribution chain, replayed across a
    MICRO-BATCH BOUNDARY (VERDICT r6 work order #7): events split
    into two files consumed one per trigger — so purchases and their
    credited views routinely arrive in different batches and the
    pair must come out of buffered join state — then the idempotent
    last-touch compact over the sink. Must equal the registered
    batch ``events_attribution`` on every purchase with in-window
    credit. This pins the batch-parity anchor for streaming/joins.py
    the way ingest/session twins are pinned."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from mapreducepy_spark.operators.temporal import events_attribution
    from mapreducepy_spark.streaming import joins as sj

    d = tmp_path / "attr_two_batches"
    d.mkdir()
    src = f"{sf_dir}/events.parquet"
    # split BY TIME (first half of the timeline, then the rest), the
    # way a real source delivers: the batch-0 watermark then never
    # marks batch-1 data late, and view state crossing the boundary
    # survives eviction exactly when the 12 h lookback says a future
    # purchase could still claim it — so equality also exercises the
    # watermark-eviction rule, not just the buffered join
    raw = spark.read.parquet(src)
    cut = int(
        raw.selectExpr("median(unix_micros(ts)) AS c").collect()[0].c
    )
    half_a = raw.filter(F.unix_micros("ts") <= cut)
    half_b = raw.filter(F.unix_micros("ts") > cut)
    half_a.coalesce(1).write.parquet(str(d / "a"))
    half_b.coalesce(1).write.parquet(str(d / "b"))
    for i, sub in enumerate(("a", "b")):
        for f in (d / sub).glob("*.parquet"):
            _sh.move(str(f), d / f"{i}.parquet")
        _sh.rmtree(d / sub)

    stream = sw.read_events_stream(spark, str(d), max_files_per_trigger=1)

    def typed(df, t):
        return df.filter(df.event_type == t)

    pairs = sw.run_available_now(
        sj.attribution_pairs(
            sw.with_watermark(typed(stream, "purchase")),
            sw.with_watermark(typed(stream, "view")),
        ),
        "t_attr_xbatch",
        spark,
    )
    got = sj.last_touch(pairs).toPandas()
    want = (
        events_attribution(spark, sf_dir)
        .filter("view_id IS NOT NULL")
        .select("purchase_id", "user_id", "purchase_ts", "view_id", "view_ts")
        .toPandas()
    )
    assert len(want) > 0
    assert canon_frame(got) == canon_frame(want)


def test_last_touch_compact_agrees_with_events_attribution(spark, sf_dir):
    """last_touch over the pair space must pick the same winners as
    the carried-timeline events_attribution (on purchases that have
    at least one in-window view — the pair space is inner)."""
    from mapreducepy_spark.operators.temporal import events_attribution
    from mapreducepy_spark.streaming import joins as sj

    batch = _batch_events(spark, sf_dir)
    pairs = sj.attribution_pairs(
        batch.filter(batch.event_type == "purchase"),
        batch.filter(batch.event_type == "view"),
    )
    got = sj.last_touch(pairs).toPandas()
    want = (
        events_attribution(spark, sf_dir)
        .filter("view_id IS NOT NULL")
        .select("purchase_id", "user_id", "purchase_ts", "view_id", "view_ts")
        .toPandas()
    )
    assert len(want) > 0
    assert canon_frame(got) == canon_frame(want)


def test_ohlc_stream_matches_batch_operator(spark, sf_dir, events_dir):
    """The watermarked streaming OHLC bars must equal the registered
    batch events_ohlc on the same data — the mode-agnostic-algebra
    rule, proven for the struct-argmin open/close semantics."""
    from mapreducepy_spark.registry import load_catalog

    stream = sw.read_events_stream(spark, events_dir)
    got = sw.run_available_now(
        sw.ohlc_bars(sw.with_watermark(stream)), "t_ohlc", spark
    ).toPandas()
    want = load_catalog()["events_ohlc"].builder(spark, sf_dir).toPandas()
    assert canon_frame(got) == canon_frame(want)


def test_foreach_batch_sink_is_exactly_once_under_replay(
    spark, sf_dir, tmp_path
):
    """The idempotent foreachBatch sink: (1) the drained multi-batch
    stream lands EVERY fixture row exactly once in the batch-id-
    partitioned dataset; (2) manually REPLAYING a batch (the
    failure-between-write-and-checkpoint case Structured Streaming's
    at-least-once contract permits) leaves the dataset bit-identical
    — overwrite of the batch's own partition, never an append."""
    import pathlib
    import shutil

    from mapreducepy_spark.streaming import sinks as sk

    # stage the fixture as THREE files + maxFilesPerTrigger=1 so the
    # run genuinely exercises multiple micro-batches
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    for i in range(3):
        shutil.copy(
            f"{sf_dir}/events.parquet", src_dir / f"part-{i:03d}.parquet"
        )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = sw.read_events_stream(
        spark, str(src_dir), max_files_per_trigger=1
    ).select("event_id", "user_id", "ts", "event_type", "value")
    q = sk.start_idempotent_parquet_sink(stream, out, ckpt)
    assert q.awaitTermination(120)

    batches = sorted(p.name for p in pathlib.Path(out).glob("batch_id=*"))
    assert len(batches) >= 2, batches  # multiple micro-batches ran
    got = spark.read.parquet(out)
    n_fixture = load(spark, sf_dir, "events").count()
    assert got.count() == 3 * n_fixture  # every staged row, once

    # replay batch 0 with identical content: the dataset must not
    # grow. A real replay re-derives the batch from the SOURCE (the
    # checkpointed offsets), never from the sink — so materialize
    # the content first instead of lazily reading the very directory
    # the replay overwrites.
    before = got.count()
    sink_batch = spark.read.parquet(f"{out}/{batches[0]}")
    replayed = spark.createDataFrame(
        sink_batch.collect(), schema=sink_batch.schema
    )
    sk.write_batch_idempotent(out)(replayed, int(batches[0].split("=")[1]))
    assert spark.read.parquet(out).count() == before


def test_jsonl_quarantine_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming ingestion twin: the engine-written JSONL fixture
    replayed through a file-source stream must produce the SAME
    quarantine census as the batch catalog key — including when the
    file arrives split across micro-batches (the census is a plain
    incremental aggregate; batch boundaries must not show)."""
    from mapreducepy_spark.registry import load_catalog
    from mapreducepy_spark.sources.jsonl import (
        _JSONL_DOC_SCHEMA,
        ensure_jsonl_fixture,
    )
    from mapreducepy_spark.streaming import ingest as si

    src = ensure_jsonl_fixture(sf_dir)
    # stage as a landing DIRECTORY, split in two so AvailableNow +
    # maxFilesPerTrigger=1 exercises a real micro-batch boundary
    land = tmp_path / "landing"
    land.mkdir()
    lines = open(src, "rb").read().splitlines(keepends=True)
    half = len(lines) // 2
    (land / "upload-000.jsonl").write_bytes(b"".join(lines[:half]))
    (land / "upload-001.jsonl").write_bytes(b"".join(lines[half:]))

    stream = si.read_jsonl_stream(
        spark, str(land), _JSONL_DOC_SCHEMA, max_files_per_trigger=1
    )
    assert stream.isStreaming
    got = sw.run_available_now(
        si.quarantine_census(stream), "t_jsonl_census", spark
    ).toPandas()
    want = load_catalog()["jsonl_quarantine"].builder(spark, sf_dir).toPandas()
    assert canon_frame(got) == canon_frame(want)


def test_jsonl_shapes_census_stream_matches_batch(spark, sf_dir, tmp_path):
    """The per-failure-class census is mode-agnostic like the plain
    quarantine census: replaying the four-failure-class fixture
    through the streaming reader across a micro-batch boundary must
    equal the batch jsonl_quarantine_shapes catalog key — the live
    failure-class dashboard the classifier docstring promises."""
    from mapreducepy_spark.registry import load_catalog
    from mapreducepy_spark.sources.jsonl import (
        _JSONL_DOC_SCHEMA,
        classify_error_shapes,
        ensure_jsonl_shapes_fixture,
    )
    from mapreducepy_spark.streaming import ingest as si

    src = ensure_jsonl_shapes_fixture(sf_dir)
    land = tmp_path / "landing_shapes"
    land.mkdir()
    lines = open(src, "rb").read().splitlines(keepends=True)
    half = len(lines) // 2
    (land / "upload-000.jsonl").write_bytes(b"".join(lines[:half]))
    (land / "upload-001.jsonl").write_bytes(b"".join(lines[half:]))

    stream = si.read_jsonl_stream(
        spark, str(land), _JSONL_DOC_SCHEMA, max_files_per_trigger=1
    )
    got = sw.run_available_now(
        classify_error_shapes(stream), "t_jsonl_shapes", spark
    ).toPandas()
    want = (
        load_catalog()["jsonl_quarantine_shapes"].builder(spark, sf_dir).toPandas()
    )
    assert canon_frame(got) == canon_frame(want)


def test_kafka_shape_value_parsing_matches_file_census(spark, sf_dir):
    """parse_json_values (the Kafka value-column path) must yield the
    IDENTICAL quarantine census as the file reader over the same
    lines — plus: NULL values (tombstones) are dropped, not counted
    clean or quarantined."""
    from mapreducepy_spark.registry import load_catalog
    from mapreducepy_spark.sources.jsonl import (
        _JSONL_DOC_SCHEMA,
        ensure_jsonl_fixture,
    )
    from mapreducepy_spark.streaming import ingest as si

    src = ensure_jsonl_fixture(sf_dir)
    lines = open(src, encoding="utf-8").read().splitlines()
    raw = spark.createDataFrame(
        [(ln,) for ln in lines] + [(None,)], "value string"  # + tombstone
    )
    got = si.quarantine_census(
        si.parse_json_values(raw, _JSONL_DOC_SCHEMA)
    ).toPandas()
    want = load_catalog()["jsonl_quarantine"].builder(spark, sf_dir).toPandas()
    assert canon_frame(got) == canon_frame(want)  # tombstone invisible


def test_cdc_apply_across_batches_matches_merge_upsert(spark, sf_dir, tmp_path):
    """The streaming CDC apply, replayed across MICRO-BATCH
    boundaries, converges to the registered batch ``merge_upsert``:
    orders split by time into two files consumed one per trigger,
    folded onto the customer base snapshot through the SAME
    merge_reduce the batch key uses. Equality pins (a) the shared
    fold (stream and batch cannot drift), (b) tombstone persistence
    across batches (a delete in batch 0 must still mask the key
    after batch 1), and (c) the versioned-state idempotence shape.
    This is the batch-parity anchor for streaming/cdc.py, the
    attribution/ingest/session convention."""
    from pyspark.sql import functions as F

    from mapreducepy_spark.operators.cdc import base_snapshot, merge_upsert
    from mapreducepy_spark.streaming import cdc as scdc

    d = tmp_path / "orders_two_batches"
    d.mkdir()
    raw = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cut = raw.selectExpr(
        "median(unix_micros(o_orderdate)) AS c"
    ).collect()[0].c
    raw.filter(F.unix_micros("o_orderdate") <= cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "tmp_a"))
    raw.filter(F.unix_micros("o_orderdate") > cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "tmp_b"))
    import pathlib

    for i, sub in enumerate(("tmp_a", "tmp_b")):
        for f in pathlib.Path(d / sub).glob("*.parquet"):
            shutil.move(str(f), d / f"{i}.parquet")
        shutil.rmtree(d / sub)

    state = str(tmp_path / "cdc_state")
    scdc.init_state(base_snapshot(load(spark, sf_dir, "customer")), state)
    q = scdc.start_cdc_apply(
        scdc.read_orders_stream(spark, str(d), max_files_per_trigger=1),
        spark,
        state,
        str(tmp_path / "cdc_ckpt"),
    )
    q.awaitTermination()
    # two batches + the seed must exist: the boundary was real
    import os

    assert {v for v in os.listdir(state) if v.startswith("v=")} == {
        "v=0", "v=1", "v=2"
    }
    got = scdc.read_live(spark, state).toPandas()
    want = merge_upsert(spark, sf_dir).toPandas()
    assert len(want) > 0
    assert canon_frame(got) == canon_frame(want)


def test_silent_user_alerts_fire_on_event_time_timeout(spark, tmp_path):
    """The EMIT-ON-ABSENCE pattern: alerts must come from event-time
    TIMERS, not data. Synthetic three-batch replay with exactly known
    watermark positions:

    - user 1 stops at 01:00 -> deadline 07:00 < batch-1 watermark
      (07:50): MUST alert with last_seen 01:00.
    - user 2 stops at 00:30 (deadline 06:30, fires the same way),
      then REAPPEARS at 23:00 in batch 2 -> exactly one alert (the
      silence), no second alert for the fresh state whose deadline
      is past every watermark the stream reaches.
    - user 3 is active in every batch (it also drives the watermark)
      and must never alert.
    """
    import pandas as pd

    from mapreducepy_spark.streaming.windows import silent_user_alerts

    d = tmp_path / "silent_users"
    d.mkdir()

    def write(fname, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            str(d / (fname + "_tmp"))
        )
        import shutil as _sh

        for f in (d / (fname + "_tmp")).glob("*.parquet"):
            _sh.move(str(f), d / f"{fname}.parquet")
        _sh.rmtree(d / (fname + "_tmp"))

    base = "2024-01-01 "
    write("0", [
        (0, base + "00:00:00", 1, "view", 1.0, None),
        (1, base + "01:00:00", 1, "view", 1.0, None),
        (2, base + "00:30:00", 2, "view", 1.0, None),
        (3, base + "00:15:00", 3, "view", 1.0, None),
        (4, base + "08:50:00", 3, "view", 1.0, None),
    ])
    write("1", [
        (5, base + "09:10:00", 3, "view", 1.0, None),
        (6, base + "15:50:00", 3, "view", 1.0, None),
    ])
    write("2", [
        (7, base + "23:00:00", 2, "view", 1.0, None),
        (8, base + "16:10:00", 3, "view", 1.0, None),
        (9, base + "23:50:00", 3, "view", 1.0, None),
    ])

    stream = sw.read_events_stream(spark, str(d), max_files_per_trigger=1)
    got = sw.run_available_now(
        silent_user_alerts(stream, threshold_min=360, watermark="1 hour"),
        "t_silent_alerts",
        spark,
        output_mode="append",
    ).toPandas()
    got = got.sort_values("user_id").reset_index(drop=True)
    assert got["user_id"].tolist() == [1, 2]
    assert [str(t) for t in got["last_seen"]] == [
        "2024-01-01 01:00:00",
        "2024-01-01 00:30:00",
    ]


def test_pit_enrich_stream_matches_batch_point_in_time(
    spark, sf_dir, events_dir
):
    """Stream-static PIT enrichment: replaying the events fixture
    through a file-source stream against the MATERIALIZED SCD2
    dimension must equal the batch join_point_in_time key (which
    fuses dimension derivation and probe into one window). Half-open
    interval containment guarantees at most one version matches, so
    the stream-static LEFT join emits exactly one row per sharded
    event — no downstream compact needed."""
    from mapreducepy_spark.operators.cdc import pit_versions
    from mapreducepy_spark.registry import load_catalog
    from mapreducepy_spark.streaming import joins as sj

    versions = pit_versions(load(spark, sf_dir, "orders"))
    stream = sw.read_events_stream(spark, events_dir)
    got = sw.run_available_now(
        sj.pit_enrich(stream, versions), "t_pit", spark
    ).toPandas()
    want = (
        load_catalog()["join_point_in_time"]
        .builder(spark, sf_dir)
        .toPandas()
    )
    assert len(got) > 0
    assert canon_frame(got) == canon_frame(want)


def test_burst_alerts_stream_matches_batch(spark, sf_dir, events_dir):
    """The streaming burst monitor must emit exactly the batch
    ``events_burst_detect`` rows for every bucket the watermark
    closed (buckets newer than max_ts − delay legitimately stay open
    at end of replay), value-identical including the trailing mean
    and the flag."""
    import pandas as pd

    from mapreducepy_spark.registry import load_catalog

    stream = sw.read_events_stream(spark, events_dir)
    got = sw.run_available_now(
        sw.burst_alerts(stream), "t_burst", spark
    ).toPandas()
    batch = (
        load_catalog()["events_burst_detect"]
        .builder(spark, sf_dir)
        .toPandas()
    )
    ev = _batch_events(spark, sf_dir).toPandas()
    max_us = int(ev["ts"].dropna().astype("datetime64[us]").astype("int64").max())
    wm_ms = max_us // 1000 - 600_000  # delay "10 minutes"
    batch["end_ms"] = (
        batch["bucket"].astype("datetime64[us]").astype("int64") // 1000
        + 600_000
    )
    expected = batch[batch["end_ms"] <= wm_ms].drop(columns=["end_ms"])
    assert len(got) > 0, "stream closed no buckets — replay broken"
    key = ["event_type", "bucket"]
    got_s = got.sort_values(key).reset_index(drop=True)
    exp_s = expected.sort_values(key).reset_index(drop=True)
    assert canon_frame(got_s) == canon_frame(exp_s)


def test_burst_alerts_fire_on_timer_for_quiet_types(spark, sf_dir, events_dir, tmp_path):
    """Replaying in TWO micro-batches: buckets whose closure is only
    provable after the second batch advances the watermark must still
    emit (the timer path), and nothing emits twice."""
    import shutil as _sh

    d = tmp_path / "two_files"
    d.mkdir()
    # split the fixture into two files: second file carries the
    # latest half of rows so batch 2 genuinely advances the watermark
    ev = _batch_events(spark, sf_dir).toPandas().sort_values("ts")
    mid = len(ev) // 2
    ev.iloc[:mid].to_parquet(d / "part-000.parquet", index=False)
    ev.iloc[mid:].to_parquet(d / "part-001.parquet", index=False)
    stream = sw.read_events_stream(spark, str(d), max_files_per_trigger=1)
    got = sw.run_available_now(
        sw.burst_alerts(stream), "t_burst2", spark
    ).toPandas()
    assert len(got) > 0
    assert not got.duplicated(["event_type", "bucket"]).any()
    # identical closed-bucket verdicts as the single-batch replay
    single = sw.run_available_now(
        sw.burst_alerts(sw.read_events_stream(spark, events_dir)),
        "t_burst3",
        spark,
    ).toPandas()
    key = ["event_type", "bucket"]
    a = got.sort_values(key).reset_index(drop=True)
    b = single.sort_values(key).reset_index(drop=True)
    assert canon_frame(a) == canon_frame(b)


def test_burst_alerts_drop_late_data_below_watermark(spark, sf_dir, tmp_path):
    """Late-data semantics: replay the NEWEST half first (watermark
    jumps to its max − delay), then the oldest half — every old row
    arrives below the watermark and must be DROPPED by the stateful
    operator, never resurrect or mutate a closed bucket. The verdicts
    must therefore equal a replay of the newest half alone."""
    ev = _batch_events(spark, sf_dir).toPandas().sort_values("ts")
    mid = len(ev) // 2
    newest, oldest = ev.iloc[mid:], ev.iloc[:mid]

    d_late = tmp_path / "late"
    d_late.mkdir()
    # file order drives micro-batch order under maxFilesPerTrigger=1:
    # the file source orders by MODIFICATION TIME, so the writes are
    # separated by >1s — equal-ms mtimes made the order (and
    # therefore what counts as "late") nondeterministic in the first
    # version of this test
    import time as _time

    newest.to_parquet(d_late / "part-000.parquet", index=False)
    _time.sleep(1.05)
    oldest.to_parquet(d_late / "part-001.parquet", index=False)
    got = sw.run_available_now(
        sw.burst_alerts(
            sw.read_events_stream(spark, str(d_late), max_files_per_trigger=1)
        ),
        "t_burst_late",
        spark,
    ).toPandas()
    assert not got.duplicated(["event_type", "bucket"]).any()

    d_new = tmp_path / "newonly"
    d_new.mkdir()
    newest.to_parquet(d_new / "part-000.parquet", index=False)
    want = sw.run_available_now(
        sw.burst_alerts(sw.read_events_stream(spark, str(d_new))),
        "t_burst_newonly",
        spark,
    ).toPandas()
    key = ["event_type", "bucket"]
    a = got.sort_values(key).reset_index(drop=True)
    b = want.sort_values(key).reset_index(drop=True)
    assert canon_frame(a) == canon_frame(b)


def test_silent_user_alerts_ignore_late_events_after_alert(spark, tmp_path):
    """Late-data pin, aimed at the one-batch LAG in Spark's built-in
    late filter for applyInPandasWithState (the late-events watermark
    is the PREVIOUS batch's value): a stale user-1 event lands in the
    very batch whose watermark jump makes the user's silence
    provable. Without the operator-level drop the stale row
    overwrites last_seen (01:00 -> 02:00) and the alert emits with
    the corrupted timestamp; with it the alert carries the true
    last_seen. Mutation-checked: disabling the drop flips the
    emitted timestamp."""
    import pandas as pd

    from mapreducepy_spark.streaming.windows import silent_user_alerts

    d = tmp_path / "silent_late"
    d.mkdir()

    def write(fname, rows):
        import time as _time

        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        pdf.to_parquet(d / f"{fname}.parquet", index=False)
        _time.sleep(1.05)  # pin file-source batch order via mtime

    base = "2024-01-01 "
    write("0", [
        (0, base + "00:00:00", 1, "view", 1.0, None),
        (1, base + "01:00:00", 1, "view", 1.0, None),
        (2, base + "08:50:00", 3, "view", 1.0, None),
    ])
    write("1", [
        # watermark DURING this batch: 07:50 (from batch 0). The
        # late-events filter still uses batch 0's value (0), so this
        # stale 02:00 row IS delivered to the operator — the lag
        # window the operator-level drop exists for.
        (3, base + "02:00:00", 1, "view", 1.0, None),
        (4, base + "15:50:00", 3, "view", 1.0, None),
    ])
    write("2", [
        (5, base + "23:50:00", 3, "view", 1.0, None),
    ])

    stream = sw.read_events_stream(spark, str(d), max_files_per_trigger=1)
    got = sw.run_available_now(
        silent_user_alerts(stream, threshold_min=360, watermark="1 hour"),
        "t_silent_late",
        spark,
        output_mode="append",
    ).toPandas()
    u1 = got[got["user_id"] == 1]
    assert len(u1) == 1
    assert str(u1["last_seen"].iloc[0]) == "2024-01-01 01:00:00"


def test_absence_monitor_batch_twin_vs_streaming(spark, tmp_path):
    """Honesty pin for the events_absence_monitor batch twin
    (VERDICT r9 #7): on the exact 3-file replay scenario of
    test_silent_user_alerts_fire_on_event_time_timeout, the batch
    formulation with cutoff = the stream's FINAL WATERMARK must
    produce the streaming alert set PLUS exactly the silences the
    micro-batch boundaries hid — here user 3's 00:15 -> 08:50 gap
    (8h35 > 6h of event time; both endpoints arrived in the same
    micro-batch, so last_seen was already 08:50 when the state was
    first created), user 3's 09:10 -> 15:50 gap (6h40; same-batch
    endpoints again), and user 3's 16:10 -> 23:50 gap (7h40; the
    23:50 event landed in the same batch whose data reset the
    state, and no later batch ran to fire the timer). Batch is the omniscient
    monitor; streaming observes the subset its batching can prove.
    Mutation-checked: widening the threshold or using a max-ts cutoff
    flips the expected sets."""
    import pandas as pd

    from mapreducepy_spark.operators.temporal import absence_alerts
    from mapreducepy_spark.streaming.windows import silent_user_alerts

    d = tmp_path / "absence_twin"
    d.mkdir()

    def write(fname, rows):
        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            str(d / (fname + "_tmp"))
        )
        for f in (d / (fname + "_tmp")).glob("*.parquet"):
            shutil.move(str(f), d / f"{fname}.parquet")
        shutil.rmtree(d / (fname + "_tmp"))

    base = "2024-01-01 "
    write("0", [
        (0, base + "00:00:00", 1, "view", 1.0, None),
        (1, base + "01:00:00", 1, "view", 1.0, None),
        (2, base + "00:30:00", 2, "view", 1.0, None),
        (3, base + "00:15:00", 3, "view", 1.0, None),
        (4, base + "08:50:00", 3, "view", 1.0, None),
    ])
    write("1", [
        (5, base + "09:10:00", 3, "view", 1.0, None),
        (6, base + "15:50:00", 3, "view", 1.0, None),
    ])
    write("2", [
        (7, base + "23:00:00", 2, "view", 1.0, None),
        (8, base + "16:10:00", 3, "view", 1.0, None),
        (9, base + "23:50:00", 3, "view", 1.0, None),
    ])

    stream = sw.read_events_stream(spark, str(d), max_files_per_trigger=1)
    streamed = sw.run_available_now(
        silent_user_alerts(stream, threshold_min=360, watermark="1 hour"),
        "t_absence_twin",
        spark,
        output_mode="append",
    ).toPandas()
    streamed_set = {
        (int(r.user_id), str(r.last_seen)) for r in streamed.itertuples()
    }

    # batch twin: same threshold, cutoff = final watermark
    # (max ts 23:50 − 1 h delay = 22:50)
    thr_us = 360 * 60 * 1_000_000
    cutoff_us = int(
        pd.Timestamp(base + "22:50:00").value // 1000
    )
    batch = absence_alerts(
        spark.read.parquet(str(d)).select("user_id", "event_id", "ts"),
        thr_us,
        cutoff_us,
    ).toPandas()
    batch_set = {
        (int(r.user_id), str(r.last_seen)) for r in batch.itertuples()
    }

    assert streamed_set == {
        (1, base + "01:00:00"),
        (2, base + "00:30:00"),
    }
    # containment + the exact hidden difference
    assert streamed_set <= batch_set
    assert batch_set - streamed_set == {
        (3, base + "00:15:00"),
        (3, base + "09:10:00"),
        (3, base + "16:10:00"),
    }
    # kinds: user 1's silence is a tail (no later event), user 2/3's
    # are gaps (they reappear)
    kinds = {
        (int(r.user_id), str(r.last_seen)): r.alert_kind
        for r in batch.itertuples()
    }
    assert kinds == {
        (1, base + "01:00:00"): "tail",
        (2, base + "00:30:00"): "gap",
        (3, base + "00:15:00"): "gap",
        (3, base + "09:10:00"): "gap",
        (3, base + "16:10:00"): "gap",
    }


def test_join_stream_interval_key_matches_streaming_run(
    spark, sf_dir, events_dir
):
    """The registered join_stream_interval key (60-minute horizon)
    must equal the watermarked STREAMING execution of the shared
    clicks_after_views expression tree on the replayed fixture —
    the driver's hash gate and the streaming operator certify the
    same semantics."""
    from mapreducepy_spark.registry import load_catalog

    stream = sw.read_events_stream(spark, events_dir)
    got = sw.run_available_now(
        sw.clicks_after_views(stream, horizon="60 minutes"),
        "t_ssjoin60",
        spark,
    ).toPandas()
    want = (
        load_catalog()["join_stream_interval"]
        .builder(spark, sf_dir)
        .toPandas()
        .rename(columns={"user_id": "c_user"})
        .drop(columns=["lag_sec"])
    )
    assert len(want) > 0
    assert canon_frame(got) == canon_frame(want)


def test_views_without_click_stream_matches_batch_anti(
    spark, sf_dir, events_dir
):
    """The LEFT-OUTER interval join's NULL side, replayed, vs the
    batch anti-join twin (``events_views_unconverted``): the stream
    may emit a view's no-click verdict ONLY once the watermark proves
    no qualifying click can still arrive, so the pin is exact in both
    directions against the final watermark W = min(max view_ts, max
    click_ts) − horizon:

    - every streamed row appears in the batch answer (the stream
      never invents an unconverted view), and
    - the streamed set is EXACTLY the batch rows with
      ``view_ts + horizon < W`` — the remainder are the views whose
      verdict window was still open when the replay ended (the same
      boundary ``events_absence_monitor``'s replay test enumerates
      for the timer path).
    """
    import pandas as pd

    horizon = pd.Timedelta(minutes=60)
    stream = sw.read_events_stream(spark, events_dir)
    got = sw.run_available_now(
        sw.views_without_click(stream, "60 minutes"), "t_vnc", spark
    ).toPandas()
    from mapreducepy_spark.registry import load_catalog

    want = (
        load_catalog()["events_views_unconverted"]
        .builder(spark, sf_dir)
        .toPandas()
    )
    e = _batch_events(spark, sf_dir).toPandas()
    wm = (
        min(
            e[e.event_type == "view"].ts.max(),
            e[e.event_type == "click"].ts.max(),
        )
        - horizon
    )

    def keyed(df, user_col):
        return set(
            zip(df[user_col].fillna(-1).astype(int), df.view_id.astype(int))
        )

    got_k = keyed(got, "v_user")
    want_k = keyed(want, "user_id")
    assert got_k <= want_k, "stream emitted a view the batch converts"
    closed = keyed(
        want[(want.view_ts + horizon) < wm], "user_id"
    )
    assert got_k == closed
    assert len(got_k) > 0 and len(want_k) > len(got_k)


def test_views_without_click_null_click_id_still_converts(spark, tmp_path):
    """Code-review regression (r11): a matching click with a NULL
    event_id must still CONVERT its view. The no-match flag is the
    JOIN KEY (c_user — never NULL on a matched row), not click_id,
    which is nullable in-contract. Run on a static frame (the
    function is mode-agnostic) and against the batch anti twin."""
    import pandas as pd

    from mapreducepy_spark.io import load as _load
    from mapreducepy_spark.registry import load_catalog

    t0 = pd.Timestamp("2024-03-01 09:00:00")
    rows = [
        (1.0, 1, "view", t0, 0.0),
        (None, 1, "click", t0 + pd.Timedelta(minutes=5), 0.0),
        (3.0, 2, "view", t0, 0.0),  # no click at all -> unconverted
    ]
    pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts", "value"]
    ).astype({"event_id": "Int64"}).to_parquet(
        tmp_path / "events.parquet", index=False
    )
    e = _load(spark, str(tmp_path), "events")
    got = sw.views_without_click(e, "60 minutes").toPandas()
    assert list(got.view_id.astype(int)) == [3]
    want = (
        load_catalog()["events_views_unconverted"]
        .builder(spark, str(tmp_path))
        .toPandas()
    )
    assert list(want.view_id.astype(int)) == [3]
