"""Degenerate-input guards the synthetic fixtures never exercise
(continuous-random values, always-active users) but real data will."""

from __future__ import annotations

import pandas as pd

from mapreducepy_spark.registry import load_catalog

CATALOG = load_catalog()


def _write_events(tmp_path, rows):
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_events_anomaly_survives_zero_stddev_type(spark, tmp_path):
    """A constant-valued event type has stddev 0; under ANSI mode an
    unguarded (value-mu)/sd would throw DIVIDE_BY_ZERO and kill the
    job. The guard must instead drop the group's rows — matching
    DuckDB, where 0/0 is NULL and fails the |z|>2 filter."""
    sf = _write_events(
        tmp_path,
        [
            # constant group: sd = 0, must not crash, must emit no rows
            (1, "2024-01-01 00:00:00", 1, "const", 5.0, "{}"),
            (2, "2024-01-01 00:01:00", 1, "const", 5.0, "{}"),
            (3, "2024-01-01 00:02:00", 2, "const", 5.0, "{}"),
            # varied group with one extreme outlier (z far beyond 2)
            (4, "2024-01-01 00:00:00", 3, "varied", 1.0, "{}"),
            (5, "2024-01-01 00:01:00", 3, "varied", 1.1, "{}"),
            (6, "2024-01-01 00:02:00", 3, "varied", 0.9, "{}"),
            (7, "2024-01-01 00:03:00", 3, "varied", 1.0, "{}"),
            (8, "2024-01-01 00:04:00", 3, "varied", 1.05, "{}"),
            (9, "2024-01-01 00:05:00", 4, "varied", 100.0, "{}"),
        ],
    )
    out = CATALOG["events_anomaly"].builder(spark, sf).toPandas()
    assert set(out.event_type) == {"varied"}
    assert set(out.event_id) == {9}
