"""The content-keyed session cache is now load-bearing for ~15 keys
(dedup funnel, tf-idf core, char bigrams, embed partials, exact kNN)
— these tests pin its contract: same bytes hit, changed bytes miss,
different artifacts never collide, and the FIFO bound holds.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from mapreducepy_spark import session_cache
from mapreducepy_spark.session_cache import fixture_cached


@pytest.fixture()
def docs_dir(tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a b", "c d"]}
    ).to_parquet(d / "documents.parquet", index=False)
    return str(d)


def test_same_content_hits_cache(spark, docs_dir):
    calls = []

    def build():
        calls.append(1)
        return spark.createDataFrame([(1,)], "x long")

    a = fixture_cached(spark, docs_dir, "documents", "t1", build)
    b = fixture_cached(spark, docs_dir, "documents", "t1", build)
    assert len(calls) == 1
    assert a is b


def test_changed_bytes_invalidate(spark, docs_dir):
    calls = []

    def build():
        calls.append(1)
        return spark.createDataFrame([(len(calls),)], "x long")

    fixture_cached(spark, docs_dir, "documents", "t2", build)
    # rewrite the fixture: new mtime_ns/size -> new cache key. mtime
    # resolution is ns, but guard against coarse filesystems by also
    # changing the size.
    time.sleep(0.01)
    pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a b", "c d", "e f g h"]}
    ).to_parquet(os.path.join(docs_dir, "documents.parquet"), index=False)
    out = fixture_cached(spark, docs_dir, "documents", "t2", build)
    assert len(calls) == 2
    assert out.collect()[0]["x"] == 2


def test_distinct_tags_do_not_collide(spark, docs_dir):
    a = fixture_cached(
        spark, docs_dir, "documents", "tag_a",
        lambda: spark.createDataFrame([(1,)], "x long"),
    )
    b = fixture_cached(
        spark, docs_dir, "documents", "tag_b",
        lambda: spark.createDataFrame([(2,)], "x long"),
    )
    assert a.collect()[0]["x"] == 1
    assert b.collect()[0]["x"] == 2


def test_fifo_bound_evicts_oldest(spark, docs_dir):
    baseline = dict(session_cache._CACHE)
    try:
        session_cache._CACHE.clear()
        for i in range(session_cache._CACHE_MAX + 3):
            fixture_cached(
                spark, docs_dir, "documents", f"evict_{i}",
                lambda i=i: spark.createDataFrame([(i,)], "x long"),
            )
        assert len(session_cache._CACHE) == session_cache._CACHE_MAX
        tags = [k[1] for k in session_cache._CACHE]
        assert "evict_0" not in tags  # oldest evicted
        assert f"evict_{session_cache._CACHE_MAX + 2}" in tags
    finally:
        session_cache._CACHE.clear()
        session_cache._CACHE.update(baseline)


def test_cached_result_values_equal_fresh_build(spark, sf_dir):
    """End-to-end: a funnel key served from cache must equal a fresh
    uncached build of the same plan (the checkpoint is a pure
    materialization, never a semantic change)."""
    from mapreducepy_spark.llm import dedup as dd

    cached = dd._candidate_pairs_cached(spark, sf_dir).toPandas()
    fresh = dd._candidate_pairs(spark, sf_dir).toPandas()
    key = ["doc_a", "doc_b"]
    assert (
        cached.sort_values(key).reset_index(drop=True).equals(
            fresh.sort_values(key).reset_index(drop=True)
        )
    )
