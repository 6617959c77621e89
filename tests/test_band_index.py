"""Persisted LSH band index (the standing nightly-dedup artifact):
``dedup_incremental_indexed`` must ride a STORED, bucketed band table
— corpus-sized work paid once at index-build time, delta runs only
scanning the index — through the same warehouse lifecycle the
bucketed fact tables proved (adopt / crashed-write rebuild / GC)."""

from __future__ import annotations

import os
import shutil

from mapreducepy_spark.llm.dedup import _ensure_band_index
from mapreducepy_spark.plans import plan_text
from mapreducepy_spark.registry import load_catalog
from mapreducepy_spark.warehouse import warehouse_path

CATALOG = load_catalog()


def test_indexed_matches_sessioncached_variant(spark, sf_dir):
    """The stored index is value-identical to the session band table,
    so the two triage keys must agree row-for-row."""
    a = (
        CATALOG["dedup_incremental"]
        .builder(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        CATALOG["dedup_incremental_indexed"]
        .builder(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_indexed_plan_scans_index_not_funnel(spark, sf_dir):
    """The whole point of the stored index: a delta run's plan scans
    the bandidx table and contains NO Generate (explode) anywhere —
    the shingle→minhash→band funnel never recomputes per delta."""
    df = CATALOG["dedup_incremental_indexed"].builder(spark, sf_dir)
    plan = plan_text(df, "simple")
    assert "bandidx_" in plan, plan
    assert "Generate" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_index_bucket_layout_survives_write_and_adopt(spark, sf_dir):
    """Bucket metadata must be live on BOTH creation paths — fresh
    write and DDL adoption: an aggregation keyed on (band, sig) over
    the index plans with no Exchange (the 100 TB contract: the
    corpus-sized index is never re-shuffled after the one write)."""
    name = _ensure_band_index(spark, sf_dir)

    def _no_exchange():
        agg = spark.table(name).groupBy("band", "sig").count()
        assert "Exchange" not in plan_text(agg, "simple")

    _no_exchange()
    # simulate a fresh session finding the orphan: stash the dir,
    # drop the managed table (which deletes it), restore the stash
    wh = warehouse_path(spark)
    src = os.path.join(wh, name)
    bak = src + "_bak"
    shutil.rmtree(bak, ignore_errors=True)
    shutil.copytree(src, bak)
    spark.sql(f"DROP TABLE {name}")
    shutil.rmtree(src, ignore_errors=True)
    os.rename(bak, src)
    assert not spark.catalog.tableExists(name)
    assert _ensure_band_index(spark, sf_dir) == name  # adopted via DDL
    assert spark.catalog.tableExists(name)
    _no_exchange()
    assert spark.table(name).count() > 0


def test_index_crashed_write_is_rebuilt(spark, sf_dir):
    """A directory without _SUCCESS is a crashed write: never adopted,
    removed and rebuilt (same gate the bucketed fact tables have)."""
    name = _ensure_band_index(spark, sf_dir)
    wh = warehouse_path(spark)
    src = os.path.join(wh, name)
    bak = src + "_bak"
    shutil.rmtree(bak, ignore_errors=True)
    shutil.copytree(src, bak)
    spark.sql(f"DROP TABLE {name}")
    shutil.rmtree(src, ignore_errors=True)
    os.rename(bak, src)
    os.remove(os.path.join(src, "_SUCCESS"))  # ...crashed mid-write
    n_before = len(
        [f for f in os.listdir(src) if f.endswith(".parquet")]
    )
    assert _ensure_band_index(spark, sf_dir) == name
    assert spark.catalog.tableExists(name)
    assert os.path.exists(os.path.join(src, "_SUCCESS"))  # rebuilt
    assert spark.table(name).count() > 0
    assert n_before > 0  # the crash fixture actually had data files


def test_index_gc_collects_dead_fixture_orphans(spark, sf_dir, tmp_path):
    """GC over bandidx dirs mirrors the bucketed-table rules: aged +
    dead source → collected; YOUNG + dead source → spared (another
    session's grace); aged + live source + current writer → kept."""
    import time

    from mapreducepy_spark.warehouse import GC_MIN_AGE_SEC

    name = _ensure_band_index(spark, sf_dir)
    wh = warehouse_path(spark)
    live = os.path.join(wh, name)
    old = time.time() - GC_MIN_AGE_SEC - 60

    dead = os.path.join(wh, "bandidx_00000000dead")
    young = os.path.join(wh, "bandidx_00000000f00d")
    keepme = os.path.join(wh, "bandidx_00000000cafe")
    from mapreducepy_spark.llm.dedup import _BANDIDX_WRITER_V

    for d, src_line, ts in (
        (dead, str(tmp_path / "gone.parquet"), old),
        (young, str(tmp_path / "gone.parquet"), None),
        (keepme, f"{os.path.abspath(sf_dir)}/documents.parquet", old),
    ):
        shutil.rmtree(d, ignore_errors=True)
        shutil.copytree(live, d)
        with open(os.path.join(d, "_SOURCE"), "w") as fh:
            fh.write(f"writer=v{_BANDIDX_WRITER_V}\n")
            fh.write(src_line + "\n")
        if ts is None:
            now = time.time()
            os.utime(d, (now, now))  # pin YOUNG against copystat
        else:
            os.utime(d, (ts, ts))
    try:
        assert _ensure_band_index(spark, sf_dir) == name
        assert not os.path.isdir(dead)  # dead source, aged -> collected
        assert os.path.isdir(young)     # dead source, YOUNG -> spared
        assert os.path.isdir(keepme)    # live source + current -> kept
        assert os.path.isdir(live)      # the real table -> untouched
    finally:
        for d in (dead, young, keepme):
            shutil.rmtree(d, ignore_errors=True)  # don't leak the props


def test_index_append_is_delta_sized_and_layout_preserving(spark, sf_dir):
    """The nightly shape end-to-end: append ONE new document's bands
    (a byte-copy of an existing doc, so its signatures must collide)
    into a COPY of the stored index via insertInto — the bucket
    layout survives (no-Exchange groupBy still plans), the appended
    doc is probeable, and it collides with its original."""
    from pyspark.sql import functions as F

    from mapreducepy_spark.llm.dedup import append_band_index

    name = _ensure_band_index(spark, sf_dir)
    copy = "bandidx_aaaaaaaaaaaa"  # test-local; dropped in finally
    spark.sql(f"DROP TABLE IF EXISTS {copy}")
    try:
        (
            spark.table(name)
            .repartition(8, F.col("band"), F.col("sig"))
            .write.bucketBy(8, "band", "sig")
            .format("parquet")
            .saveAsTable(copy)
        )
        # tomorrow's delta: one doc whose text copies an existing doc
        src = (
            spark.table(name)
            .select("doc_id")
            .where(F.col("doc_id").isNotNull())
            .orderBy("doc_id")
            .limit(1)
            .collect()[0][0]
        )
        from mapreducepy_spark.io import load

        donor = (
            load(spark, sf_dir, "documents")
            .where(F.col("doc_id") == src)
            .select("doc_id", "text")
            .collect()[0]
        )
        new_id = 999_000_001
        delta_docs = spark.createDataFrame(
            [(new_id, donor.text)], ["doc_id", "text"]
        )
        n_before = spark.table(copy).count()
        append_band_index(spark, copy, delta_docs)
        after = spark.table(copy)
        assert after.count() > n_before
        # layout contract survives the append
        from mapreducepy_spark.plans import plan_text

        agg = after.groupBy("band", "sig").count()
        assert "Exchange" not in plan_text(agg, "simple")
        # the appended doc collides with its byte-identical original
        mine = after.where(F.col("doc_id") == new_id).select("band", "sig")
        partners = (
            after.join(mine, ["band", "sig"])
            .where(F.col("doc_id") == donor.doc_id)
            .count()
        )
        assert partners > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {copy}")
