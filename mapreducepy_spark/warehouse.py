"""Persisted-table lifecycle over the warehouse directory.

The generic machinery behind every "pay the shuffle ONCE, adopt
forever" layout artifact: content-fingerprinted table names, `_SOURCE`
sidecars naming the fixture bytes a table was derived from, GC of
dead-fixture orphans with concurrency grace windows, and the
adopt-or-rebuild dance over `_SUCCESS`-gated directories.

Extracted from ``operators/joins._ensure_bucketed_tables`` (VERDICT
r11 #4) so the bucketed fact tables AND the persisted LSH band index
(``llm/dedup._ensure_band_index``) share one battle-tested lifecycle
instead of two drifting copies. At 100 TB this is the metastore
contract: the write-time shuffle of a corpus-sized layout is paid
once per fixture content; every later session re-registers the
directory in seconds of DDL.
"""

from __future__ import annotations

import os
import re
import shutil
import time
from collections.abc import Callable, Iterable
from urllib.parse import urlparse

from pyspark.sql import SparkSession

# GC grace period: a directory younger than this is never collected,
# even if its _SOURCE fixtures are gone — a CONCURRENT session sharing
# the warehouse may have just written it against a tmp fixture it is
# still querying (ADVICE r10). Dead tmp-fixture orphans age past this
# within the same suite run and are collected on the next touch.
GC_MIN_AGE_SEC = 600

# Longer grace for SUPERSEDED-writer-version dirs whose source
# fixtures are still alive: a concurrent session running the OLDER
# build may have that dir registered and mid-query (its catalog is
# invisible to us), and unlike a dead-fixture orphan nothing forces
# it idle within minutes. Mixed-version overlap is a deployment
# transient, so a deep grace covers it; after that the dir is
# unreachable dead weight (new builds mint different names) and is
# collected.
GC_VERSION_GRACE_SEC = 6 * 3600


def warehouse_path(spark: SparkSession) -> str:
    """Filesystem path of the session's warehouse directory."""
    return (
        urlparse(
            spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        ).path
        or "spark-warehouse"
    )


def touch(path: str) -> None:
    """Refresh a table dir's mtime when a session adopts or re-uses
    it (ADVICE r11): the GC grace windows are mtime-based and READS
    never bump mtime — an actively-queried dir older than the grace
    could be rmtree'd mid-query by a concurrent session's GC pass.
    Active use keeping the dir inside the window closes that."""
    try:
        os.utime(path, None)
    except OSError:
        pass


def write_sidecar(path: str, writer_tag: str, sources: Iterable[str]) -> None:
    """"_"-prefixed files are invisible to Spark's FileIndex (the
    _SUCCESS rule), so the sidecar never pollutes scans. First line =
    writer version tag: GC uses it to collect stranded dirs of
    SUPERSEDED recipes even while their source fixtures stay alive
    (a bumped version re-mints names, so old dirs are unreachable
    dead weight)."""
    with open(os.path.join(path, "_SOURCE"), "w") as fh:
        fh.write(f"{writer_tag}\n")
        fh.write("\n".join(sources) + "\n")


def gc_stale_tables(
    spark: SparkSession,
    wh: str,
    pattern: re.Pattern[str],
    live_names: set[str],
    writer_tag: str,
) -> None:
    """Collect warehouse dirs matching ``pattern`` whose fixtures are
    gone or whose writer recipe is superseded — with the concurrency
    grace windows above, so a dir another session may still be
    querying is never pulled out from under it.

    Keep rules per dir (skipping live names and registered tables):
    - younger than GC_MIN_AGE_SEC → always spared (fresh write);
    - sidecar says CURRENT writer_tag AND every source file still
      exists → kept (live fixture, adoptable);
    - superseded writer over LIVE sources → spared until
      GC_VERSION_GRACE_SEC (an older-build session may have it
      registered), then collected;
    - everything else (dead sources, no sidecar) → collected.
    """
    if not os.path.isdir(wh):
        return
    for d in os.listdir(wh):
        if not pattern.match(d) or d in live_names:
            continue
        if spark.catalog.tableExists(d):
            continue
        full = os.path.join(wh, d)
        try:
            age = time.time() - os.path.getmtime(full)
            if age < GC_MIN_AGE_SEC:
                continue
        except OSError:
            continue
        side = os.path.join(full, "_SOURCE")
        keep = False
        if os.path.exists(side):
            try:
                with open(side) as fh:
                    lines = [ln.strip() for ln in fh if ln.strip()]
            except OSError:
                # a CONCURRENT session's GC removed the dir between
                # our exists() and open() (r12 review) — it is gone,
                # nothing left for us to collect
                continue
            version_ok = writer_tag in lines
            sources_ok = all(
                os.path.exists(ln)
                for ln in lines
                if not ln.startswith("writer=")
            )
            keep = version_ok and sources_ok
            # superseded recipe over LIVE fixtures: an older-build
            # concurrent session may still have it registered —
            # spare it for the deep version grace, then collect
            # (code review r11: the plain version gate defeated
            # the concurrency guard for mixed-version sessions)
            if not version_ok and sources_ok:
                keep = age < GC_VERSION_GRACE_SEC
        if not keep:
            shutil.rmtree(full, ignore_errors=True)


def ensure_table(
    spark: SparkSession,
    name: str,
    wh: str,
    clustered_ddl: str,
    build: Callable[[], None],
    writer_tag: str,
    sources: list[str],
) -> None:
    """Make ``name`` queryable: re-use the registered table, ADOPT a
    completed orphan directory via DDL, or rebuild from scratch.

    The files of an orphan ARE trustworthy as the declared layout
    when (a) the directory name carries the caller's content
    fingerprint — only the caller's writer ever minted it, with
    exactly the declared spec — and (b) the `_SUCCESS` marker
    certifies the write completed. Such orphans are re-registered
    via ``CREATE TABLE ... {clustered_ddl} LOCATION`` (seconds of
    DDL instead of re-shuffling the source); anything else — no
    marker, unreadable schema — is removed and rebuilt via
    ``build()`` (which must ``saveAsTable(name)``).
    """
    orphan = os.path.abspath(os.path.join(wh, name))
    if spark.catalog.tableExists(name):
        touch(orphan)
        return
    if os.path.isdir(orphan) and os.path.exists(
        os.path.join(orphan, "_SUCCESS")
    ):
        try:
            ddl = spark.read.parquet(orphan).schema.toDDL()
            # identifier backtick-quoted, path single-quote-escaped:
            # a quote in the warehouse path must not break (or alter)
            # the statement now that this is shared machinery with
            # multiple callers (ADVICE r12)
            loc = orphan.replace("'", "''")
            spark.sql(
                f"CREATE TABLE `{name}` ({ddl}) USING parquet "
                f"{clustered_ddl} LOCATION '{loc}'"
            )
            write_sidecar(orphan, writer_tag, sources)
            touch(orphan)
            return
        except Exception:
            # fall through to rebuild; never trust a half-state
            spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    if os.path.isdir(orphan):
        shutil.rmtree(orphan, ignore_errors=True)
    build()
    write_sidecar(orphan, writer_tag, sources)
