"""Round-16-session references: the r13 hardening of
``operators/prefix.py`` (VERDICT r12 work order #3) and its canaries.

Two soft spots the r12 judge read out of the module get loud here:

1. The descending/nulls_last foot-gun guard used to string-sniff
   ``repr(Column)``; it now walks the SortOrder expression node, so an
   alias/cast-WRAPPED shard column no longer bypasses the
   contradiction check. The repr format stays pinned below as the
   canary for the Spark-Connect fallback path.
2. A NaN shard key used to become a NULL ``__ord`` that silently
   dropped from the inner offsets join; it now raises at execution
   time with the module-contract message.
"""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from mapreducepy_spark.operators.prefix import (
    _leading_sort_flags,
    with_global_prefix,
)


def test_wrapped_shard_column_still_validates_flags(spark):
    """r12 judge finding #1: an alias or cast wrapper around the shard
    column must NOT bypass the descending/nulls_last contradiction
    guard (the repr-parsing guard it replaces did exactly that)."""
    df = spark.createDataFrame([(1, 1)], ["k", "n"])
    with pytest.raises(ValueError, match="contradicts"):
        with_global_prefix(
            df, "k", [F.col("k").cast("double").desc()], count_as="rb"
        )  # descending not set; cast-wrapped
    with pytest.raises(ValueError, match="contradicts"):
        with_global_prefix(
            df,
            "k",
            [F.col("k").alias("kk").asc_nulls_last()],
            count_as="rb",
        )  # nulls_last not set; alias-wrapped
    # and the wrapped HAPPY path must not false-raise
    out = with_global_prefix(
        df,
        "k",
        [F.col("k").cast("double").desc()],
        descending=True,
        nulls_last=True,
        count_as="rb",
    ).collect()
    assert out[0].rb == 0


def test_leading_sort_flags_resolution(spark):
    """The tree walker resolves (descending, nulls_last) for bare and
    wrapped shard columns, and declines (None) for bare columns,
    derived expressions, and other attributes — each a case where the
    caller owns the contract."""
    cases = [
        (F.col("k").asc(), (False, False)),
        (F.col("k").desc(), (True, True)),  # Spark desc default: NULLS LAST
        (F.col("k").asc_nulls_last(), (False, True)),
        (F.col("k").desc_nulls_first(), (True, False)),
        (F.col("k").cast("double").desc(), (True, True)),
        (F.col("k").alias("x").asc(), (False, False)),
        (F.col("k"), None),  # bare: no declared direction
        ((F.col("k") * -1).desc(), None),  # derived expression
        (F.col("other").desc(), None),  # different attribute
    ]
    for col, want in cases:
        assert _leading_sort_flags(col, "k") == want, str(col)


def test_sort_order_repr_format_pinned(spark):
    """Canary for the Connect fallback inside _leading_sort_flags:
    Spark normalizes sort-order reprs to
    "Column<'<name> ASC|DESC NULLS FIRST|LAST'>". If an upgrade
    changes this, the fallback (used only where the classic JVM
    column node is unavailable) would stop validating — surface that
    here instead of silently."""
    assert str(F.col("k").desc()) == "Column<'k DESC NULLS LAST'>"
    assert str(F.col("k").asc_nulls_last()) == "Column<'k ASC NULLS LAST'>"
    assert str(F.col("k").desc_nulls_first()) == (
        "Column<'k DESC NULLS FIRST'>"
    )


def test_nan_shard_key_raises_loud(spark):
    """r12 judge finding #2: a NaN leading key must raise the
    module-contract error at execution time, never silently vanish
    from the output."""
    df = spark.createDataFrame(
        [(1.0, 1), (float("nan"), 2), (3.0, 3)], ["k", "n"]
    )
    out = with_global_prefix(
        df, "k", [F.col("k").asc()], count_as="rb", sums={"sb": "n"}
    )
    with pytest.raises(Exception, match="NaN shard key"):
        out.collect()
    # NULL keys stay on the supported sentinel path
    df2 = spark.createDataFrame([(1.0, 1), (None, 2)], ["k", "n"])
    rows = (
        with_global_prefix(
            df2, "k", [F.col("k").asc_nulls_first()], count_as="rb"
        )
        .orderBy("n")
        .collect()
    )
    assert [r.rb for r in rows] == [1, 0]


def test_zipf_shard_key_clamp_is_monotone_past_int64_edge(spark):
    """ADVICE r12: cnt·2²⁰ silently wraps int64 once cnt exceeds 2⁴³
    with ANSI off. The clamped composite must stay weakly DECREASING
    in cnt (shards contiguous in the cnt DESC order) across the clamp
    boundary instead of wrapping sign."""
    from mapreducepy_spark.llm.text import _zipf_shard_key

    big = 1 << 43
    cnts = [1, 1000, big - 2, big - 1, big, big + 5, 1 << 55]
    df = spark.createDataFrame(
        [(c, "aa") for c in cnts], "cnt: long, word: string"
    )
    rows = (
        df.select("cnt", _zipf_shard_key(F.col("cnt"), F.col("word")).alias("sk"))
        .orderBy(F.col("cnt").asc())
        .collect()
    )
    sks = [r.sk for r in rows]
    assert all(a >= b for a, b in zip(sks, sks[1:])), sks
    # past the clamp: exact tie (colocate), never a wrapped positive
    assert sks[-1] == sks[-2] == sks[-3]
    assert all(s < 0 for s in sks)


def test_ensure_table_adopt_survives_quoted_path(spark, tmp_path):
    """ADVICE r12: ensure_table's adoption DDL interpolates the
    orphan path — a warehouse path containing a single quote must be
    escaped, not break (or alter) the statement."""
    import os

    from mapreducepy_spark import warehouse as W

    wh = str(tmp_path / "ware'house")
    os.makedirs(wh, exist_ok=True)
    name = "t_quote_adopt_r16"
    orphan = os.path.join(wh, name)
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    spark.range(5).selectExpr("id", "id * 2 AS v").coalesce(1).write.parquet(
        orphan
    )
    assert os.path.exists(os.path.join(orphan, "_SUCCESS"))

    def _no_rebuild():
        raise AssertionError("adopt path must not rebuild")

    W.ensure_table(
        spark, name, wh, "", _no_rebuild, "test-writer", ["src-fixture"]
    )
    assert spark.catalog.tableExists(name)
    assert spark.table(name).count() == 5
    spark.sql(f"DROP TABLE `{name}`")
