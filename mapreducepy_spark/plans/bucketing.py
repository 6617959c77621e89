"""Bucketed (pre-shuffled) tables: the co-located-join path.

A join between two tables bucketed by the join key into the same
number of buckets needs NO shuffle at read time — each bucket file
pair joins locally. At 100 TB this converts every repeated fact⋈fact
join on a stable key (user_id, doc_id) from a full-cluster shuffle
into a partition-local merge; the one-time bucketing write is
amortized across every downstream join, aggregation and dedup pass
keyed the same way. (``DataFrameWriter.bucketBy`` requires a managed
table — ``saveAsTable`` — because the bucket metadata lives in the
catalog, not the directory layout.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and
    optionally sorted) by ``bucket_cols`` — the write pays the shuffle
    once so subsequent same-key joins/aggregations never do.

    ``sort_cols`` additionally sorts within each bucket file, which
    lets a downstream sort-merge join skip its sort as well.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed managed table (bucket metadata comes from the
    catalog, so the scan reports its output partitioning and Catalyst
    can elide the join-side Exchange)."""
    return spark.table(table)
