"""Sort / limit / top-k (SURVEY.md §2.6).

MapReduce origin: per-mapper heap + single-reducer merge. Spark's
physical top-k is ``TakeOrderedAndProject`` — each partition keeps a
k-heap, the driver merges k×partitions rows — so a global
ORDER BY + LIMIT never materializes a total sort at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load
from ..registry import register

_ORACLE_SORT_LIMIT = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC
LIMIT 25
"""


@register("sort_limit", _ORACLE_SORT_LIMIT, tags=("sort",))
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 — global top-25 orders by price (deterministic tie-break).

    Scale: plans as TakeOrderedAndProject (per-partition heaps), not
    a full sort — O(n) scan, O(k) result, no shuffle.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


_ORACLE_TOPK_PER_GROUP = """
SELECT s_suppkey, l_orderkey, l_linenumber, l_extendedprice
FROM (
    SELECT l.l_suppkey AS s_suppkey, l.l_orderkey, l.l_linenumber, l.l_extendedprice,
           ROW_NUMBER() OVER (
               PARTITION BY l.l_suppkey
               ORDER BY l.l_extendedprice DESC NULLS LAST,
                        l.l_orderkey ASC, l.l_linenumber ASC
           ) AS rn
    FROM lineitem l
) t
WHERE rn <= 3
"""


@register("topk_per_group", _ORACLE_TOPK_PER_GROUP, tags=("sort",))
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 — top-3 lineitems by price per supplier.

    Scale: one shuffle on suppkey; Spark 3.4+ inserts a
    WindowGroupLimit (per-partition heap) below the shuffle when the
    window is a row_number ≤ k filter, so the shuffle carries at most
    k rows per (partition, key) — the MapReduce combiner-heap trick,
    automatic.
    """
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    return (
        li.select(
            F.col("l_suppkey").alias("s_suppkey"),
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )
