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


# --- range-partition planner (the global-sort layout op) -------------

# Output partition count for the plan. 16 against ~14.7k distinct
# orderkeys at sf0.01 gives ~920 keys per range — enough rows per
# bucket that the skew signal (multi-line orders) is visible.
_RANGE_BUCKETS = 16

# Shard count for the distributed prefix sum over the key histogram
# (the "reduce tasks" of the two-level cumulative count). A constant:
# shard-total frames must stay broadcast-sized by construction. At
# 100 TB set this near the cluster's target parallelism.
_RANGE_SHARDS = 64

_ORACLE_RANGE_PARTITION_PLAN = f"""
WITH h AS (
    SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_orderkey
),
c AS (
    SELECT k, n,
           COALESCE(SUM(n) OVER (
               ORDER BY k ASC NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cum_before,
           SUM(n) OVER () AS tot
    FROM h
)
SELECT CAST(FLOOR(cum_before * {float(_RANGE_BUCKETS)} / tot) AS BIGINT)
           AS bucket_id,
       CAST(MIN(k) AS BIGINT) AS lo_key,
       CAST(MAX(k) AS BIGINT) AS hi_key,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(n) AS BIGINT) AS n_rows
FROM c
GROUP BY 1
"""


@register(
    "range_partition_plan", _ORACLE_RANGE_PARTITION_PLAN,
    tags=("sort", "layout", "etl"),
)
def range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition split-point planner — the layout op behind a
    100 TB global sort / sorted write (Spark's own RangePartitioner,
    made exact and deterministic): assign every join/sort KEY to one
    of {_RANGE_BUCKETS} contiguous key ranges so each range carries
    ~1/{_RANGE_BUCKETS} of the ROWS, and report each range's key
    span and actual row load. A key is ATOMIC (all its rows land in
    one bucket — the range-partitioner contract), so hot keys
    surface as fat buckets: the card IS the skew gauge a planner
    reads before choosing salting (``join_skew_salted``) or AQE skew
    splitting for the sort.

    Scale: the fact table is touched ONCE by a map-side-combining
    key histogram (|distinct keys| rows out); the rank arithmetic —
    cumulative rows BEFORE each key, bucket = floor(cum ×
    {_RANGE_BUCKETS} / total) — is a DISTRIBUTED two-level prefix
    sum over the histogram (VERDICT r11 #2, replacing the
    single-partition window that funneled every distinct key through
    one task):

    1. Every key gets a SHARD id from a deterministic,
       order-preserving function of its value: floor((k − kmin) ×
       {_RANGE_SHARDS} / span) between the broadcast global min/max.
       Monotonic in k ⇒ shards are contiguous, ordered key ranges —
       the property the offset algebra needs. Deliberately NOT
       ``repartitionByRange`` + ``spark_partition_id()``: the
       RangePartitioner samples with a per-execution seed, and this
       shard column feeds TWO plan branches (local prefix + shard
       totals) — if the optimizer ever failed to reuse the exchange,
       sampled boundaries could disagree between branches and corrupt
       the offsets. A pure function of the value cannot.
    2. A window PARTITIONED BY shard computes each key's local
       prefix sum — the same per-group rank shape as
       ``agg_quantile_disc``, parallel across shards.
    3. Shard totals (one row per shard — {_RANGE_SHARDS}, a
       constant, never data-sized) get their exclusive prefix AND
       the global total from one broadcast self-join;
       cum_before = shard offset + local prefix.

    Spark's sampling RangePartitioner approximates the split points
    in one pass; this exact form costs the histogram shuffle and is
    deterministic across runs/engines/shard-counts, which a
    replayable 100 TB layout wants. Value-range sharding is uneven
    under key-space skew — that only unbalances SHARD sizes (a
    performance matter; raise {_RANGE_SHARDS} or pre-hash the key
    space), never the answer. At 100 TB, cache the histogram so the
    three tiny sibling aggregates don't re-scan the fact table if
    exchange reuse is disabled.

    Hash parity: all-integer counts and key bounds; bucket ids are
    floor() over exact integer products inside double precision
    (<2^53 at any realistic scale). The shard id itself may round in
    double for huge spans — harmless, monotonicity is all it needs.
    NULL keys sort NULLS FIRST on both sides, get shard −1 (below
    every real shard), land in bucket 0 via cum_before = 0, and
    vanish from MIN/MAX identically; duplicate fixture rows only
    raise a key's n, never split it.
    """
    from .prefix import with_global_prefix

    li = load(spark, sf_dir, "lineitem")
    hist = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # the two-level distributed prefix sum lives in operators.prefix
    # (extracted from this operator's hand-rolled r12 form — r12
    # review: two drifting copies of the trickiest algebra); shard on
    # the key itself, NULLS FIRST, exact BIGINT row counts
    c = with_global_prefix(
        hist,
        "k",
        [F.col("k").asc_nulls_first()],
        sums={"cum_before": "n"},
        total_sums={"tot": "n"},
    )
    bucket = F.floor(
        F.col("cum_before") * F.lit(float(_RANGE_BUCKETS)) / F.col("tot")
    ).cast("bigint")
    return c.groupBy(bucket.alias("bucket_id")).agg(
        F.min("k").cast("bigint").alias("lo_key"),
        F.max("k").cast("bigint").alias("hi_key"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )
