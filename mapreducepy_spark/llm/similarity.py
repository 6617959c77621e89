"""Similarity search over the ``embeddings`` table (SURVEY.md §2.10
L3 + scale-path variants).

All vector math is JVM-side Catalyst folds over doubles in element
order — bit-identical to the oracle's sequential ``list_sum`` — no
Python, no UDF.

Performance shape (measured at sf0.1 in round 1): computing
dot/norm_a/norm_b per PAIR costs three 64-element folds × n² pairs.
Instead every variant pre-normalizes each vector ONCE (n folds), so
the pairwise kernel is a single fold: cosine(a,b) = dot(â, b̂). The
oracle SQL mirrors the exact same two-step computation so both
engines produce bit-identical doubles.

- ``sim_knn``         — brute-force top-k cosine (correctness
  baseline every ANN variant is measured against).
- ``sim_ann_lsh``     — sign-LSH bucketed ANN (the 100 TB path).
- ``dedup_embedding`` — cosine near-dup pairs above a threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load
from ..registry import register
from ..rounding import dround

# --- shared kernels ------------------------------------------------

# Spark: squared L2 norm of a float vector (double fold).
_SPARK_NORM_SQ = (
    "aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), "
    "cast(0 as double), (acc, x) -> acc + x)"
)
# Spark: scale to unit length (norm_sq is a prior column).
_SPARK_UNIT = "transform(embedding, x -> cast(x as double) / sqrt(norm_sq))"
# Spark: dot of two pre-normalized double vectors = cosine.
# Measured alternatives at sf0.1 (4M-pair kernel): per-pair norm
# recompute 72 s; flat 64-term element_at sum 44 s (codegen bails on
# the huge tree); zip_with+aggregate fold over pre-normalized
# vectors 28 s — the fold wins, keep it.
_DIM = 64
_SPARK_COS = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
    "cast(0 as double), (acc, x) -> acc + x)"
)

# DuckDB mirrors, element-order sequential (bit-identical).
_DUCK_NORM_SQ = (
    "list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)
_DUCK_UNIT = "list_transform(embedding, x -> CAST(x AS DOUBLE) / sqrt(norm_sq))"
_DUCK_COS = (
    "list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"
)

_DUCK_NORMED_CTE = f"""
normed AS (
    SELECT vec_id, {_DUCK_UNIT} AS unit
    FROM (SELECT vec_id, embedding, {_DUCK_NORM_SQ} AS norm_sq FROM embeddings)
)
"""


def _normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id + unit-length double vector (one fold per vector).

    Filters to dim == _DIM so the flat dot-product kernel is safe
    (fixtures are uniformly 64-dim; a ragged production corpus would
    drop mis-sized vectors here, loudly loggable).
    """
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.size("embedding") == _DIM)
        .withColumn("norm_sq", F.expr(_SPARK_NORM_SQ))
        .select("vec_id", F.expr(_SPARK_UNIT).alias("unit"))
    )


_K = 3

_ORACLE_SIM_KNN = f"""
WITH {_DUCK_NORMED_CTE},
pairs AS (
    SELECT a.vec_id AS query_id,
           b.vec_id AS neighbor_id,
           {_DUCK_COS.format(a="a.unit", b="b.unit")} AS cos_sim
    FROM normed a
    JOIN normed b ON a.vec_id <> b.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cos_sim,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
           ) AS rn
    FROM pairs
)
SELECT query_id, neighbor_id,
       (floor(cos_sim * 1000000.0 + 0.5) / 1000000.0) AS cos_sim
FROM ranked
WHERE rn <= {_K}
"""


@register("sim_knn", _ORACLE_SIM_KNN, tags=("llm", "similarity"))
def sim_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 — brute-force top-3 cosine neighbors per vector.

    Scale: O(n²·d) — the CORRECTNESS baseline, not the scale path
    (that's ``sim_ann_lsh``). Pre-normalization makes the pairwise
    kernel one fold; at cluster scale the query side would also be
    ``broadcast()`` against a partitioned corpus so the n² never
    shuffles.
    """
    normed = _normalized(spark, sf_dir)
    a = normed.select(F.col("vec_id").alias("query_id"), F.col("unit").alias("ua"))
    b = normed.select(F.col("vec_id").alias("neighbor_id"), F.col("unit").alias("ub"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(_SPARK_COS.format(a="ua", b="ub")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _K)
        .select("query_id", "neighbor_id", dround("cos_sim", 6).alias("cos_sim"))
    )


# --- sign-LSH bucketed ANN ----------------------------------------
# Bucket key = sign bits of the first 4 dimensions (axis-aligned
# random-hyperplane LSH; at production scale the planes are seeded
# random vectors and several independent bucket tables are unioned).

_N_PLANES = 4

_DUCK_BUCKET = " + ".join(
    f"(CASE WHEN unit[{i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
    for i in range(_N_PLANES)
)

_ORACLE_SIM_ANN = f"""
WITH {_DUCK_NORMED_CTE},
bucketed AS (
    SELECT vec_id, unit, {_DUCK_BUCKET} AS bucket
    FROM normed
),
pairs AS (
    SELECT a.vec_id AS query_id,
           b.vec_id AS neighbor_id,
           a.bucket AS bucket,
           {_DUCK_COS.format(a="a.unit", b="b.unit")} AS cos_sim
    FROM bucketed a
    JOIN bucketed b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, bucket, cos_sim,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
           ) AS rn
    FROM pairs
)
SELECT query_id, neighbor_id, CAST(bucket AS INT) AS bucket,
       (floor(cos_sim * 1000000.0 + 0.5) / 1000000.0) AS cos_sim
FROM ranked
WHERE rn = 1
"""


@register("sim_ann_lsh", _ORACLE_SIM_ANN, tags=("llm", "similarity", "lsh"))
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbor: sign-LSH bucket, then exact
    top-1 cosine WITHIN the bucket only.

    Scale: the equi-join on ``bucket`` turns O(n²) into
    Σ O(bucket²) — a shuffle-partitioned hash join. Recall is tuned
    by #planes (bucket granularity) and #independent tables (union
    of probes); both embarrassingly parallel. This is the IVF-style
    scale path for ``sim_knn``.
    """
    normed = _normalized(spark, sf_dir)
    bucket = None
    for i in range(_N_PLANES):
        term = F.when(F.element_at("unit", i + 1) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        bucket = term if bucket is None else bucket + term
    bucketed = normed.select("vec_id", "unit", bucket.cast("int").alias("bucket"))
    a = bucketed.select(
        F.col("vec_id").alias("query_id"),
        F.col("unit").alias("ua"),
        F.col("bucket").alias("bucket"),
    )
    b = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("unit").alias("ub"),
        F.col("bucket").alias("bucket_b"),
    )
    pairs = a.join(
        b,
        (F.col("bucket") == F.col("bucket_b"))
        & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "query_id",
        "neighbor_id",
        "bucket",
        F.expr(_SPARK_COS.format(a="ua", b="ub")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            dround("cos_sim", 6).alias("cos_sim"),
        )
    )


_DUP_THRESHOLD = 0.9

_ORACLE_DEDUP_EMBEDDING = f"""
WITH {_DUCK_NORMED_CTE},
pairs AS (
    SELECT a.vec_id AS vec_a,
           b.vec_id AS vec_b,
           {_DUCK_COS.format(a="a.unit", b="b.unit")} AS cos_sim
    FROM normed a
    JOIN normed b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       (floor(cos_sim * 1000000.0 + 0.5) / 1000000.0) AS cos_sim
FROM pairs
WHERE cos_sim >= {_DUP_THRESHOLD}
"""


@register(
    "dedup_embedding", _ORACLE_DEDUP_EMBEDDING, tags=("llm", "dedup", "similarity")
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.9).

    Scale: shown brute-force for oracle parity; the production plan
    is ``sim_ann_lsh``'s bucketing as a pre-filter, then this exact
    check within buckets (identical algebra, equi-join added).
    """
    normed = _normalized(spark, sf_dir)
    a = normed.select(F.col("vec_id").alias("vec_a"), F.col("unit").alias("ua"))
    b = normed.select(F.col("vec_id").alias("vec_b"), F.col("unit").alias("ub"))
    cos = F.expr(_SPARK_COS.format(a="ua", b="ub"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= _DUP_THRESHOLD)
        .select("vec_a", "vec_b", dround("cos_sim", 6).alias("cos_sim"))
    )
