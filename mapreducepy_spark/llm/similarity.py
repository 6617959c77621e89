"""Similarity search over the ``embeddings`` table (SURVEY.md §2.10
L3 + scale-path variants).

All dot products are JVM-side Catalyst folds (``zip_with`` +
``aggregate``) over doubles in element order — bit-identical to the
oracle's sequential ``list_sum`` — no Python, no UDF.

- ``sim_knn``        — brute-force top-k cosine (the correctness
  baseline every ANN variant is measured against).
- ``sim_ann_lsh``    — sign-LSH bucketed ANN (the 100 TB path).
- ``dedup_embedding``— cosine near-dup pairs above a threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load
from ..registry import register
from ..rounding import dround

# Spark-side dot product of two double-cast float vectors.
_SPARK_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "cast(0 as double), (acc, x) -> acc + x)"
)
# DuckDB equivalent: element-order sequential sum (bit-identical).
_DUCK_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)

_K = 3

_ORACLE_SIM_KNN = f"""
WITH pairs AS (
    SELECT a.vec_id AS query_id,
           b.vec_id AS neighbor_id,
           {_DUCK_DOT.format(a="a.embedding", b="b.embedding")}
           / (sqrt({_DUCK_DOT.format(a="a.embedding", b="a.embedding")})
              * sqrt({_DUCK_DOT.format(a="b.embedding", b="b.embedding")})) AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.vec_id <> b.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cos_sim,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
           ) AS rn
    FROM pairs
)
SELECT query_id, neighbor_id, (floor((cos_sim) * 1000000.0 + 0.5) / 1000000.0) AS cos_sim
FROM ranked
WHERE rn <= {_K}
"""


@register("sim_knn", _ORACLE_SIM_KNN, tags=("llm", "similarity"))
def sim_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 — brute-force top-3 cosine neighbors per vector.

    Scale: O(n²·d) — this is the CORRECTNESS baseline, not the scale
    path. At 100 TB: normalize once, broadcast the (much smaller)
    query set against the corpus, or switch to ``sim_ann_lsh``'s
    bucketed search. The per-pair math itself is a codegen'd fold —
    no Python in the loop.
    """
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("va")
    )
    b = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("vb")
    )
    dot_ab = F.expr(_SPARK_DOT.format(a="va", b="vb"))
    norm_a = F.sqrt(F.expr(_SPARK_DOT.format(a="va", b="va")))
    norm_b = F.sqrt(F.expr(_SPARK_DOT.format(a="vb", b="vb")))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot_ab / (norm_a * norm_b)).alias("cos_sim"),
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


def _duck_bucket(col: str) -> str:
    return " + ".join(
        f"(CASE WHEN CAST({col}[{i + 1}] AS DOUBLE) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_N_PLANES)
    )


_ORACLE_SIM_ANN = f"""
WITH bucketed AS (
    SELECT vec_id, embedding, {_duck_bucket("embedding")} AS bucket
    FROM embeddings
),
pairs AS (
    SELECT a.vec_id AS query_id,
           b.vec_id AS neighbor_id,
           a.bucket AS bucket,
           {_DUCK_DOT.format(a="a.embedding", b="b.embedding")}
           / (sqrt({_DUCK_DOT.format(a="a.embedding", b="a.embedding")})
              * sqrt({_DUCK_DOT.format(a="b.embedding", b="b.embedding")})) AS cos_sim
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
       (floor((cos_sim) * 1000000.0 + 0.5) / 1000000.0) AS cos_sim
FROM ranked
WHERE rn = 1
"""


@register("sim_ann_lsh", _ORACLE_SIM_ANN, tags=("llm", "similarity", "lsh"))
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbor: sign-LSH bucket, then exact
    top-1 cosine WITHIN the bucket only.

    Scale: the equi-join on ``bucket`` turns O(n²) into
    Σ O(bucket²) — a shuffle-partitioned hash join. Recall is tuned
    by #planes (bucket granularity) and #independent tables
    (union of probes); both are embarrassingly parallel. This is the
    IVF-style scale path for ``sim_knn``.
    """
    emb = load(spark, sf_dir, "embeddings")
    bucket = None
    for i in range(_N_PLANES):
        term = F.when(
            F.element_at("embedding", i + 1).cast("double") > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    bucketed = emb.select(
        "vec_id", "embedding", bucket.cast("int").alias("bucket")
    )
    a = bucketed.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("va"),
        F.col("bucket").alias("bucket"),
    )
    b = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("vb"),
        F.col("bucket").alias("bucket_b"),
    )
    dot_ab = F.expr(_SPARK_DOT.format(a="va", b="vb"))
    norm_a = F.sqrt(F.expr(_SPARK_DOT.format(a="va", b="va")))
    norm_b = F.sqrt(F.expr(_SPARK_DOT.format(a="vb", b="vb")))
    pairs = (
        a.join(
            b,
            (F.col("bucket") == F.col("bucket_b"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            (dot_ab / (norm_a * norm_b)).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id", "neighbor_id", "bucket", dround("cos_sim", 6).alias("cos_sim")
        )
    )


_DUP_THRESHOLD = 0.9

_ORACLE_DEDUP_EMBEDDING = f"""
SELECT a.vec_id AS vec_a,
       b.vec_id AS vec_b,
       (floor(({_DUCK_DOT.format(a="a.embedding", b="b.embedding")}
             / (sqrt({_DUCK_DOT.format(a="a.embedding", b="a.embedding")})
                * sqrt({_DUCK_DOT.format(a="b.embedding", b="b.embedding")}))) * 1000000.0 + 0.5) / 1000000.0) AS cos_sim
FROM embeddings a
JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_DUCK_DOT.format(a="a.embedding", b="b.embedding")}
      / (sqrt({_DUCK_DOT.format(a="a.embedding", b="a.embedding")})
         * sqrt({_DUCK_DOT.format(a="b.embedding", b="b.embedding")})) >= {_DUP_THRESHOLD}
"""


@register("dedup_embedding", _ORACLE_DEDUP_EMBEDDING, tags=("llm", "dedup", "similarity"))
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ 0.9).

    Scale: shown brute-force for oracle parity; the production plan
    is ``sim_ann_lsh``'s bucketing as a pre-filter, then this exact
    check within buckets (identical algebra, equi-join added).
    """
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    dot_ab = F.expr(_SPARK_DOT.format(a="va", b="vb"))
    norm_a = F.sqrt(F.expr(_SPARK_DOT.format(a="va", b="va")))
    norm_b = F.sqrt(F.expr(_SPARK_DOT.format(a="vb", b="vb")))
    cos = dot_ab / (norm_a * norm_b)
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .filter(cos >= _DUP_THRESHOLD)
        .select("vec_a", "vec_b", dround(cos, 6).alias("cos_sim"))
    )
