"""Embedding-matrix statistics via Arrow-batched partial aggregation
(SURVEY.md §2.10, LLM family).

``embed_dim_stats`` profiles dimensions independently; this module
adds the CROSS-dimension view — the covariance/correlation structure
— which per-dim explode+groupBy cannot express without shuffling an
O(rows × d²) pair table. The scale-correct shape is the classic
partial-aggregation one: each partition folds its vectors into ONE
(n, Σx, ΣxxT) triple inside an Arrow-batched ``mapInPandas`` (numpy
does the d×d outer-product accumulation), and only O(partitions × d²)
small integer rows ride the shuffle — constant in corpus size. This
is the module that demonstrates the "Pandas UDFs over mapInPandas
where built-ins genuinely can't express it" tier of the design
guide: a d×d integer matmul per batch has no Catalyst expression,
but everything around it stays declarative.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_spread
from ..registry import register

_DIM = 64
# Quantization scale: micro-units. Exactness budget: fixture values
# are |v| < 0.5 ⇒ |q| ≤ 5e5, |q·q| ≤ 2.5e11 — int64 sums stay exact
# up to ~3.7e7 rows per aggregate, far beyond any fixture SF, and
# overflow (9.2e18) needs 3.7e7 MORE rows again.
_SCALE = 1_000_000.0
_SCALE_SQ = _SCALE * _SCALE
_TOP_PAIRS = 16

_PARTIAL_SCHEMA = "n long, s array<long>, ss array<long>"


def _partial_cov(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fold every vector in this partition into one (n, Σq, ΣqqT)
    partial, q being the micro-unit-quantized embedding. Integer
    accumulation ⇒ the partial is exact regardless of batch or row
    order."""
    n = 0
    s = np.zeros(_DIM, dtype=np.int64)
    ss = np.zeros((_DIM, _DIM), dtype=np.int64)
    for batch in it:
        if not len(batch):
            continue
        x = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        q = np.floor(x * _SCALE + 0.5).astype(np.int64)
        n += q.shape[0]
        s += q.sum(axis=0)
        ss += q.T @ q
    if n:
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
        )


_ORACLE_EMBED_COVARIANCE = f"""
WITH v AS (
    SELECT vec_id, embedding FROM embeddings
    WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
      AND len(embedding) = {_DIM}
),
e AS (
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {_SCALE}
                      + 0.5) AS BIGINT) AS q
    FROM v
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
s AS (
    SELECT dim,
           CAST(SUM(q) AS BIGINT) AS s,
           CAST(SUM(q * q) AS BIGINT) AS ss_diag
    FROM e GROUP BY dim
),
p AS (
    SELECT a.dim AS dim_a, b.dim AS dim_b,
           CAST(SUM(a.q * b.q) AS BIGINT) AS ss
    FROM e a
    JOIN e b ON b.vec_id = a.vec_id AND b.dim > a.dim
    GROUP BY a.dim, b.dim
),
c AS (
    SELECT p.dim_a, p.dim_b,
           (CAST(p.ss AS DOUBLE) / nn.n
            - (CAST(sa.s AS DOUBLE) / nn.n)
              * (CAST(sb.s AS DOUBLE) / nn.n)) / {_SCALE_SQ} AS cov,
           (CAST(sa.ss_diag AS DOUBLE) / nn.n
            - (CAST(sa.s AS DOUBLE) / nn.n)
              * (CAST(sa.s AS DOUBLE) / nn.n)) / {_SCALE_SQ} AS var_a,
           (CAST(sb.ss_diag AS DOUBLE) / nn.n
            - (CAST(sb.s AS DOUBLE) / nn.n)
              * (CAST(sb.s AS DOUBLE) / nn.n)) / {_SCALE_SQ} AS var_b
    FROM p
    CROSS JOIN nn
    JOIN s sa ON sa.dim = p.dim_a
    JOIN s sb ON sb.dim = p.dim_b
)
SELECT dim_a, dim_b, cov,
       CASE WHEN var_a > 0 AND var_b > 0
            THEN cov / sqrt(var_a * var_b) ELSE NULL END AS corr
FROM c
ORDER BY abs(cov) DESC, dim_a ASC, dim_b ASC
LIMIT {_TOP_PAIRS}
"""


@register(
    "embed_covariance", _ORACLE_EMBED_COVARIANCE,
    tags=("llm", "similarity", "profile"),
)
def embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-|cov| correlated dimension pairs of the embedding matrix —
    the redundancy detector dimension-wise profiling can't see: two
    dimensions that encode the same signal show |corr| near 1 while
    each looks healthy to ``embed_dim_stats``; a whitened/PCA'd
    export shows near-zero everywhere off-diagonal.

    Scale: corpus-sized work happens entirely inside an
    Arrow-batched ``mapInPandas`` that folds each partition into ONE
    (n, Σq, ΣqqᵀT) integer partial — numpy does the 64×64 outer
    product, so no (row × d²) table ever exists and the shuffle
    carries O(partitions × 4096) longs, independent of row count.
    The 4096-row reassembly (posexplode + groupBy), the 64-row
    moment joins (broadcast), and the 1-row n (broadcast cross join)
    are all constant-size. Top-K is TakeOrdered over ≤2016 pairs.

    Hash parity: quantizing each float to integer micro-units FIRST
    (``floor(v·1e6 + 0.5)``, exact for float32→float64) makes every
    sum an exact BIGINT — partial order, partition count, and engine
    cannot change it — and cov/var/corr are then computed from those
    exact integers by the IDENTICAL double expression on both
    engines, so even the unrounded doubles match bit-for-bit (the
    sim_ann_recall exact-int-end-to-end precedent). Zero-variance
    dims yield NULL corr on both (guarded division).
    """
    raw = load_spread(spark, sf_dir, "embeddings")
    emb = raw.filter(
        F.col("vec_id").isNotNull()
        & F.col("embedding").isNotNull()
        & (F.size("embedding") == _DIM)
    ).select("embedding")
    # The partials feed THREE consumers (n, Σq, Σqqᵀ); without a cut
    # each consumer's subtree would re-run the corpus-sized
    # mapInPandas (measured: 10 MapInPandas nodes in the lazy plan).
    # The partial table is O(partitions) rows ≈ 1 MB, so pin it once
    # — the dedup-family localCheckpoint convention.
    partials = emb.mapInPandas(_partial_cov, _PARTIAL_SCHEMA).localCheckpoint()
    n_tot = partials.agg(F.sum("n").cast("bigint").alias("n"))
    s_tot = (
        partials.select(F.posexplode("s").alias("d0", "q"))
        .groupBy("d0")
        .agg(F.sum("q").cast("bigint").alias("s"))
    )
    ss_tot = (
        partials.select(F.posexplode("ss").alias("idx", "q"))
        .groupBy("idx")
        .agg(F.sum("q").cast("bigint").alias("ss"))
        .select(
            F.expr(f"idx div {_DIM}").alias("i0"),
            (F.col("idx") % _DIM).alias("j0"),
            "ss",
        )
    )
    moments = (
        s_tot.join(
            ss_tot.filter(F.col("i0") == F.col("j0")).select(
                F.col("i0").alias("d0"), F.col("ss").alias("ss_diag")
            ),
            "d0",
        )
        .select(
            (F.col("d0") + 1).cast("bigint").alias("dim"),
            "s",
            "ss_diag",
        )
    )
    pairs = ss_tot.filter(F.col("i0") < F.col("j0")).select(
        (F.col("i0") + 1).cast("bigint").alias("dim_a"),
        (F.col("j0") + 1).cast("bigint").alias("dim_b"),
        "ss",
    )
    ma = moments.select(
        F.col("dim").alias("dim_a"),
        F.col("s").alias("s_a"),
        F.col("ss_diag").alias("ssd_a"),
    )
    mb = moments.select(
        F.col("dim").alias("dim_b"),
        F.col("s").alias("s_b"),
        F.col("ss_diag").alias("ssd_b"),
    )
    n = F.col("n")
    cov = (
        F.col("ss").cast("double") / n
        - (F.col("s_a").cast("double") / n)
        * (F.col("s_b").cast("double") / n)
    ) / F.lit(_SCALE_SQ)
    var_a = (
        F.col("ssd_a").cast("double") / n
        - (F.col("s_a").cast("double") / n)
        * (F.col("s_a").cast("double") / n)
    ) / F.lit(_SCALE_SQ)
    var_b = (
        F.col("ssd_b").cast("double") / n
        - (F.col("s_b").cast("double") / n)
        * (F.col("s_b").cast("double") / n)
    ) / F.lit(_SCALE_SQ)
    return (
        pairs.join(F.broadcast(ma), "dim_a")
        .join(F.broadcast(mb), "dim_b")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "dim_a",
            "dim_b",
            cov.alias("cov"),
            F.when(
                (var_a > 0) & (var_b > 0),
                cov / F.sqrt(var_a * var_b),
            ).alias("corr"),
        )
        .orderBy(
            F.abs(F.col("cov")).desc(),
            F.col("dim_a").asc(),
            F.col("dim_b").asc(),
        )
        .limit(_TOP_PAIRS)
    )


# --- int8 quantization error card -----------------------------------

# Symmetric per-vector int8 quantization: scale = max|v| / 127,
# q_i = round(v_i / scale) ∈ [-127, 127] (the max element maps to
# ±127 exactly, so no clamp is needed). The card a pipeline reads
# before committing an embedding store to int8.
_Q_LEVELS = 127

_ORACLE_EMBED_QUANTIZE = f"""
WITH valid AS (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding,
                                   x -> abs(CAST(x AS DOUBLE)))) AS mx
    FROM embeddings
    WHERE len(embedding) = 64
      AND list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) > 0
),
q AS (
    SELECT vec_id, mx,
           list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {_Q_LEVELS}.0 / mx
                               + 0.5) AS BIGINT)) AS qv,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM valid
),
err AS (
    SELECT vec_id, mx, qv,
           list_transform(range(1, len(v) + 1),
               i -> CAST(floor(abs(v[i] - qv[i] * (mx / {_Q_LEVELS}.0))
                               * 1000000.0 + 0.5) AS BIGINT)) AS e
    FROM q
)
SELECT vec_id,
       (floor(mx * 1000000.0 + 0.5) / 1000000.0) AS max_abs,
       CAST(list_sum(e) AS BIGINT) AS sum_abs_err_u,
       CAST(list_max(e) AS BIGINT) AS max_abs_err_u,
       CAST(len(list_filter(qv, x -> x = 0)) AS BIGINT) AS n_zero_q
FROM err
"""


@register(
    "embed_quantize_error",
    _ORACLE_EMBED_QUANTIZE,
    tags=("llm", "embedding", "quantization"),
)
def embed_quantize_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 symmetric-quantization reconstruction-error
    card: dequantization error mass and peak (in exact integer
    micro-units) plus the count of dimensions that collapse to zero —
    the decision gauge for "can this embedding store ship as int8"
    (4× smaller, SIMD-friendly) that every vector-database migration
    runs first.

    Scale: a pure narrow projection — three higher-order-function
    folds per row, no shuffle, no UDF, no explode; the plan is
    scan → project. Same validity predicate as the similarity family
    (64 dims, norm² > 0 — a zero vector has no quantization scale).

    Hash parity: the quantized code is ``floor(v·127/mx + 0.5)``
    (exact IEEE multiply-divide then the dround floor idiom) and
    every error leaves double-land as ``floor(|v − q·(mx/127)|·1e6 +
    0.5)`` BIGINTs, so the summed/maxed outputs are order-free exact
    integers on both engines; ``max_abs`` is the one rounded double.
    """
    from .similarity import _valid_embeddings

    valid = _valid_embeddings(load_spread(spark, sf_dir, "embeddings"))
    mx = F.array_max(
        F.transform("embedding", lambda x: F.abs(x.cast("double")))
    )
    d = valid.select("vec_id", "embedding", mx.alias("mx"))
    qv = F.transform(
        "embedding",
        lambda x: F.floor(
            x.cast("double") * F.lit(float(_Q_LEVELS)) / F.col("mx")
            + F.lit(0.5)
        ).cast("bigint"),
    )
    d = d.select("vec_id", "embedding", "mx", qv.alias("qv"))
    e = F.transform(
        F.sequence(F.lit(1), F.size("embedding")),
        lambda i: F.floor(
            F.abs(
                F.element_at("embedding", i).cast("double")
                - F.element_at("qv", i)
                * (F.col("mx") / F.lit(float(_Q_LEVELS)))
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("bigint"),
    )
    d = d.select("vec_id", "mx", "qv", e.alias("e"))
    return d.select(
        "vec_id",
        (
            F.floor(F.col("mx") * F.lit(1000000.0) + F.lit(0.5))
            / F.lit(1000000.0)
        ).alias("max_abs"),
        F.aggregate(
            "e", F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).cast("bigint").alias("sum_abs_err_u"),
        F.array_max("e").cast("bigint").alias("max_abs_err_u"),
        F.size(F.filter("qv", lambda x: x == 0)).cast("bigint").alias(
            "n_zero_q"
        ),
    )
