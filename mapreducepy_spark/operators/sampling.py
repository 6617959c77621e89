"""Sampling operators (training-data pipeline surface).

Two families:

- **RNG sampling** (``sample_fraction`` / ``sample_stratified``):
  Spark's native ``sample``/``sampleBy``. Engine-specific Bernoulli
  draws, so rows-only checks (no DuckDB oracle can reproduce them) —
  but DETERMINISTIC for a fixed seed and partitioning, which the
  tests pin down.
- **Hash-bucket sampling** (``sample_hash_fraction`` /
  ``sample_hash_stratified``): keep a row iff the first hex byte of
  ``md5(key)`` falls under a threshold. Fully deterministic and
  ENGINE-INDEPENDENT (md5 of the same string is the same string
  everywhere), so these carry exact DuckDB oracles — and, unlike
  RNG samples, re-running the pipeline (or running it on a different
  engine / partitioning) selects the SAME rows, which is what a
  reproducible training-data pipeline actually wants. The keyed-hash
  trick is also what makes the sample stable under re-partitioning
  — Spark's ``sample`` is NOT (it draws per partition in row order).

Scale notes:

- both families are narrow maps — no shuffle, each partition decides
  independently; at 100 TB it is the cheap first stage of any
  eval-split or pilot-statistics job.
- stratified variants are the production tool for rebalancing a
  skewed corpus (e.g. per-language quotas in a multilingual crawl):
  per-stratum rates, still zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_SEED = 42


@register("sample_fraction", None, tags=("sampling",))
def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% Bernoulli sample of lineitem, seeded (deterministic per
    seed+partitioning; rows-only check by construction)."""
    li = load(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=_SEED).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register("sample_stratified", None, tags=("sampling", "llm"))
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sample of documents: downsample the
    over-represented languages, keep the rest — the corpus-rebalancing
    primitive. Output: per-language kept-counts (stable shape for the
    rows-only check)."""
    docs = load(spark, sf_dir, "documents")
    fractions = {"en": 0.3, "de": 0.8, "fr": 0.8, "es": 0.8, "zh": 1.0}
    kept = docs.sampleBy("lang", fractions, seed=_SEED)
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


# --- hash-bucket (engine-independent, oracle-checked) --------------

# ~10.2% keep rate: first two md5 hex chars < '1a' ⇒ 26 of 256
# byte values survive. Lexicographic compare of lowercase hex equals
# numeric compare of the byte — both engines agree exactly.
_FRACTION_CUT = "1a"

_ORACLE_SAMPLE_HASH = f"""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE substring(md5(concat_ws('|', CAST(l_orderkey AS VARCHAR),
                                   CAST(l_linenumber AS VARCHAR))), 1, 2)
      < '{_FRACTION_CUT}'
"""


@register("sample_hash_fraction", _ORACLE_SAMPLE_HASH, tags=("sampling",))
def sample_hash_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% DETERMINISTIC sample of lineitem by keyed md5 bucket —
    the reproducible-pipeline alternative to ``sample_fraction``:
    identical row selection on any engine, partitioning, or re-run.

    Scale: narrow map, zero shuffle, codegen'd md5 per row; the
    predicate never references RNG state, so it pushes through any
    deterministic rewrite and the sample composes with incremental
    reruns (a row's fate never changes as data grows around it).
    """
    li = load(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    h2 = F.substring(F.md5(key.cast("binary")), 1, 2)
    return li.filter(h2 < _FRACTION_CUT).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


# Per-language keep thresholds on the first md5 byte of doc_id:
# en 77/256 ≈ 0.301, de/fr/es 204/256 ≈ 0.797, zh keep-all.
_STRATA_CUTS = {"en": "4d", "de": "cc", "fr": "cc", "es": "cc"}

_ORACLE_SAMPLE_HASH_STRAT = """
WITH k AS (
    SELECT lang,
           substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h2
    FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept
FROM k
WHERE CASE WHEN lang = 'zh' THEN TRUE
           WHEN lang = 'en' THEN h2 < '4d'
           WHEN lang IN ('de', 'fr', 'es') THEN h2 < 'cc'
           ELSE FALSE END
GROUP BY lang
"""


@register(
    "sample_hash_stratified", _ORACLE_SAMPLE_HASH_STRAT, tags=("sampling", "llm")
)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sample by keyed md5 bucket — deterministic,
    engine-independent corpus rebalancing (downsample over-represented
    languages, keep the rest), reported as per-language kept-counts.

    Scale: same zero-shuffle narrow map as ``sample_hash_fraction``
    plus one combiner-friendly groupBy for the report; quotas change
    by editing a threshold byte, and membership is stable across
    reruns — a document, once in the training set, stays in it.
    """
    docs = load(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2)
    keep = F.when(F.col("lang") == "zh", F.lit(True))
    for lang, cut in _STRATA_CUTS.items():
        keep = keep.when(F.col("lang") == lang, h2 < cut)
    keep = keep.otherwise(F.lit(False))
    return (
        docs.filter(keep)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


# --- deterministic train/val/test split ----------------------------
# Cut points on the first md5 byte of doc_id: train < 'cc' (204/256
# ~ 79.7%), val < 'e6' (230/256 ~ 89.8%), else test.

_SPLIT_TRAIN_CUT = "cc"
_SPLIT_VAL_CUT = "e6"


def split_col(h2) -> Column:
    """The train/val/test label over an md5-prefix column — the ONE
    Spark expression of the split chain, living beside the cut
    constants it reads. Shared by ``sample_split`` and the pipeline
    keys (``pipeline_clean_corpus`` / ``pipeline_drop_explain``) so
    the thresholds and chain structure cannot drift between the
    split operator, the manifest, and the audit (the
    quality_gate_pred rule)."""
    return (
        F.when(h2 < _SPLIT_TRAIN_CUT, "train")
        .when(h2 < _SPLIT_VAL_CUT, "val")
        .otherwise("test")
    )


def split_case_sql(col: str = "h2") -> str:
    """The identical chain as oracle SQL text (DuckDB twin of
    :func:`split_col`)."""
    return (
        f"CASE WHEN {col} < '{_SPLIT_TRAIN_CUT}' THEN 'train'\n"
        f"            WHEN {col} < '{_SPLIT_VAL_CUT}' THEN 'val'\n"
        f"            ELSE 'test' END"
    )


_ORACLE_SAMPLE_SPLIT = f"""
WITH k AS (
    SELECT lang,
           substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS h2
    FROM documents
)
SELECT {split_case_sql()} AS split,
       lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM k
GROUP BY 1, 2
"""


@register("sample_split", _ORACLE_SAMPLE_SPLIT, tags=("sampling", "llm"))
def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by keyed md5
    bucket, reported as per-(split, language) counts — the canonical
    dataset-split operator. A document's split NEVER changes as the
    corpus grows around it (the hash keys on doc_id alone), which is
    what makes incremental re-runs and cross-team reproducibility
    work; RNG splits guarantee neither.

    Scale: narrow map (one md5 + two comparisons per row), zero
    shuffle before the tiny (3 × n_langs)-row aggregate; the same
    predicate applied as a filter materializes any one split with
    full pushdown.
    """
    docs = load(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return docs.groupBy(split_col(h2).alias("split"), "lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


_RESERVOIR_K = 3

_ORACLE_SAMPLE_GROUP_RESERVOIR = f"""
WITH h AS (
    SELECT doc_id, lang, source,
           md5(CAST(doc_id AS STRING)) AS hk
    FROM documents
    WHERE doc_id IS NOT NULL
),
r AS (
    SELECT lang, source, doc_id, hk,
           ROW_NUMBER() OVER (
               PARTITION BY lang, source
               ORDER BY hk ASC, doc_id ASC
           ) AS rn
    FROM h
)
SELECT lang, source, doc_id, CAST(rn AS BIGINT) AS pick
FROM r WHERE rn <= {_RESERVOIR_K}
"""


@register(
    "sample_group_reservoir",
    _ORACLE_SAMPLE_GROUP_RESERVOIR,
    tags=("sampling", "llm"),
)
def sample_group_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum reservoir sample (k=3): within every
    (lang, source) stratum keep the k docs with the SMALLEST
    ``md5(doc_id)`` — the keyed-hash trick turned into a reservoir:
    rank-by-hash is a uniform draw that is deterministic,
    engine-independent, re-run-stable and (unlike a true streaming
    reservoir) embarrassingly parallel. The eval-set/spot-check
    primitive: "give me exactly k docs from every stratum of the
    100 TB corpus, the same k every run".

    Scale: the ``topk_per_group`` shape on a hash key — one shuffle
    on the stratum key; rows beyond the per-partition top-k are
    droppable map-side (window top-k; at extreme per-stratum fanout
    the same plan runs as partial top-k per partition then merge).
    NULL doc_id rows are excluded by contract (they are quarantine
    rows, not sampleable corpus).

    Hash parity: md5 of the decimal string of a BIGINT is identical
    on both engines; (hk, doc_id) is a total order, so rank ties are
    impossible and the pick set is unique.
    """
    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    w = Window.partitionBy("lang", "source").orderBy(
        F.col("hk").asc(), F.col("doc_id").asc()
    )
    return (
        docs.select(
            "lang", "source", "doc_id",
            F.md5(F.col("doc_id").cast("string")).alias("hk"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RESERVOIR_K)
        .select(
            "lang", "source", "doc_id",
            F.col("rn").cast("bigint").alias("pick"),
        )
    )


# --- weight-proportional deterministic sampling ----------------------

# Acceptance: keep a doc iff u16 < floor(w·65536), where u16 is the
# first 4 md5 hex chars of doc_id as an integer (a deterministic
# uniform in [0, 65536)) and w = least(1, n_chars/800) is the
# quality-proportional keep probability. Every term is integer or a
# single double multiply+floor — identical on both engines; hex→int
# is Spark conv(h,16,10) ≡ DuckDB ('0x'||h)::BIGINT (verified equal).
_W_DENOM = 800.0

_ORACLE_SAMPLE_WEIGHTED = f"""
WITH t AS (
    SELECT lang, source, doc_id, n_chars,
           ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
               AS u16,
           CAST(floor(least(1.0, CAST(n_chars AS DOUBLE) / {_W_DENOM})
                      * 65536.0) AS BIGINT) AS cut
    FROM documents
)
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN u16 < cut THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(SUM(CASE WHEN u16 < cut THEN doc_id ELSE 0 END) AS BIGINT)
           AS kept_id_sum
FROM t
GROUP BY lang, source
"""


@register(
    "sample_weighted_hash", _ORACLE_SAMPLE_WEIGHTED, tags=("sampling", "llm")
)
def sample_weighted_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional DETERMINISTIC sampling — the mixture-
    building primitive: each document is kept with probability equal
    to its quality weight (here length-proportional, capped at 1),
    decided by comparing a keyed-hash uniform against the weight.
    Unlike RNG importance sampling, the decision is a pure function
    of (doc_id, features): re-runs, engine swaps and repartitions
    keep the SAME documents, and upweighting a source in tomorrow's
    mixture never resamples yesterday's survivors. Census per (lang,
    source) with an exact kept-id checksum so the hash pins
    membership, not just counts.

    Scale: narrow map (one md5 + one compare per row), zero shuffle
    before the |langs|·|sources| census; as a filter it composes
    with pushdown like the other hash samplers. NULL doc_id or
    n_chars ⇒ NULL predicate ⇒ dropped on both engines (quarantine
    rows are not sampleable corpus).

    Hash parity: u16 and cut are exact BIGINTs; the only double op
    (least + divide + floor·65536) runs the same IEEE shape on both
    engines.
    """
    docs = load(spark, sf_dir, "documents")
    u16 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4),
        16, 10,
    ).cast("bigint")
    cut = F.floor(
        F.least(
            F.lit(1.0), F.col("n_chars").cast("double") / F.lit(_W_DENOM)
        )
        * F.lit(65536.0)
    ).cast("bigint")
    kept = u16 < cut
    return (
        docs.select("lang", "source", "doc_id", kept.alias("kept"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("kept"), F.col("doc_id")).otherwise(0))
            .cast("bigint")
            .alias("kept_id_sum"),
        )
    )
