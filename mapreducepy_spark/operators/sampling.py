"""Sampling operators (training-data pipeline surface).

Sampling is inherently engine-specific RNG, so these are rows-only
checks (no DuckDB oracle can reproduce Spark's Bernoulli draws) —
but they are DETERMINISTIC for a fixed seed and partitioning, which
the tests pin down: same seed ⇒ same sample, different seed ⇒
(overwhelmingly likely) different sample.

Scale notes:

- ``sample`` is a narrow map — no shuffle, each partition draws
  independently; at 100 TB it is the cheap first stage of any
  eval-split or pilot-statistics job.
- ``sampleBy`` (stratified) is the production tool for rebalancing a
  skewed corpus (e.g. per-language quotas in a multilingual crawl):
  per-stratum Bernoulli rates, still zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
