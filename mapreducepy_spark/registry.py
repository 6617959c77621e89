"""Query catalog: the single source of truth behind ``__spark_entry__.py``.

Every operator from SURVEY.md §2 registers itself here with

- a **builder** ``(spark, sf_dir) -> DataFrame`` (pure DataFrame API,
  aliased columns), and
- an **oracle**: the equivalent ANSI SQL DuckDB runs on the same
  parquet tables (``None`` for ops that are not SQL-expressible —
  the driver then records a weaker rows-only check).

The alias discipline (FIXTURES.md "hash-parity gotchas") is enforced
socially: builder and oracle are written together, column-for-column,
and ``tests/test_parity.py`` runs both sides on sf0.001 and compares
row-count + dtype-kind + canonicalized values — a local mirror of the
driver's order-insensitive value-hash gate.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}

# Modules whose import populates REGISTRY (import order is
# irrelevant to catalog order — see _KEY_ORDER below).
_MODULES = (
    "mapreducepy_spark.operators.scans",
    "mapreducepy_spark.operators.filters",
    "mapreducepy_spark.operators.joins",
    "mapreducepy_spark.operators.aggregates",
    "mapreducepy_spark.operators.windows",
    "mapreducepy_spark.operators.sorts",
    "mapreducepy_spark.operators.sets",
    "mapreducepy_spark.operators.temporal",
    "mapreducepy_spark.operators.sampling",
    "mapreducepy_spark.functions.scalar",
    "mapreducepy_spark.llm.dedup",
    "mapreducepy_spark.llm.similarity",
    "mapreducepy_spark.llm.text",
    "mapreducepy_spark.llm.multimodal",
)

# Explicit catalog order. The driver evaluates ``queries()`` front to
# back under a bounded budget (round 1 stopped at exactly 50 of 68
# keys, starving the whole llm.* family of correctness rows —
# VERDICT.md "What's wrong" #3), so ordering is evidence policy, not
# cosmetics:
#
# - every key that round 1 left failing or untested sits inside the
#   first 40 positions;
# - the LLM-pipeline family (the engine's north star) runs right
#   after the cheap scan/filter/function smoke keys;
# - the tail holds only keys with green round-1 rows, so whatever the
#   budget cuts is already-proven ground.
#
# ``load_catalog`` reorders the registry to this sequence; a key
# registered but missing here lands at the end (alphabetically), and
# tests/test_sql.py pins the two lists equal so drift is loud.
_KEY_ORDER = (
    # cheap smoke + round-1 fixes
    "scan_project", "scan_count", "json_extract", "scan_profile",
    "filter_pred", "project_expr", "distinct_rows",
    "fn_date", "fn_conditional", "fn_json", "fn_levenshtein",
    "fn_string", "fn_math", "fn_array",
    # new in round 2 (hash-checked deterministic sampling; df-capped
    # skew-bounded jaccard)
    "sample_hash_fraction", "sample_hash_stratified",
    "dedup_jaccard_capped",
    # LLM data-pipeline family (untested in round 1)
    "dedup_exact", "dedup_near", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_clusters", "dedup_embedding",
    "sim_knn", "sim_ann_lsh", "sim_ann_ivf",
    "text_stats", "text_tfidf", "text_quality",
    "text_langid", "text_tokens", "text_fingerprint",
    "multimodal_cols",
    # events-table keys (nanos failures in round 1)
    "win_tumbling", "win_sliding", "win_session",
    "events_funnel", "rollup_multires",
    "join_asof", "join_range_binned",
    "agg_minmax_by", "win_lead_lag", "win_range_frame",
    # round-1 green core
    "join_inner", "join_theta_range",
    "agg_group", "agg_count_distinct", "agg_having",
    "win_rank", "win_running", "topk_per_group",
    "agg_approx_distinct", "sample_stratified", "sample_fraction",
    # round-1 green tail
    "join_left", "join_multi", "join_semi", "join_anti", "join_full",
    "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_pivot",
    "agg_stats", "agg_collect",
    "win_ntile", "win_dist", "sort_limit",
    "set_union", "set_intersect", "set_except",
)


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    """Decorator: add a query builder to the catalog."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, builder=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def load_catalog() -> dict[str, Query]:
    """Import all operator modules (idempotent) and return the catalog
    in ``_KEY_ORDER`` (unlisted keys appended alphabetically)."""
    for mod in _MODULES:
        importlib.import_module(mod)
    ordered = {k: REGISTRY[k] for k in _KEY_ORDER if k in REGISTRY}
    for k in sorted(REGISTRY):
        if k not in ordered:
            ordered[k] = REGISTRY[k]
    return ordered
