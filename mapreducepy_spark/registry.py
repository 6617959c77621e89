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
    "mapreducepy_spark.llm.pipeline",
)

# Explicit catalog order. The driver evaluates ``queries()`` front to
# back under a bounded budget (rounds 1 AND 2 both stopped at exactly
# the first 50 catalog keys — VERDICT.md r2 "Next round" #1), so
# ordering is evidence policy, not cosmetics. Round-3 policy:
#
# - the 5 keys that landed outside the window in round 2 (added
#   without a _KEY_ORDER entry) come FIRST — they have zero driver
#   rows so far;
# - then the 18 keys whose only green rows date from round 1 (round
#   2's window displaced them) — refresh their evidence;
# - then every operator newly added or code-touched in round 3
#   (touched code must be re-proven, not rest on old rows);
# - the remainder of the first 50 re-confirms round-2-green keys,
#   preferring the LLM-pipeline family (the north star);
# - the tail holds only keys with green round-2 rows plus the three
#   rows-only-by-design keys, so whatever the budget cuts is
#   already-proven ground.
#
# ``load_catalog`` reorders the registry to this sequence and RAISES
# if any registered key is missing from it (round-2 postmortem: five
# keys silently fell to the alphabetical tail, outside any evidence
# window); tests/test_sql.py additionally pins the two lists equal.
_KEY_ORDER = (
    # never driver-checked (added late in round 2 without an order
    # entry — the round-3 priority)
    "agg_histogram", "agg_quantile_disc", "dedup_keep_first",
    "join_skew_salted", "text_decontaminate",
    # round-1-only evidence, displaced by round 2's window
    "join_left", "join_multi", "join_semi", "join_anti",
    "agg_collect",
    # new in round 4 (displacing 13 r1-stale keys to the tail head —
    # sort_limit, set_union/intersect/except, win_ntile, win_dist,
    # topk_per_group, agg_pivot, agg_cube, agg_grouping_sets,
    # agg_rollup, agg_stats, join_full: untouched code, r1-green
    # evidence stands; unproven new keys outrank stale-but-proven
    # ones)
    "events_entropy", "events_session_stats", "agg_gini",
    "text_charlm", "text_zipf", "text_length_profile",
    "dedup_cross_source", "pipeline_clean_corpus",
    "events_inter_arrival", "text_hapax", "events_attribution",
    "dedup_survivors_verified", "events_cooccurrence",
    # new in round 3
    "text_pack_sequences", "text_bigrams", "text_quality_filter",
    "dedup_near_verified", "embed_norm_bins",
    "events_retention", "events_paths", "win_streak",
    "agg_weighted_avg", "agg_mode",
    "text_contamination_ngram", "sample_split",
    "text_repetition", "text_oov_rate", "events_anomaly",
    "events_dau_rolling", "fn_regex",
    "text_keywords", "text_perplexity_proxy", "dedup_minhash_est",
    "agg_pareto", "events_user_lifecycle",
    # code touched in round 3 — re-prove (dedup_near and
    # dedup_clusters ride the _candidate_pairs/_minhash_table
    # refactor that dedup_minhash_est introduced)
    "dedup_jaccard_capped", "sim_knn", "dedup_embedding",
    "dedup_near", "dedup_clusters",
    # ---- position 50 = dedup_clusters: the window ends exactly at
    # the touched-code block above (5 never-checked + 5 r1-stale +
    # 13 round-4 new + 22 round-3 new + 5 touched = 50).
    # Everything below is OUTSIDE the driver window and rests on a
    # green round-1/2 row (r1-stale keys displaced by round 4's new
    # operators first, then the LLM family).
    "sort_limit", "set_union", "set_intersect", "set_except",
    "win_ntile", "win_dist", "topk_per_group", "agg_pivot",
    "agg_cube", "agg_grouping_sets", "agg_rollup", "agg_stats",
    "join_full",
    "dedup_exact", "dedup_simhash", "dedup_ngram_jaccard",
    "sim_ann_lsh", "sim_ann_ivf",
    "text_stats", "text_tfidf", "multimodal_cols",
    "join_asof", "fn_string", "scan_project", "win_session",
    "scan_count", "json_extract", "scan_profile",
    "filter_pred", "project_expr", "distinct_rows",
    "fn_date", "fn_conditional", "fn_json", "fn_levenshtein",
    "fn_math", "fn_array",
    "sample_hash_fraction", "sample_hash_stratified",
    "text_quality", "text_langid", "text_tokens", "text_fingerprint",
    "win_tumbling", "win_sliding",
    "events_funnel", "rollup_multires",
    "join_range_binned",
    "agg_minmax_by", "win_lead_lag", "win_range_frame",
    "join_inner", "join_theta_range",
    "agg_group", "agg_count_distinct", "agg_having",
    "win_rank", "win_running",
    # rows-only by design (approximation / RNG — no oracle possible)
    "agg_approx_distinct", "sample_stratified", "sample_fraction",
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
    in exactly ``_KEY_ORDER``.

    Fails LOUD on drift: a registered key absent from ``_KEY_ORDER``
    (or vice versa) raises instead of being silently appended at the
    tail. Round-2 postmortem: the silent-append fallback let five new
    operators land at catalog positions 72–76, outside the driver's
    bounded 50-key correctness window, so they shipped with zero
    oracle evidence (VERDICT.md r2, "What's wrong" #1/#2).
    """
    for mod in _MODULES:
        importlib.import_module(mod)
    missing = [k for k in REGISTRY if k not in set(_KEY_ORDER)]
    phantom = [k for k in _KEY_ORDER if k not in REGISTRY]
    if missing or phantom:
        raise RuntimeError(
            "registry/_KEY_ORDER drift — evidence policy violated: "
            f"registered but unordered={sorted(missing)!r}, "
            f"ordered but unregistered={sorted(phantom)!r}. "
            "Add every new queries() key to registry._KEY_ORDER inside "
            "the driver's 50-key window."
        )
    return {k: REGISTRY[k] for k in _KEY_ORDER}
