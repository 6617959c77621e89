"""SQL-string entry point (SURVEY.md §3.2 #2).

Every query in the catalog is defined twice by construction — as a
DataFrame builder and as ANSI SQL (the DuckDB oracle). For the
dialect-portable subset below, the SAME SQL text runs unchanged on
``spark.sql``, so users get a pure-SQL interface with no second
implementation to drift: `tests/test_sql.py` proves
``spark.sql(oracle) == builder`` row-for-row.

Queries outside ``PORTABLE`` use DuckDB-specific functions in their
oracle (``list_sum``, ``unnest``, ``json_extract_string``,
``quantile_cont``, …) or interval/window syntax that differs; their
SQL form exists for the oracle check but is not a Spark entry point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import TABLES, load
from .registry import load_catalog

# Verified-portable: spark.sql(oracle) hash-matches the DataFrame
# builder on the fixtures (list discovered empirically, enforced by
# tests/test_sql.py — a dialect regression removes the name here).
PORTABLE = (
    "agg_correlated_scalar",
    "agg_count_distinct",
    "agg_top_revenue",
    "agg_count_histogram",
    "agg_cube",
    "agg_gini",
    "agg_global_share",
    "agg_group",
    "agg_grouping_sets",
    "agg_histogram",
    "agg_key_skew",
    "agg_mode",
    "agg_pivot",
    "agg_rollup",
    "agg_weighted_avg",
    "dedup_exact",
    "dedup_keep_first",
    "dedup_cross_source",
    "distinct_rows",
    "events_markov_entropy",
    "events_paths",
    "filter_pred",
    "fn_levenshtein",
    "join_anti",
    "join_anti_scalar",
    "join_asof",
    "join_bucketed",
    "join_disjunctive",
    "join_exists_chain",
    "join_groupagg_in",
    "join_inner",
    "join_lateral_topk",
    "join_left",
    "join_multi",
    "join_nested_semi",
    "join_semi",
    "join_theta_range",
    "project_expr",
    "scan_count",
    "scan_project",
    "set_except",
    "set_intersect",
    "set_union",
    "sort_limit",
    "text_length_profile",
    "topk_per_group",
    "win_ntile",
    "win_rank",
    # round-7 growth keys, portability verified empirically
    "merge_upsert", "scd2_intervals", "unpivot_long", "graph_degree_stats", "graph_reachability", "win_first_last", "join_null_safe", "events_peak_concurrency", "sample_group_reservoir", "join_min_cost_supplier", "fn_url", "join_asof_forward",
    "join_shipping_priority", "join_local_supplier", "join_market_share", "join_returned_items", "agg_forecast_revenue", "agg_promo_share",
    "join_late_shipments", "agg_nation_profit",
    "join_supplier_part_count", "agg_quantile_cont", "orc_census",
    "scan_partition_prune", "win_cum_distinct",
    # round-8 growth keys, portability verified empirically
    "avro_census", "scan_schema_merge", "agg_mad", "agg_moments",
    "agg_approx_distinct_bound", "join_point_in_time",
    "cdc_snapshot_diff",
    # round-10 growth keys, portability verified empirically
    "pivot_roundtrip",
    # round-11 growth keys, portability verified empirically
    # (split_by_cluster and dedup_incremental stay out: RECURSIVE CTE
    # / unnest — no Spark SQL twin)
    "compaction_plan", "events_views_unconverted", "range_partition_plan",
    "agg_delta_maintenance",
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a temp view, so arbitrary
    ``spark.sql`` text (not just the catalog) can query them."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Run catalog query ``name`` through the SQL entry point."""
    if name not in PORTABLE:
        raise KeyError(
            f"{name!r} is not dialect-portable; use the DataFrame builder"
        )
    register_views(spark, sf_dir)
    return spark.sql(load_catalog()[name].oracle)
