"""Projection / filter / distinct (SURVEY.md §2.2).

MapReduce origin: filter = mapper that conditionally emits; project =
mapper reshaping the value; distinct = map-to-key + reduce-to-one.
Here all three are declarative, so Catalyst folds them into the scan
(no shuffle except for ``distinct``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from ..rounding import dround, dround_sql

_ORACLE_FILTER_PRED = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 30
  AND l_returnflag IN ('A', 'R')
  AND (l_linestatus = 'F' OR l_discount > 0.05)
  AND NOT (l_tax IS NULL)
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
"""


@register("filter_pred", _ORACLE_FILTER_PRED, tags=("filter",))
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — compound predicate (AND/OR/NOT, BETWEEN, IN, IS NULL).

    Scale: the whole conjunction is codegen'd; the BETWEEN/>= parts
    push to parquet min/max row-group skipping. Zero shuffles.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 30)
        & F.col("l_returnflag").isin("A", "R")
        & ((F.col("l_linestatus") == "F") | (F.col("l_discount") > 0.05))
        & ~F.col("l_tax").isNull()
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )


_ORACLE_PROJECT_EXPR = f"""
SELECT l_orderkey,
       l_linenumber,
       {dround_sql("l_extendedprice * (1 - l_discount)", 2)} AS revenue,
       CASE WHEN l_tax > 0.04 THEN 'high'
            WHEN l_tax > 0.02 THEN 'mid'
            ELSE 'low' END AS tax_band,
       CAST(l_quantity AS BIGINT) % 7 AS qty_mod
FROM lineitem
"""


@register("project_expr", _ORACLE_PROJECT_EXPR, tags=("filter",))
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — computed columns: arithmetic + CASE WHEN.

    Scale: pure narrow map, whole-stage codegen'd, no shuffle.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("revenue"),
        F.when(F.col("l_tax") > 0.04, "high")
        .when(F.col("l_tax") > 0.02, "mid")
        .otherwise("low")
        .alias("tax_band"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
    )


_ORACLE_DISTINCT_ROWS = """
SELECT DISTINCT l_returnflag, l_linestatus, CAST(year(l_shipdate) AS INT) AS ship_year
FROM lineitem
"""


@register("distinct_rows", _ORACLE_DISTINCT_ROWS, tags=("filter",))
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — duplicate elimination.

    Scale: one hash-shuffle on the distinct key; partial
    deduplication happens map-side first (HashAggregate partial →
    final), so shuffle volume is #distinct, not #rows.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag",
        "l_linestatus",
        F.year("l_shipdate").cast("int").alias("ship_year"),
    ).distinct()


_UNPIVOT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")

_ORACLE_UNPIVOT_LONG = "\nUNION ALL\n".join(
    f"""SELECT l_orderkey, l_linenumber,
       '{m}' AS measure, {m} AS value
FROM lineitem
WHERE l_returnflag = 'R' AND COALESCE(l_orderkey % 7, 0) = 0"""
    for m in _UNPIVOT_MEASURES
)


@register("unpivot_long", _ORACLE_UNPIVOT_LONG, tags=("reshape",))
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt — wide measure columns to long (key, measure,
    value) rows: the inverse of ``agg_pivot``, completing the reshape
    pair. Variable values are the source column names verbatim.

    Scale: a narrow map — each input row emits its measure rows in
    place, no shuffle, no UDF; the returnflag filter pushes to the
    parquet scan, and only the 6 referenced columns are read. (The
    ANSI twin is the 4-arm UNION ALL, which an engine without UNPIVOT
    would rescan 4x; Spark's Expand emits all arms in ONE scan.)
    The orderkey-shard predicate only bounds the CATALOG key's output
    volume (melt fans out 4x by construction and the gate collects
    the result); the operator itself is whole-corpus.

    Hash parity: values pass through unrounded — both engines read
    the identical parquet doubles and no arithmetic touches them;
    NULL orderkeys fall into the kept shard on both engines
    (COALESCE pinned — a bare modulo would drop them as NULL on
    both, but the intent should not rest on that accident).
    """
    return (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_returnflag") == "R")
            & (F.coalesce(F.col("l_orderkey") % 7, F.lit(0)) == 0)
        )
        .select("l_orderkey", "l_linenumber", *_UNPIVOT_MEASURES)
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=list(_UNPIVOT_MEASURES),
            variableColumnName="measure",
            valueColumnName="value",
        )
    )
