"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``mapreducepy_spark.registry`` — every operator
from SURVEY.md §2 registers a (builder, oracle SQL) pair there; this
module just re-exposes the catalog in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreducepy_spark.registry import load_catalog

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary, SURVEY §2.4
    A1) on sf0.001; driver checks rows > 0."""
    return load_catalog()["agg_group"].builder(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.builder for name, q in load_catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; keys absent here (approx
    ops) get the driver's weaker rows-only check."""
    return {
        name: q.oracle for name, q in load_catalog().items() if q.oracle is not None
    }
