"""Set operations (SURVEY.md §2.7).

MapReduce origin: union = concatenated inputs; intersect/except =
co-group on the whole row + membership test in the reducer. Spark
plans INTERSECT/EXCEPT as aggregate/anti-join under the hood.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_ORACLE_SET_UNION = """
SELECT c_custkey AS entity_id, 'customer' AS kind, c_acctbal AS acctbal
FROM customer
UNION ALL
SELECT s_suppkey AS entity_id, 'supplier' AS kind, s_acctbal AS acctbal
FROM supplier
"""


@register("set_union", _ORACLE_SET_UNION, tags=("set",))
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 — UNION ALL by name (customer ∪ supplier ledger).

    Scale: pure concatenation of scans — no shuffle. ``unionByName``
    guards against positional-column drift between branches.
    """
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.lit("customer").alias("kind"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionByName(s)


_ORACLE_SET_INTERSECT = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("set_intersect", _ORACLE_SET_INTERSECT, tags=("set",))
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — INTERSECT (distinct): nations having both customers and
    suppliers.

    Scale: both sides reduce to distinct keys map-side before the
    shuffle (planned as aggregate + semi join).
    """
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


_ORACLE_SET_EXCEPT = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("set_except", _ORACLE_SET_EXCEPT, tags=("set",))
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 — EXCEPT (distinct): nations with customers but no
    suppliers. Planned as distinct + left-anti join (``subtract`` is
    EXCEPT DISTINCT — ``exceptAll`` would be multiset difference)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)
