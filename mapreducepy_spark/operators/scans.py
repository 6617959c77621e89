"""Scans / sources (SURVEY.md §2.1).

MapReduce origin: the input reader / record iterator — here a
DataSource-V2 parquet scan. The interesting property at 100 TB is
that projection and predicates REACH the scan: ``.select`` becomes
``ReadSchema`` (column pruning) and ``.filter`` becomes
``PushedFilters`` (row-group skipping via parquet min/max stats), so
a 2-column projection reads 2 columns, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_ORACLE_SCAN_PROJECT = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderstatus = 'F'
"""


@register("scan_project", _ORACLE_SCAN_PROJECT, tags=("scan",))
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 — projection + pushed filter.

    Scale: filter on ``o_orderstatus`` and the 3-column projection
    both push into the parquet scan; no shuffle at all.
    """
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_ORACLE_SCAN_COUNT = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
"""


@register("scan_count", _ORACLE_SCAN_COUNT, tags=("scan",))
def scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 — full-scan count.

    Scale: parquet row-group metadata answers this without reading
    data pages; the aggregation is a partial count per partition +
    a single final combine (the MapReduce combiner, built in).
    """
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


_ORACLE_JSON_EXTRACT = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
"""


@register("json_extract", _ORACLE_JSON_EXTRACT, tags=("scan", "json"))
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 — parse a JSON-string column (``events.props``).

    Uses ``get_json_object`` (codegen'd JsonPath, JVM-side — no
    Python). For a fixed schema at scale, ``from_json`` with an
    explicit ``StructType`` is the bulk path; this op keeps the
    dynamic-path form the fixtures exercise.
    """
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return (
        ev.select(
            "event_id",
            k.alias("k_str"),
            k.cast("bigint").alias("k_int"),
        )
        .filter(F.col("k_str").isNotNull())
    )
