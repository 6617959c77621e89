"""Table loading over the driver's parquet fixtures (TESTDATA.md).

One parquet file per table at ``{sf_dir}/{name}.parquet``. Loading is
a plain ``spark.read.parquet`` so the DataSource V2 parquet scan gets
predicate pushdown + column pruning for free — every query builder
should ``select``/``filter`` early so ``PushedFilters``/``ReadSchema``
show up in the physical plan (SURVEY.md §4.2).

At 100 TB each "table" would be a partitioned parquet/iceberg dataset;
nothing in this module assumes a single file — ``spark.read.parquet``
accepts directories and globs unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS): Spark reads it as long
    # (spark.sql.legacy.parquet.nanosAsLong) — rebuild the µs-precision
    # timestamp with integer division (fixture values are µs-aligned,
    # so this is lossless; `div` avoids double-precision loss on int64).
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table, guaranteeing at least one partition per core.

    CPU-heavy operators (shingling, hashing, explode) must never run
    single-task just because the input arrived as one small file /
    one parquet row-group. If the scan already splits wide — the
    normal case at scale, where `maxPartitionBytes` gives thousands
    of splits — this is a no-op; the round-robin repartition only
    fires for narrow scans, where its shuffle is trivially cheap.
    """
    df = load(spark, sf_dir, name)
    n_cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n_cores:
        df = df.repartition(n_cores)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table (used by ``bench.py`` warm-up)."""
    return {name: load(spark, sf_dir, name) for name in TABLES}
