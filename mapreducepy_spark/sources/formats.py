"""Format round-trips: the output-writer / input-reader surface of a
MapReduce framework (SURVEY.md §2.1 S3), Spark-native.

Scale notes baked into the API:

- ``write_table`` defaults to parquet (columnar, predicate-pushdown
  capable) and supports ``partition_by`` — hive-style directory
  partitioning is what makes 100 TB datasets prunable: a filter on a
  partition column never touches excluded directories.
- CSV/JSON writers exist for interchange, not analytics — both are
  row-oriented, schema-light and unsplittable-when-compressed; the
  readers take explicit schemas to avoid a full inference pass over
  huge inputs.
- ``repartition_for_output`` sizes output files: the classic small-
  files problem (one file per task) is fixed by repartitioning to
  ceil(bytes / target) before the write, not by post-hoc compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
) -> DataFrame:
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def repartition_for_output(
    df: DataFrame, target_file_bytes: int = 128 * 1024 * 1024, est_row_bytes: int = 100
) -> DataFrame:
    """Coalesce/repartition so output files land near the target size.

    Uses a cheap row-count estimate; on a cluster you would use the
    plan statistics (``df._jdf.queryExecution().optimizedPlan()
    .stats().sizeInBytes()``) instead of counting.
    """
    n_rows = df.count()
    n_files = max(1, (n_rows * est_row_bytes) // target_file_bytes)
    return df.repartition(int(n_files))
