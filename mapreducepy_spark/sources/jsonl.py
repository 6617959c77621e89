"""JSONL corpus ingestion (SURVEY.md §2.1 S4 at pipeline scale).

Web-scale text corpora ship as JSON-lines (one document object per
line, gzip-splittable when chunked) and ALWAYS contain malformed
lines — truncated uploads, encoding garbage, schema drift. A 100 TB
ingestion job must quarantine those rows, not die on line
3,141,592,653. This module is the deliberate recipe:

- **Explicit schema, never inference.** Schema inference is a full
  extra pass over the input (and on drifting data it infers the
  union of the drift); the reader here requires the contract schema
  up front, so the scan is single-pass and the contract is enforced
  rather than discovered.
- **PERMISSIVE + corrupt-record column.** Malformed lines land in
  ``_corrupt_record`` with every data column NULL instead of killing
  the job (``FAILFAST``) or silently vanishing (``DROPMALFORMED`` —
  which loses the evidence you need to fix the producer).
- **One materialization, two outputs.** Spark refuses a filter that
  references ONLY the internal corrupt-record column on the lazy
  plan (the parser would have to re-run per consumer with different
  pruning — SPARK-26243); ``split_corrupt`` therefore persists the
  parsed frame once and derives the clean/quarantine splits from
  that single parse, which is also the right I/O shape: one scan of
  the raw text feeds both sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Read a JSONL corpus under an explicit contract schema, keeping
    malformed lines in ``_corrupt_record`` (PERMISSIVE mode)."""
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(
            f"schema must not already contain {CORRUPT_COL!r}"
        )
    # fresh StructType: StructType.add mutates the caller's schema
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a ``read_jsonl`` frame into (clean, quarantine).

    ``clean`` drops the corrupt column; ``quarantine`` carries the
    raw offending line for producer-side debugging. The INPUT frame
    is persisted in place — both splits derive from ONE parse of the
    raw text (and Spark would otherwise reject the corrupt-only
    filter outright, see module docstring). Cache ownership stays
    with the caller: after materializing both outputs, release it
    with ``parsed.unpersist()`` on the frame you passed in (the
    cache is keyed by the plan, so the caller's handle releases it)
    — an ingestion loop that never unpersists accumulates a pinned
    copy of every corpus it has parsed.
    """
    parsed = parsed.persist()
    clean = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine
