"""Streaming JSONL ingestion — the production shape of
``sources/jsonl.py``.

A 100 TB landing zone is not a static file: uploads arrive
continuously, and the corrupt-record quarantine contract has to hold
on the STREAM — a malformed line must land in ``_corrupt_record``
(never kill the query, never vanish), and the quarantine census
becomes a live monitoring aggregate instead of a batch report.

The reader mirrors the batch one field-for-field (same
``schema_with_corrupt``, same PERMISSIVE + corrupt-column options —
shared helpers, or the two modes drift on the contract), and the
census is literally the batch builder's aggregation
(``quarantine_census``): Spark maintains the same ≤ 2 × #langs
groups incrementally, so state is O(langs) regardless of how many
lines ever streamed. Tested in ``tests/test_streaming.py`` by
replaying the engine-written JSONL fixture through a file-source
stream (``Trigger.AvailableNow``) and comparing against the batch
catalog key on the same file.

A production deployment swaps the file source for Kafka and parses
the message value with ``from_json`` under the same contract schema;
``from_json`` has no corrupt-record column, so the quarantine
predicate there is ``parsed IS NULL AND raw IS NOT NULL`` — the
census algebra downstream is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..sources.jsonl import CORRUPT_COL, quarantine_census, schema_with_corrupt

__all__ = ["read_jsonl_stream", "quarantine_census", "CORRUPT_COL"]


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a JSONL landing directory under the
    explicit contract schema; malformed lines land in
    ``_corrupt_record`` exactly as in the batch reader.

    ``maxFilesPerTrigger`` simulates arrival in micro-batches (the
    replay test uses it to prove batch-boundary independence); the
    production source would be Kafka with the same downstream
    algebra (see module docstring).
    """
    reader = (
        spark.readStream.schema(schema_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)
