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
the message value with ``parse_json_values`` below — ``from_json``
under the same corrupt-augmented schema, so malformed values land in
the same ``_corrupt_record`` column and the census algebra downstream
is byte-for-byte unchanged (proven by ``test_streaming``'s
kafka-shape test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..sources.jsonl import CORRUPT_COL, quarantine_census, schema_with_corrupt

__all__ = [
    "read_jsonl_stream",
    "parse_json_values",
    "quarantine_census",
    "CORRUPT_COL",
]


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


def parse_json_values(
    raw: DataFrame, schema: StructType, value_col: str = "value"
) -> DataFrame:
    """Kafka-shape ingestion: parse a string ``value_col`` under the
    contract schema with the SAME quarantine semantics as the file
    readers — ``from_json`` over the corrupt-augmented schema puts a
    malformed value into ``_corrupt_record`` (all data fields NULL),
    and the flattened output is drop-in compatible with
    ``quarantine_census``.

    Rows whose ``value_col`` is NULL carry no record at all (a Kafka
    tombstone, not a malformed document) and are dropped — a NULL
    can't be quarantined (there is no evidence line to keep) and
    counting it clean would corrupt the census.

    Works identically on batch and streaming frames (``from_json``
    is a plain expression; Spark plans the incremental census the
    same way).
    """
    full = schema_with_corrupt(schema)
    parsed = F.from_json(
        F.col(value_col),
        full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return (
        raw.filter(F.col(value_col).isNotNull())
        .select(parsed.alias("__rec"))
        .select("__rec.*")
    )
