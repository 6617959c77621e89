"""CSV corpus ingestion under the quarantine contract (SURVEY.md
§2.1 S-family, completing the source set: parquet, JSONL file,
Kafka-shape JSON values, CSV).

CSV's PERMISSIVE failure semantics differ from JSON's in a way a
pipeline must know about: a malformed JSON line NULLs every data
column, but the CSV parser keeps PARTIAL RESULTS — a type-mismatched
cell NULLs only that cell, and an extra/missing column still yields
the parseable prefix — while the raw line lands in
``_corrupt_record`` either way (verified empirically on this Spark
build; the census below certifies it against an independent oracle).
Partial results matter operationally: the quarantine report can say
WHICH producer (source column survives) ships the bad rows, which
the all-NULL JSON contract cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..registry import register
from .jsonl import (
    CORRUPT_COL,
    _CORRUPT_EVERY,
    _JSONL_DOC_SCHEMA,
    _write_fixture,
    schema_with_corrupt,
)

# corruption classes within the doc_id % _CORRUPT_EVERY cycle:
#   == 0  → n_chars cell type-mismatched ("x<n>" in a LONG column)
#   == 10 → one trailing extra column (producer schema drift)
_CSV_BADTYPE_AT = 0
_CSV_EXTRACOL_AT = 10


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Read a CSV corpus under an explicit contract schema with the
    same PERMISSIVE + corrupt-record contract as ``read_jsonl`` —
    one shared quarantine column name across every ingestion mode."""
    return (
        spark.read.schema(schema_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def ensure_csv_fixture(sf_dir: str) -> str:
    """Write the deterministic CSV twin of ``{sf_dir}/documents
    .parquet`` (same atomic-write plumbing as the JSONL fixtures).
    The documents table's strings are plain tokens (no commas,
    quotes, or newlines — asserted where rendered), so cells need no
    quoting; NULL renders as the empty cell, which the reader maps
    back to NULL."""

    def cell(v) -> str:
        s = "" if v is None else str(v)
        if any(c in s for c in ',"\n\r'):
            raise ValueError(f"cell needs CSV quoting: {s!r}")
        return s

    def render(d, la, so, n) -> str:
        base = f"{cell(d)},{cell(la)},{cell(so)}"
        # abs() before %: sign-stable vs the oracle's SQL modulo
        # (ADVICE r8 class; the ==0 badtype arm was already safe,
        # every nonzero arm desyncs on negative ids)
        u = None if d is None else abs(d)
        if u is not None and u % _CORRUPT_EVERY == _CSV_BADTYPE_AT:
            return f"{base},x{cell(n)}"  # type mismatch in LONG column
        if u is not None and u % _CORRUPT_EVERY == _CSV_EXTRACOL_AT:
            return f"{base},{cell(n)},EXTRA"  # schema drift: extra col
        return f"{base},{cell(n)}"

    return _write_fixture(sf_dir, "documents.csv", render)


# The oracle predicts the census INCLUDING the partial-parse
# contract: corrupt rows still carry doc_id and lang (so the id
# range and distinct-lang count are real values, not NULLs — the
# opposite of the JSONL census), and only the type-mismatched class
# loses n_chars. doc_id 0 falls in the badtype class (0 % n = 0);
# a source-NULL doc_id renders as an empty cell, parses NULL, clean.
_ORACLE_CSV_QUARANTINE = f"""
WITH rows AS (
    SELECT doc_id, lang, source, n_chars,
           CASE
               WHEN doc_id IS NULL THEN 'clean'
               WHEN abs(doc_id) % {_CORRUPT_EVERY} = {_CSV_BADTYPE_AT}
                   THEN 'corrupt_badtype'
               WHEN abs(doc_id) % {_CORRUPT_EVERY} = {_CSV_EXTRACOL_AT}
                   THEN 'corrupt_extracol'
               ELSE 'clean'
           END AS status
    FROM documents
)
SELECT status,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id,
       CASE WHEN status = 'corrupt_badtype' THEN CAST(NULL AS BIGINT)
            ELSE CAST(SUM(n_chars) AS BIGINT) END AS sum_chars
FROM rows
GROUP BY status
"""


def csv_census(parsed: DataFrame) -> DataFrame:
    """Quarantine census certifying CSV's partial-parse semantics:
    classify each row from parser output alone (corrupt + NULL
    n_chars ⇒ the type-mismatch class, since the extra-column class
    keeps every schema field), then aggregate per class — id range
    and distinct lang/source counts over values that SURVIVED the
    corrupt parse. One map-side-combined aggregation, ≤ 3 groups,
    constant shuffle at any scale; the algebra is mode-agnostic like
    the JSONL censuses.

    The census deliberately references EVERY contract column
    (``n_sources`` reads the otherwise-unused ``source``): under
    Spark's CSV column pruning (``spark.sql.csv.parser
    .columnPruning.enabled``, default on) the parser only tokenizes
    the columns a plan needs, and a pruned parse CANNOT detect the
    extra-column malformation — the row would silently count as
    clean (observed on this build: a doc_id-lang-n_chars-only census
    reported 0 extracol rows). A quarantine monitor must parse the
    full contract width; this is that rule, encoded in the plan.
    """
    status = (
        F.when(F.col(CORRUPT_COL).isNull(), F.lit("clean"))
        .when(F.col("n_chars").isNull(), F.lit("corrupt_badtype"))
        .otherwise(F.lit("corrupt_extracol"))
        .alias("status")
    )
    return parsed.groupBy(status).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_distinct(F.col("lang")).cast("bigint").alias("n_langs"),
        F.count_distinct(F.col("source")).cast("bigint").alias("n_sources"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


@register("csv_quarantine", _ORACLE_CSV_QUARANTINE, tags=("source", "csv"))
def csv_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family, CSV leg — quarantine census over PERMISSIVE CSV
    ingestion, certifying the PARTIAL-PARSE contract: type-mismatch
    rows lose only the bad cell (their doc_id range and lang
    diversity still report), extra-column rows lose nothing, and
    both classes keep their raw line in ``_corrupt_record``. The
    oracle predicts every value from the parquet source and the
    fixture's literal corruption rule, so a hash-green row proves
    the parser lands each cell exactly where the contract says.

    Scale: line-splittable scan, single parse feeding one ≤ 3-group
    aggregation (no SPARK-26243 double parse); the shuffle is a few
    rows per task regardless of corpus size.
    """
    path = ensure_csv_fixture(sf_dir)
    return csv_census(read_csv(spark, path, _JSONL_DOC_SCHEMA))
