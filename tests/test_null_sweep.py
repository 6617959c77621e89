"""Adversarial NULL/degenerate-input sweep: every documents-only
operator runs on a corpus containing NULL text, empty text, NULL
lang/source, and a 1-word doc, and must agree with its DuckDB oracle
— crash-for-crash is NOT acceptable, silent divergence even less so.

This is the test form of the sweep that found two real bugs the
fixtures could never catch (they contain no NULLs):

- ``dedup_prefix``: Spark ``concat_ws`` maps a NULL token array to
  '' while DuckDB ``array_to_string`` yields NULL — a NULL-text doc
  silently joined the empty-text duplicate group on one engine only.
- ``fn_regex``: ANSI ``CAST('' AS INT)`` killed the job on both
  engines for any source not matching the capture pattern (fixture
  sources all happen to match; real logs won't).

The ``read_jsonl`` ingestion path makes every row shape here
reachable in production (a line omitting a field parses clean with
that column NULL).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from mapreducepy_spark.registry import load_catalog

from .parity_util import canon_frame

CATALOG = load_catalog()

_OTHER_TABLES = (
    "lineitem", "orders", "customer", "supplier", "nation",
    "region", "part", "events", "embeddings",
)

DOCS_ONLY = [
    name
    for name, q in CATALOG.items()
    if q.oracle is not None
    and "documents" in q.oracle
    and not any(t in q.oracle for t in _OTHER_TABLES)
]


@pytest.fixture(scope="module")
def adversarial_docs(tmp_path_factory):
    d = tmp_path_factory.mktemp("nullsweep")
    rows = [
        (0, "", "en", "web", 0),                          # empty text
        (1, None, "en", "web", 0),                        # NULL text
        (2, "hello world foo bar baz", None, "web", 23),  # NULL lang
        (3, "hello world foo bar baz", "en", None, 23),   # NULL source
        (4, "x", "zh", "books", 1),                       # 1-word doc
        (5, "hello world foo bar baz", "en", "web", 23),  # exact dup of 2
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(d / "documents.parquet", index=False)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet')"
    )
    return str(d), con


@pytest.mark.parametrize("name", DOCS_ONLY)
def test_docs_operator_survives_adversarial_rows(
    spark, adversarial_docs, name
):
    sf_dir, con = adversarial_docs
    spd = CATALOG[name].builder(spark, sf_dir).toPandas()
    dpd = con.execute(CATALOG[name].oracle).fetchdf()
    assert canon_frame(spd) == canon_frame(dpd), name
