"""Query catalog: the single source of truth behind ``__spark_entry__.py``.

Every operator from SURVEY.md §2 registers itself here with

- a **builder** ``(spark, sf_dir) -> DataFrame`` (pure DataFrame API,
  aliased columns), and
- an **oracle**: the equivalent ANSI SQL DuckDB runs on the same
  parquet tables (``None`` for ops that are not SQL-expressible —
  the driver then records a weaker rows-only check).

The alias discipline (FIXTURES.md "hash-parity gotchas") is enforced
socially: builder and oracle are written together, column-for-column,
and ``tests/test_parity.py`` runs both sides on sf0.001 and compares
row-count + dtype-kind + canonicalized values — a local mirror of the
driver's order-insensitive value-hash gate.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}

# Modules whose import populates REGISTRY. Order mirrors SURVEY.md §7.
_MODULES = (
    "mapreducepy_spark.operators.scans",
    "mapreducepy_spark.operators.filters",
    "mapreducepy_spark.operators.joins",
    "mapreducepy_spark.operators.aggregates",
    "mapreducepy_spark.operators.windows",
    "mapreducepy_spark.operators.sorts",
    "mapreducepy_spark.operators.sets",
    "mapreducepy_spark.operators.temporal",
    "mapreducepy_spark.operators.sampling",
    "mapreducepy_spark.functions.scalar",
    "mapreducepy_spark.llm.dedup",
    "mapreducepy_spark.llm.similarity",
    "mapreducepy_spark.llm.text",
    "mapreducepy_spark.llm.multimodal",
)


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    """Decorator: add a query builder to the catalog."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, builder=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


def load_catalog() -> dict[str, Query]:
    """Import all operator modules (idempotent) and return the catalog."""
    for mod in _MODULES:
        importlib.import_module(mod)
    return REGISTRY
