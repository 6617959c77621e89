"""Plan inspection as data (SURVEY.md §4.2's "free" optimizations,
made checkable).

The engine's scale claims — filters reach the parquet scan, scans
prune to the referenced columns, small dims broadcast, top-k never
globally sorts — are properties of the PHYSICAL plan, so they are
asserted from it (``tests/test_plans.py``), not taken on faith from
the DataFrame code. A refactor that silently degrades a plan fails
CI, which is the only reliable way plan quality survives many hands.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """`df.explain(mode)` output as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def executed_plan(df: DataFrame) -> str:
    """The FINAL physical plan after AQE re-optimization — only
    meaningful after an action has run on ``df`` (AQE finalizes plans
    at runtime; ``plan_text`` before execution shows the initial
    plan). WholeStageCodegen stages appear as ``*(n)`` markers here.
    """
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> str:
    """The ``PushedFilters: [...]`` line(s) of the formatted plan
    (empty string when nothing reached the scan)."""
    return "\n".join(
        line for line in plan_text(df).splitlines() if "PushedFilters" in line
    )


def read_schema_line(df: DataFrame) -> str:
    """The scan's ``ReadSchema`` line — what the parquet reader will
    actually materialize (column pruning made visible)."""
    lines = [line for line in plan_text(df).splitlines() if "ReadSchema" in line]
    return lines[0] if lines else ""
