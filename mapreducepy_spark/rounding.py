"""Deterministic cross-engine rounding (hash-parity critical).

Spark's ``round()`` rounds the SHORTEST DECIMAL REPR of a double
(``BigDecimal.valueOf`` semantics), DuckDB's rounds the binary value
— they disagree on ~0.2% of money-like values (e.g. the double
48319.604999999996, shortest repr "48319.605": Spark → 48319.60,
DuckDB → 48319.61). Measured in round-1 parity tests, not assumed.

Both engines DO agree bit-for-bit on IEEE-754 multiply/add/floor/
divide, so the engine rounds with::

    floor(x * 10^d + 0.5) / 10^d

on BOTH sides. All scaled intermediates here stay far below 2^53, so
every step is exact-deterministic. (Half-always-up at exact .5 — a
deliberate deviation from banker's rounding; determinism is the
requirement, not a rounding ideology.)

Known knife edge (property-tested in ``tests/test_rounding.py``):
when ``x·10^d + 0.5`` lands within ~1 ulp of an exact integer, the
floor is decided by the final rounding of the multiply-add, and an
engine that fuses it (FMA) can land one output-ulp away. The edge
has measure zero over the fixtures' value distribution; every
oracle-parity run (68 queries × 2 scale factors, each many times)
has passed, which bounds the practical risk at "not yet observed".
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column | str, d: int = 2) -> Column:
    """Spark side: deterministic round of ``col`` to ``d`` decimals."""
    if isinstance(col, str):
        col = F.col(col)
    s = float(10**d)
    return F.floor(col * F.lit(s) + F.lit(0.5)) / F.lit(s)


def dround_sql(expr: str, d: int = 2) -> str:
    """DuckDB side: the identical formulation as SQL text."""
    s = float(10**d)
    return f"(floor(({expr}) * {s} + 0.5) / {s})"
