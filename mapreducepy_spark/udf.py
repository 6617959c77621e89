"""Python UDF surface demonstrations (SURVEY.md §2.11).

The reference's whole programming model is "arbitrary Python per
record/group"; on Spark that maps to four Arrow-batched primitives,
each demonstrated here with a real operator and unit-tested against
its pure-expression equivalent (``tests/test_udf.py``):

| reference concept        | Spark primitive            | demo |
| ------------------------ | -------------------------- | ---- |
| scalar mapper (1→1)      | ``@pandas_udf`` scalar     | ``quality_score_udf`` |
| mapper with fan-out (1→N)| ``mapInPandas``            | ``explode_tokens`` |
| reducer(k, values)       | ``applyInPandas``          | ``zscore_per_group`` |
| UDAF                     | ``pandas_udf`` GROUPED_AGG | ``geometric_mean`` |
| table function (SQL-side)| ``@udtf`` (Spark 4)        | ``NGramsUDTF`` |

These are the SLOW PATH by design (SURVEY.md §4: ~10-100× slower
than codegen'd expressions even with Arrow) — nothing in
``queries()`` uses them; they exist so ported jobs have an idiomatic
landing place, and each demo's docstring names the expression-based
alternative.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf
# infers its eval type from REAL (non-string) type hints.
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType


@F.pandas_udf(DoubleType())
def quality_score_udf(text: pd.Series) -> pd.Series:
    """Scalar Arrow-batched UDF: crude doc quality in [0, 1]
    (token-length sweet spot). Expression alternative: the
    ``text_quality`` query computes richer signals JVM-side."""
    n_tokens = text.str.split(" ").str.len().astype("float64")
    return (1.0 - (n_tokens - 20.0).abs() / 100.0).clip(0.0, 1.0)


@F.pandas_udf(DoubleType())
def geometric_mean(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF (a UDAF): exp(mean(ln x)).
    Expression alternative: ``exp(avg(ln(x)))`` — pure Catalyst."""
    import numpy as np

    return float(np.exp(np.log(v[v > 0]).mean()))


TOKEN_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("token", StringType(), False),
        StructField("pos", LongType(), False),
    ]
)


def explode_tokens(docs: DataFrame) -> DataFrame:
    """mapInPandas 1→N mapper: docs → (doc_id, token, position).
    Expression alternative: ``posexplode(split(text, ' '))``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for pos, tok in enumerate(text.split(" ")):
                    if tok:
                        out.append((doc_id, tok, pos))
            yield pd.DataFrame(out, columns=["doc_id", "token", "pos"])

    return docs.select("doc_id", "text").mapInPandas(run, TOKEN_SCHEMA)


ZSCORE_SCHEMA = StructType(
    [
        StructField("l_returnflag", StringType(), True),
        StructField("l_orderkey", LongType(), True),
        StructField("l_linenumber", LongType(), True),
        StructField("price_z", DoubleType(), True),
    ]
)


def zscore_per_group(lineitem: DataFrame) -> DataFrame:
    """applyInPandas grouped-map reducer: z-score of extendedprice
    within each returnflag group. Expression alternative: avg/stddev
    window functions (``win_*`` family) — prefer those; this shape is
    for logic that genuinely needs the whole group in memory (model
    scoring, per-group fits)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["l_extendedprice"].mean()
        sd = pdf["l_extendedprice"].std(ddof=1)
        # std(ddof=1) is NaN for single-row groups and NaN is truthy,
        # so `or 1.0` would NOT apply — check explicitly to keep
        # price_z finite (0.0) there.
        if pd.isna(sd) or sd == 0:
            sd = 1.0
        return pdf.assign(price_z=(pdf["l_extendedprice"] - mu) / sd)[
            ["l_returnflag", "l_orderkey", "l_linenumber", "price_z"]
        ]

    return (
        lineitem.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInPandas(run, ZSCORE_SCHEMA)
    )


try:  # Spark 4 Python UDTF (arrow-optimized when available)
    from pyspark.sql.functions import udtf

    @udtf(returnType="ngram: string, pos: int")
    class NGramsUDTF:
        """Table-valued function (1 row → N rows with schema): word
        n-grams + positions from a text column — the reference's
        'mapper that emits many records' as a FIRST-CLASS relation
        usable in SQL ``LATERAL`` joins. Expression alternative for
        this particular job: ``posexplode(transform(...))`` — the
        UDTF form is for emit-logic too dynamic for expressions."""

        def eval(self, text: str, n: int):
            toks = [t for t in (text or "").split(" ") if t]
            for i in range(len(toks) - n + 1):
                yield (" ".join(toks[i : i + n]), i)

except ImportError:  # pragma: no cover - pre-4.0 Spark
    NGramsUDTF = None
