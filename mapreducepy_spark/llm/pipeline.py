"""The composed training-corpus pipeline as ONE declarative query.

Every stage exists as a standalone catalog operator (quality gate,
decontamination, exact dedup, deterministic split); this module
chains them into the single DataFrame a production run would
materialize — and because each stage is pure Catalyst expressions,
the optimizer fuses the whole pipeline into one plan: the corpus is
scanned once, the quality explode+agg is the only corpus-sized
shuffle, and the decontamination blocklist broadcasts. Running the
stages as separate jobs would scan and shuffle the corpus once PER
STAGE — the fusion is the scale argument.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_spread
from ..operators.sampling import _SPLIT_TRAIN_CUT, _SPLIT_VAL_CUT
from ..registry import register
from .dedup import _EVAL_CUT
from .text import (
    _QF_MAX_AVG_LEN,
    _QF_MIN_TOKENS,
    _QF_MIN_TTR,
    quality_kept_docs,
)

_ORACLE_PIPELINE_CLEAN = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
),
per_doc AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT word) AS DOUBLE) / COUNT(*) AS ttr,
           AVG(CAST(length(word) AS DOUBLE)) AS avg_len
    FROM toks WHERE word <> ''
    GROUP BY doc_id
),
tagged AS (
    SELECT d.doc_id, d.lang, d.source, d.text, p.n_tokens,
           substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) AS h2,
           md5(d.text) AS text_hash
    FROM documents d
    JOIN per_doc p ON d.doc_id = p.doc_id
    WHERE p.n_tokens >= {_QF_MIN_TOKENS}
      AND p.ttr >= {_QF_MIN_TTR}
      AND p.avg_len <= {_QF_MAX_AVG_LEN}
),
block AS (
    SELECT DISTINCT md5(text) AS text_hash
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_EVAL_CUT}'
),
clean AS (
    SELECT t.*,
           ROW_NUMBER() OVER (
               PARTITION BY t.text_hash ORDER BY t.doc_id
           ) AS rn
    FROM tagged t
    WHERE t.h2 >= '{_EVAL_CUT}'
      AND NOT EXISTS (
          SELECT 1 FROM block b WHERE b.text_hash = t.text_hash
      )
)
SELECT doc_id, lang, source, n_tokens,
       CASE WHEN h2 < '{_SPLIT_TRAIN_CUT}' THEN 'train'
            WHEN h2 < '{_SPLIT_VAL_CUT}' THEN 'val'
            ELSE 'test' END AS split
FROM clean
WHERE rn = 1
"""


@register(
    "pipeline_clean_corpus", _ORACLE_PIPELINE_CLEAN,
    tags=("llm", "pipeline", "flagship"),
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning as one fused query: C4-style
    quality gate → eval-set exclusion + digest decontamination →
    exact dedup (keep lowest doc_id) → deterministic train/val/test
    assignment. Emits the final training manifest (doc_id, lang,
    source, n_tokens, split) a pipeline writes before tokenization.

    Stage semantics match the standalone operators
    (``text_quality_filter``, ``text_decontaminate``,
    ``dedup_keep_first``, ``sample_split``) with their exact
    thresholds — this key exists to prove composition: one plan with
    three column-pruned scans of the corpus (signal pass, corpus
    rejoin, blocklist build — each reading only its needed columns),
    one window shuffle on the 16-byte digest, one broadcast
    blocklist, and ZERO intermediate materializations. Four staged
    jobs would each pay a full scan + shuffle + write cycle.

    Scale: two corpus-sized shuffles, both keyed on doc_id — the
    quality explode+agg and the raw-docs side of its rejoin (the
    per_doc side arrives pre-partitioned from the aggregation; at
    fixture scale AQE broadcasts it instead, but that is a
    smallness accident, not the design). Decontamination is a
    broadcast anti-join (megabytes of eval digests vs 100 TB of
    corpus — the text_decontaminate argument); the dedup window
    shuffles survivors keyed by digest; the split label is a
    zero-shuffle narrow map.

    Broadcast-size assumption (inherited from text_decontaminate,
    deliberately NOT count-guarded): the blocklist is the held-out
    BENCHMARK digest set, which in production is fixed-size
    megabytes regardless of corpus size — the fixture's 5%-of-corpus
    eval split is a stand-in proportion, not the scale model. A
    count-based guard (the dedup_survivors_verified pattern) would
    cost an eager corpus-scan job at build time and break this key's
    zero-jobs-until-action fused-plan property. If a deployment's
    blocklist genuinely grows with the corpus, drop the hint and let
    AQE size the join against autoBroadcastJoinThreshold.

    Hash parity: every stage is exact (integer thresholds, md5
    digests, row_number on the unique doc_id) except the ttr/avg_len
    gate comparisons, which both engines evaluate on identically
    computed doubles (exact-int divisions — the
    text_quality_filter precedent).
    """
    from pyspark.sql.window import Window

    docs = load_spread(spark, sf_dir, "documents")
    quality = (
        docs.join(quality_kept_docs(docs), "doc_id")
        .withColumn(
            "h2", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
        )
        .withColumn("text_hash", F.md5("text"))
    )
    block = (
        docs.filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
            < _EVAL_CUT
        )
        .select(F.md5("text").alias("text_hash"))
        .distinct()
    )
    clean = (
        quality.filter(F.col("h2") >= _EVAL_CUT)
        .join(F.broadcast(block), "text_hash", "left_anti")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("text_hash").orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    split = (
        F.when(F.col("h2") < _SPLIT_TRAIN_CUT, "train")
        .when(F.col("h2") < _SPLIT_VAL_CUT, "val")
        .otherwise("test")
    )
    return clean.select(
        "doc_id", "lang", "source", "n_tokens", split.alias("split")
    )
