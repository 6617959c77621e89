"""LLM-training-data pipeline operators (SURVEY.md §2.10).

Deduplication, similarity search, text analysis, and multimodal
column handling — the operators a 100 TB pre-training corpus pipeline
needs, each expression-based (no Python on the hot path) so they stay
oracle-checkable AND codegen-fast.

Cross-engine hash portability: MinHash/SimHash/fingerprints are built
on ``md5(...)`` hex strings — the one deterministic hash whose output
is identical in Spark and DuckDB (Spark ``xxhash64``/``hash`` and
DuckDB ``hash()`` use different algorithms, so they can never be
oracle-checked). At production scale swap md5 for ``xxhash64`` — the
algebra is unchanged.
"""

SHINGLE_K = 3  # words per shingle for MinHash / Jaccard

# Spark SQL fragment: word 3-gram shingles from `text`.
SPARK_SHINGLES = (
    "case when size(split(text, ' ')) >= 3 then "
    "transform(sequence(1, size(split(text, ' ')) - 2), "
    "i -> concat_ws(' ', slice(split(text, ' '), i, 3))) "
    "else array() end"
)

# DuckDB fragment with identical semantics (1-based inclusive slices).
DUCK_SHINGLES = (
    "list_transform(range(1, len(string_split(text, ' ')) - 1), "
    "i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))"
)

# Narrow (no-explode) whitespace token count of `text`, as the ONE
# pair of engine fragments shared by every operator that needs a
# per-doc token count without per-word aggregation
# (docs_source_profile, corpus_mixture_plan). A drifted copy —
# different separator, missing empty-token filter — would silently
# break both hash parity and the cross-operator token-mass agreement
# test, so the fragment lives here (the SPARK/DUCK_SHINGLES pattern).
SPARK_TOKEN_COUNT = "size(filter(split(text, ' '), x -> x != ''))"
DUCK_TOKEN_COUNT = (
    "length(list_filter(string_split(text, ' '), x -> x <> ''))"
)
