"""The MR compatibility layer reproduces DataFrame results: ported
mapper/reducer jobs compute the same answers the engine's declarative
operators do."""

from __future__ import annotations

from mapreducepy_spark import mr
from mapreducepy_spark.io import load


def test_wordcount_job_matches_dataframe_wordcount(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")

    def mapper(_, row):
        for tok in row.text.split(" "):
            if tok:
                yield (tok, 1)

    def reducer(word, counts):
        yield (word, sum(counts))

    got = dict(mr.run_job(spark, docs, mapper, reducer).collect())

    from mapreducepy_spark.llm.text import text_stats

    want = {
        r["word"]: r["n_occurrences"] for r in text_stats(spark, sf_dir).collect()
    }
    assert got == want


def test_combiner_reduces_shuffle_but_not_results(spark):
    records = [(None, (k, v)) for k in "ab" for v in range(100)]

    def mapper(_, kv):
        yield kv

    seen_group_sizes = []

    def combiner(k, values):
        vs = list(values)
        seen_group_sizes.append(len(vs))
        yield (k, sum(vs))

    def reducer(k, values):
        yield (k, sum(values))

    got = dict(
        mr.run_job(
            spark, records, mapper, reducer, combiner=combiner, num_partitions=4
        ).collect()
    )
    assert got == {"a": sum(range(100)), "b": sum(range(100))}


def test_associative_reduce_fast_path(spark):
    records = [(None, i) for i in range(1000)]

    def mapper(_, v):
        yield (v % 7, v)

    got = dict(
        mr.run_job(spark, records, mapper, None, associative_reduce=lambda a, b: a + b)
        .collect()
    )
    want = {}
    for i in range(1000):
        want[i % 7] = want.get(i % 7, 0) + i
    assert got == want


def test_mrjob_pipeline_chains(spark, sf_dir):
    """Two chained jobs: wordcount, then count-of-counts (the classic
    MR chaining example)."""
    docs = load(spark, sf_dir, "documents")

    class WordCount(mr.MRJob):
        def mapper(self, _, row):
            for tok in row.text.split(" "):
                if tok:
                    yield (tok, 1)

        def reducer(self, word, counts):
            yield (word, sum(counts))

    class CountOfCounts(mr.MRJob):
        def mapper(self, word, count):
            yield (count, 1)

        def reducer(self, count, ones):
            yield (count, sum(ones))

    first = mr.run_mrjob(spark, WordCount(), docs)
    out = dict(mr.run_mrjob(spark, CountOfCounts(), first).collect())

    from mapreducepy_spark.llm.text import text_stats

    wc = [r["n_occurrences"] for r in text_stats(spark, sf_dir).collect()]
    want = {}
    for c in wc:
        want[c] = want.get(c, 0) + 1
    assert out == want
