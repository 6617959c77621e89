"""Degenerate-input guards the synthetic fixtures never exercise
(continuous-random values, always-active users) but real data will."""

from __future__ import annotations

import pandas as pd

from mapreducepy_spark.registry import load_catalog

CATALOG = load_catalog()


def _write_events(tmp_path, rows):
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_events_anomaly_survives_zero_stddev_type(spark, tmp_path):
    """A constant-valued event type has stddev 0; under ANSI mode an
    unguarded (value-mu)/sd would throw DIVIDE_BY_ZERO and kill the
    job. The guard must instead drop the group's rows — matching
    DuckDB, where 0/0 is NULL and fails the |z|>2 filter."""
    sf = _write_events(
        tmp_path,
        [
            # constant group: sd = 0, must not crash, must emit no rows
            (1, "2024-01-01 00:00:00", 1, "const", 5.0, "{}"),
            (2, "2024-01-01 00:01:00", 1, "const", 5.0, "{}"),
            (3, "2024-01-01 00:02:00", 2, "const", 5.0, "{}"),
            # varied group with one extreme outlier (z far beyond 2)
            (4, "2024-01-01 00:00:00", 3, "varied", 1.0, "{}"),
            (5, "2024-01-01 00:01:00", 3, "varied", 1.1, "{}"),
            (6, "2024-01-01 00:02:00", 3, "varied", 0.9, "{}"),
            (7, "2024-01-01 00:03:00", 3, "varied", 1.0, "{}"),
            (8, "2024-01-01 00:04:00", 3, "varied", 1.05, "{}"),
            (9, "2024-01-01 00:05:00", 4, "varied", 100.0, "{}"),
        ],
    )
    out = CATALOG["events_anomaly"].builder(spark, sf).toPandas()
    assert set(out.event_type) == {"varied"}
    assert set(out.event_id) == {9}


def test_text_repetition_matches_python_reference(spark, tmp_path):
    """The nested higher-order-function expressions (struct-array
    bigram counts, max + lexicographic-min argmax) are the trickiest
    pure-expression code in the catalog — cross-check them against a
    plain-Python reference on seeded random docs plus adversarial
    shapes (all-same tokens, all-distinct, bigram-count ties)."""
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "c", "dd", "ee"]
    texts = [
        "x x",                      # minimal: 2 tokens, 1 bigram
        "a a a a",                  # constant doc
        "a b c dd ee",              # all-distinct, all bigrams tied
        "b a b a b",                # alternating: 'a b' vs 'b a' tie shapes
    ] + [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 40)))
        for _ in range(40)
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "src0",
            "n_chars": [len(t) for t in texts],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)

    out = (
        CATALOG["text_repetition"]
        .builder(spark, str(tmp_path))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )

    def ref(text):
        t = [w for w in text.split(" ") if w]
        b = [f"{t[i]} {t[i+1]}" for i in range(len(t) - 1)]
        counts = {x: b.count(x) for x in b}
        top_n = max(counts.values())
        top_bigram = min(x for x, n in counts.items() if n == top_n)
        r6 = lambda v: __import__("math").floor(v * 1e6 + 0.5) / 1e6
        return (
            len(t),
            r6(1.0 - len(set(t)) / len(t)),
            top_bigram,
            r6(top_n / len(b)),
        )

    for doc_id, text in enumerate(texts):
        n_tokens, dup_ratio, top_bigram, top_frac = ref(text)
        row = out.loc[doc_id]
        assert row.n_tokens == n_tokens, (doc_id, text)
        assert row.dup_word_ratio == dup_ratio, (doc_id, text)
        assert row.top_bigram == top_bigram, (doc_id, text)
        assert row.top_bigram_frac == top_frac, (doc_id, text)
