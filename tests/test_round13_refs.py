"""Third-implementation references for the PREDICTED round-11 driver
window (the 11 remaining r6-evidence keys + the round-10 growth —
the r13-session precedent of ref'ing the next window ahead of its
rotation): the 5 keys of that cohort that had no dedicated ref —
text_contamination_ngram, text_oov_rate, text_keywords,
text_perplexity_proxy, events_user_lifecycle. Plain python
recomputation from the raw parquet, independent of both engines.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd

from mapreducepy_spark.registry import load_catalog

CATALOG = load_catalog()


def _pq(sf_dir: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def _r(x: float, d: int) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


def _words(text: str) -> list[str]:
    return [w for w in str(text).split(" ") if w != ""]


def _shingles3(text: str) -> list[str]:
    """3-word shingles, the llm/__init__ SPARK/DUCK_SHINGLES rule:
    one shingle per window position 1..len-2 (all words kept,
    including empties, exactly like string_split does)."""
    ws = str(text).split(" ")
    return [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]


def test_text_contamination_ngram_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    is_eval = {
        int(r.doc_id): hashlib.md5(str(r.doc_id).encode()).hexdigest()[:2]
        < "0d"
        for r in docs.itertuples()
    }
    eval_sh = set()
    for r in docs.itertuples():
        if is_eval[int(r.doc_id)]:
            eval_sh.update(_shingles3(r.text))
    got = (
        CATALOG["text_contamination_ngram"].builder(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    n_train = 0
    for r in docs.itertuples():
        if is_eval[int(r.doc_id)]:
            continue
        sh = set(_shingles3(r.text))
        if not sh:
            continue
        n_train += 1
        row = got.loc[int(r.doc_id)]
        n_cont = len(sh & eval_sh)
        assert int(row.n_shingles) == len(sh), r.doc_id
        assert int(row.n_contaminated) == n_cont, r.doc_id
        assert abs(row.contamination_rate - _r(n_cont / len(sh), 6)) < 2e-6
    assert len(got) == n_train
    # non-degeneracy: contamination actually occurs on this corpus
    assert (got.n_contaminated > 0).any()


def test_text_oov_rate_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    corpus = Counter()
    for r in docs.itertuples():
        corpus.update(_words(r.text))
    vocab = {
        w for w, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    }
    got = (
        CATALOG["text_oov_rate"].builder(spark, sf_dir).toPandas()
        .set_index("doc_id")
    )
    n_docs = 0
    for r in docs.itertuples():
        ws = _words(r.text)
        if not ws:
            continue
        n_docs += 1
        oov = sum(1 for w in ws if w not in vocab)
        row = got.loc[int(r.doc_id)]
        assert int(row.n_tokens) == len(ws)
        assert int(row.n_oov) == oov
        assert abs(row.oov_rate - _r(oov / len(ws), 6)) < 2e-6
    assert len(got) == n_docs
    assert (got.n_oov > 0).any()  # the top-10 vocab is a real cut


def test_text_keywords_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    n_docs = float(len(docs))
    tf: dict[tuple[int, str], int] = Counter()
    for r in docs.itertuples():
        for w in _words(r.text):
            tf[(int(r.doc_id), w)] += 1
    df = Counter(w for (_, w) in tf)
    got = CATALOG["text_keywords"].builder(spark, sf_dir).toPandas()
    ref = {}
    by_doc: dict[int, list[tuple[float, str]]] = {}
    for (d, w), n in tf.items():
        # the builders order on the ROUNDED tfidf (near-ties become
        # exact ties broken by word ASC — the libm-drift pin)
        by_doc.setdefault(d, []).append(
            (_r(n * math.log(n_docs / df[w]), 6), w)
        )
    for d, lst in by_doc.items():
        top = sorted(lst, key=lambda t: (-t[0], t[1]))[:3]
        ref[d] = [(rank + 1, w, s) for rank, (s, w) in enumerate(top)]
    assert len(got) == sum(len(v) for v in ref.values())
    for r in got.itertuples():
        rank, word, score = ref[int(r.doc_id)][int(r.rank) - 1]
        assert (int(r.rank), r.word) == (rank, word), r.doc_id
        assert abs(r.tfidf - score) < 2e-6, (r.doc_id, r.word)


def test_text_perplexity_proxy_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    tw: dict[tuple[int, str], int] = Counter()
    for r in docs.itertuples():
        for w in _words(r.text):
            tw[(int(r.doc_id), w)] += 1
    wc = Counter()
    for (_, w), n in tw.items():
        wc[w] += n
    total = float(sum(wc.values()))
    got = (
        CATALOG["text_perplexity_proxy"].builder(spark, sf_dir).toPandas()
        .set_index("doc_id")
    )
    per_doc: dict[int, tuple[int, float]] = {}
    for (d, w), n in tw.items():
        tok, ce = per_doc.get(d, (0, 0.0))
        per_doc[d] = (tok + n, ce - n * math.log(wc[w] / total))
    assert len(got) == len(per_doc)
    for d, (tok, ce) in per_doc.items():
        row = got.loc[d]
        assert int(row.n_tokens) == tok
        assert abs(row.cross_entropy - _r(ce / tok, 6)) < 2e-6, d
    # the proxy must actually separate documents (non-constant)
    assert got.cross_entropy.nunique() > 1


def test_events_user_lifecycle_matches_pandas(spark, sf_dir):
    e = _pq(sf_dir, "events")
    d = e.ts.dt.normalize()
    pu = (
        e.assign(d=d)
        .groupby("user_id")
        .agg(
            first_seen=("d", "min"),
            last_seen=("d", "max"),
            n_events=("d", "size"),
            n_active_days=("d", "nunique"),
        )
    )
    gmax = pu.last_seen.max()
    got = (
        CATALOG["events_user_lifecycle"].builder(spark, sf_dir).toPandas()
        .set_index("user_id")
    )
    assert len(got) == len(pu)
    for uid, r in pu.iterrows():
        row = got.loc[int(uid)]
        assert row.first_seen == str(r.first_seen.date())
        assert row.last_seen == str(r.last_seen.date())
        assert int(row.n_events) == int(r.n_events)
        assert int(row.n_active_days) == int(r.n_active_days)
        days = (gmax - r.last_seen).days
        assert int(row.days_inactive) == days
        assert int(row.is_dormant) == int(days >= 1)
