"""Third-implementation references for the r5-stale block of the
round-9 driver window (window positions 16-50).

The 15 window-HEAD keys (round-8 growth) got independent references
in ``test_round9_refs`` / ``test_round9b_refs``; this file covers the
kernel-heavy keys of the window's TAIL — the block whose driver
evidence is oldest (r5), so a hash mismatch there would otherwise be
the least diagnosable. Same discipline as the sibling files: every
kernel is recomputed in plain python/pandas from the raw parquet,
independent of BOTH engines (no Spark expressions, no DuckDB SQL).

The MinHash-LSH pipeline (shingle -> 8 rotated-md5 minhashes -> 4
band signatures -> bucket pairs) is rebuilt once in pure python and
feeds four tests (dedup_near / _minhash_est / _near_verified /
_clusters), so a failure localizes to the exact funnel stage that
drifted.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from mapreducepy_spark.registry import load_catalog

CATALOG = load_catalog()


def _pq(sf_dir: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _r6(x: float) -> float:
    """The repo's deterministic rounding (rounding.py) in plain math."""
    return math.floor(x * 1e6 + 0.5) / 1e6


def _shingles(text: str) -> list[str]:
    """Word 3-gram shingles, mirroring SPARK_SHINGLES/DUCK_SHINGLES:
    split on single space (empties KEPT inside shingles), [] under 3
    tokens."""
    toks = text.split(" ")
    if len(toks) < 3:
        return []
    return [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]


_N_HASHES = 8
_N_BANDS = 4


def _rot(h: str, i: int) -> str:
    s = 4 * i
    return h[s:] + h[:s]


@pytest.fixture(scope="module")
def lsh(sf_dir):
    """Pure-python MinHash-LSH pipeline over the raw parquet:
    (shingle sets, minhash signatures, candidate pairs)."""
    docs = _pq(sf_dir, "documents")
    shset: dict[int, set[str]] = {}
    mh: dict[int, list[str]] = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        sh = _shingles(text)
        if not sh:
            continue
        d = int(doc_id)
        shset[d] = set(sh)
        hs = [_md5(s) for s in shset[d]]
        mh[d] = [min(_rot(h, i) for h in hs) for i in range(_N_HASHES)]
    buckets: dict[tuple[int, str], list[int]] = defaultdict(list)
    for d, sig in mh.items():
        for b in range(_N_BANDS):
            buckets[(b, sig[2 * b] + sig[2 * b + 1])].append(d)
    pairs: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return shset, mh, pairs


# --- the near-dup funnel, stage by stage ----------------------------


def test_dedup_near_matches_python_lsh(spark, sf_dir, lsh):
    _, _, pairs = lsh
    got = CATALOG["dedup_near"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(pairs)
    assert set(zip(got.doc_a.astype(int), got.doc_b.astype(int))) == pairs


def test_dedup_minhash_est_matches_python(spark, sf_dir, lsh):
    _, mh, pairs = lsh
    got = CATALOG["dedup_minhash_est"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(pairs)
    for r in got.itertuples():
        exp = sum(
            mh[int(r.doc_a)][i] == mh[int(r.doc_b)][i]
            for i in range(_N_HASHES)
        )
        assert int(r.n_matching_hashes) == exp
        assert r.est_jaccard == pytest.approx(_r6(exp / _N_HASHES), abs=2e-6)


def test_dedup_near_verified_matches_python(spark, sf_dir, lsh):
    shset, _, pairs = lsh
    got = CATALOG["dedup_near_verified"].builder(spark, sf_dir).toPandas()
    assert set(zip(got.doc_a.astype(int), got.doc_b.astype(int))) == pairs
    for r in got.itertuples():
        a, b = shset[int(r.doc_a)], shset[int(r.doc_b)]
        inter = len(a & b)
        jac = inter / (len(a) + len(b) - inter)
        assert r.jaccard == pytest.approx(_r6(jac), abs=2e-6)
        # verdict runs on the UNROUNDED value (builder's jac_raw)
        assert bool(r.is_dup) == (jac >= 0.5)


def test_dedup_clusters_matches_python_bfs(spark, sf_dir, lsh):
    """Independent of the builder's union-find: plain BFS over the
    python-derived candidate edges, label = min member."""
    _, _, pairs = lsh
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    expected: dict[int, int] = {}
    for start in adj:
        if start in expected:
            continue
        comp, stack, seen = [], [start], {start}
        while stack:
            n = stack.pop()
            comp.append(n)
            for m in adj[n]:
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        label = min(comp)
        for n in comp:
            expected[n] = label
    got = CATALOG["dedup_clusters"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(expected)
    assert (
        dict(zip(got.doc_id.astype(int), got.cluster_id.astype(int)))
        == expected
    )


# --- signature/fingerprint kernels ----------------------------------


def test_dedup_exact_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    groups: dict[str, list[int]] = defaultdict(list)
    for doc_id, text in zip(docs.doc_id, docs.text):
        groups[_md5(text)].append(int(doc_id))
    got = CATALOG["dedup_exact"].builder(spark, sf_dir).toPandas()
    assert {
        r.text_hash: (int(r.keeper_doc_id), int(r.n_copies))
        for r in got.itertuples()
    } == {h: (min(ids), len(ids)) for h, ids in groups.items()}


def test_dedup_simhash_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    sig_groups: dict[int, list[int]] = defaultdict(list)
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = {t for t in text.split(" ") if t}
        if not toks:
            continue
        s = [0] * 16
        for t in toks:
            h = _md5(t)
            for b in range(16):
                nibble = int(h[b // 4], 16)
                s[b] += 2 * ((nibble >> (b % 4)) & 1) - 1
        sig = sum(1 << b for b in range(16) if s[b] > 0)
        sig_groups[sig].append(int(doc_id))
    got = CATALOG["dedup_simhash"].builder(spark, sf_dir).toPandas()
    assert {
        int(r.simhash16): (int(r.n_docs), int(r.keeper_doc_id))
        for r in got.itertuples()
    } == {sig: (len(ids), min(ids)) for sig, ids in sig_groups.items()}


def test_text_fingerprint_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    exp = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        sh = _shingles(text)
        if sh:
            exp[int(doc_id)] = min(_md5(s) for s in sh)[:16]
    got = CATALOG["text_fingerprint"].builder(spark, sf_dir).toPandas()
    assert dict(zip(got.doc_id.astype(int), got.fingerprint)) == exp


# --- text analysis ---------------------------------------------------


def test_text_stats_matches_python_wordcount(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    occ: Counter = Counter()
    dfreq: Counter = Counter()
    for text in docs.text:
        ws = [w for w in text.split(" ") if w]
        occ.update(ws)
        dfreq.update(set(ws))
    got = CATALOG["text_stats"].builder(spark, sf_dir).toPandas()
    assert {
        r.word: (int(r.n_occurrences), int(r.n_docs))
        for r in got.itertuples()
    } == {w: (occ[w], dfreq[w]) for w in occ}


_STOPWORDS = {"the", "a", "of", "and", "in", "to", "is", "on", "for", "with"}


def test_text_quality_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    got = (
        CATALOG["text_quality"].builder(spark, sf_dir).toPandas()
        .set_index("doc_id")
    )
    assert len(got) == len(docs)
    for row in docs.itertuples():
        ws = [w for w in row.text.split(" ") if w]
        g = got.loc[int(row.doc_id)]
        assert g.lang == row.lang
        assert int(g.n_chars) == int(row.n_chars)
        assert int(g.n_tokens) == len(ws)
        assert int(g.n_types) == len(set(ws))
        assert g.avg_token_len == pytest.approx(
            _r6(sum(map(len, ws)) / len(ws)), abs=2e-6
        )
        assert g.stopword_ratio == pytest.approx(
            _r6(sum(w in _STOPWORDS for w in ws) / len(ws)), abs=2e-6
        )
        assert g.type_token_ratio == pytest.approx(
            _r6(len(set(ws)) / len(ws)), abs=2e-6
        )


_LANG_KEYWORDS = {
    "en": ("the", "and", "data", "query", "join"),
    "es": ("el", "la", "de", "datos", "consulta"),
    "de": ("der", "die", "und", "daten", "abfrage"),
    "fr": ("le", "la", "et", "données", "requête"),
    "zh": ("数据", "查询", "的", "表", "连接"),
}


def _predict_lang(ws: list[str]) -> str:
    counts = Counter(ws)
    scores = {
        lg: sum(counts[k] for k in kws) for lg, kws in _LANG_KEYWORDS.items()
    }
    best = max(scores.values())
    if best == 0:
        return "und"
    for lg in sorted(_LANG_KEYWORDS):  # alphabetical tie-break
        if scores[lg] == best:
            return lg
    raise AssertionError("unreachable")


def _python_confusion(docs: pd.DataFrame) -> Counter:
    cm: Counter = Counter()
    for row in docs.itertuples():
        ws = [w for w in row.text.split(" ") if w]
        cm[(row.lang, _predict_lang(ws))] += 1
    return cm


def test_text_langid_matches_python(spark, sf_dir):
    cm = _python_confusion(_pq(sf_dir, "documents"))
    got = CATALOG["text_langid"].builder(spark, sf_dir).toPandas()
    assert {
        (r.lang, r.predicted_lang): int(r.n_docs) for r in got.itertuples()
    } == dict(cm)


def test_text_langid_quality_matches_python(spark, sf_dir):
    cm = _python_confusion(_pq(sf_dir, "documents"))
    actual: Counter = Counter()
    predicted: Counter = Counter()
    tp: Counter = Counter()
    for (lg, pr), n in cm.items():
        actual[lg] += n
        predicted[pr] += n
        if lg == pr:
            tp[lg] += n
    got = (
        CATALOG["text_langid_quality"].builder(spark, sf_dir).toPandas()
        .set_index("lang")
    )
    assert set(got.index) == set(actual)
    for lg, n_act in actual.items():
        g = got.loc[lg]
        assert int(g.n_actual) == n_act
        assert int(g.n_predicted) == predicted.get(lg, 0)
        assert int(g.tp) == tp.get(lg, 0)
        r = tp.get(lg, 0) / n_act
        assert g.recall_ == pytest.approx(_r6(r), abs=2e-6)
        if predicted.get(lg, 0) == 0:
            # class never predicted: NULL precision and F1, no crash
            assert pd.isna(g.precision_) and pd.isna(g.f1)
        else:
            p = tp.get(lg, 0) / predicted[lg]
            assert g.precision_ == pytest.approx(_r6(p), abs=2e-6)
            if p + r == 0:
                assert pd.isna(g.f1)
            else:
                assert g.f1 == pytest.approx(
                    _r6(2 * p * r / (p + r)), abs=2e-6
                )


_TOKEN_RE = re.compile("[a-z]+|[0-9]+|[^a-z0-9 ]")


def test_text_tokens_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    got = (
        CATALOG["text_tokens"].builder(spark, sf_dir).toPandas()
        .set_index("doc_id")
    )
    assert len(got) == len(docs)
    for row in docs.itertuples():
        g = got.loc[int(row.doc_id)]
        assert int(g.n_regex_tokens) == len(_TOKEN_RE.findall(row.text))
        assert int(g.approx_bpe_tokens) == math.ceil(int(row.n_chars) / 4)
        assert int(g.n_ws_tokens) == len(row.text.split(" "))


# --- temporal windows -------------------------------------------------


def test_win_tumbling_matches_pandas(spark, sf_dir):
    ev = _pq(sf_dir, "events")
    ev = ev[ev.ts.notna()]
    exp = {}
    for (bs, et), g in ev.groupby([ev.ts.dt.floor("10min"), ev.event_type]):
        exp[(pd.Timestamp(bs), et)] = (
            len(g),
            math.floor(float(g.value.sum()) * 100 + 0.5) / 100,
        )
    got = CATALOG["win_tumbling"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        n, sv = exp[(pd.Timestamp(r.bucket_start), r.event_type)]
        assert int(r.n_events) == n
        assert r.sum_value == pytest.approx(sv, abs=0.02)


def test_win_sliding_matches_pandas(spark, sf_dir):
    ev = _pq(sf_dir, "events")
    ev = ev[ev.ts.notna()]
    exp_n: Counter = Counter()
    exp_s: dict[pd.Timestamp, float] = defaultdict(float)
    for bs, v in zip(ev.ts.dt.floor("5min"), ev.value):
        for start in (bs, bs - pd.Timedelta(minutes=5)):
            exp_n[start] += 1
            exp_s[start] += float(v)
    got = CATALOG["win_sliding"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(exp_n)
    for r in got.itertuples():
        k = pd.Timestamp(r.bucket_start)
        assert int(r.n_events) == exp_n[k]
        assert r.sum_value == pytest.approx(
            math.floor(exp_s[k] * 100 + 0.5) / 100, abs=0.02
        )


# --- deterministic sampling ------------------------------------------


def test_sample_hash_fraction_matches_python(spark, sf_dir):
    li = _pq(sf_dir, "lineitem")
    keep = sorted(
        (int(o), int(ln), float(q))
        for o, ln, q in zip(li.l_orderkey, li.l_linenumber, li.l_quantity)
        if _md5(f"{o}|{ln}")[:2] < "1a"
    )
    got = CATALOG["sample_hash_fraction"].builder(spark, sf_dir).toPandas()
    assert (
        sorted(
            (int(r.l_orderkey), int(r.l_linenumber), float(r.l_quantity))
            for r in got.itertuples()
        )
        == keep
    )


_STRATA_CUTS = {"en": "4d", "de": "cc", "fr": "cc", "es": "cc"}


def test_sample_hash_stratified_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    kept: Counter = Counter()
    for doc_id, lang in zip(docs.doc_id, docs.lang):
        h2 = _md5(str(int(doc_id)))[:2]
        if lang == "zh" or (lang in _STRATA_CUTS and h2 < _STRATA_CUTS[lang]):
            kept[lang] += 1
    got = CATALOG["sample_hash_stratified"].builder(spark, sf_dir).toPandas()
    assert {r.lang: int(r.n_kept) for r in got.itertuples()} == dict(kept)


# --- schema evolution + HLL contract ----------------------------------


def test_scan_schema_merge_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    exp = {}
    for lang, g in docs.groupby("lang"):
        ids = g.doc_id.astype("int64").abs()
        odd = ids % 2 == 1
        exp[lang] = (
            len(g),
            int(odd.sum()),
            int(((ids[odd] % 100) * 10_000).sum()),
        )
    got = CATALOG["scan_schema_merge"].builder(spark, sf_dir).toPandas()
    assert {
        r.lang: (int(r.n_docs), int(r.n_with_quality), int(r.sum_quality_u))
        for r in got.itertuples()
    } == exp


def test_agg_approx_distinct_bound_exact_side(spark, sf_dir):
    """The python ref can pin the EXACT side and the contract flag;
    the sketch value itself is engine-internal by design."""
    li = _pq(sf_dir, "lineitem")
    exp = li.groupby("l_returnflag").l_partkey.nunique()
    got = (
        CATALOG["agg_approx_distinct_bound"].builder(spark, sf_dir)
        .toPandas()
        .set_index("l_returnflag")
    )
    assert len(got) == len(exp)
    for rf, n in exp.items():
        assert int(got.loc[rf, "exact_parts"]) == int(n)
        assert bool(got.loc[rf, "within_bound"])
