"""Third-implementation references for the PREDICTED round-10 driver
window: ``distinct_rows`` + the round-9 growth block already have
refs (test_round9_refs / test_round9b_refs); this file covers the
kernel-heavy keys of the r6-green block that fills the window's
remaining slots — written BEFORE the window rotates so the next
round's head keys carry independent evidence on day one.

Discipline as in the sibling files: plain python/pandas recomputation
from the raw parquet, independent of BOTH engines.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from mapreducepy_spark.registry import load_catalog

CATALOG = load_catalog()


def _pq(sf_dir: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _r(x: float, d: int) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


def _toks(text: str) -> list[str]:
    return [w for w in text.split(" ") if w]


# --- windows ----------------------------------------------------------


def test_win_rank_matches_python(spark, sf_dir):
    o = _pq(sf_dir, "orders")
    exp = {}
    for ck, g in o.groupby("o_custkey"):
        rows = sorted(
            zip(g.o_totalprice, g.o_orderkey), key=lambda t: (-t[0], t[1])
        )
        # o_orderkey is unique, so competition rank == row_number
        for pos, (price, ok) in enumerate(rows[:3], start=1):
            exp[int(ok)] = (int(ck), float(price), pos, pos)
    got = CATALOG["win_rank"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(exp)
    for r_ in got.itertuples():
        ck, price, rnk, rn = exp[int(r_.o_orderkey)]
        assert (int(r_.c_custkey), float(r_.o_totalprice)) == (ck, price)
        assert (int(r_.rnk), int(r_.rn)) == (rnk, rn)


def test_win_range_frame_matches_python(spark, sf_dir):
    ev = _pq(sf_dir, "events")
    # normalize to µs whatever the stored unit (sf0.001 ships
    # timestamp[us]; a ns source truncates exactly like the
    # engine's `ts div 1000` for positive epochs)
    us = ev.ts.values.astype("datetime64[us]").astype("int64")
    exp = {}
    by_user: dict[int, list[tuple[int, int, float]]] = defaultdict(list)
    for eid, uid, t, v in zip(ev.event_id, ev.user_id, us, ev.value):
        by_user[int(uid)].append((int(t), int(eid), float(v)))
    for uid, rows in by_user.items():
        for t, eid, _ in rows:
            s = sum(v for (t2, _, v) in rows if t - 600_000_000 <= t2 <= t)
            exp[eid] = (uid, _r(s, 2))
    got = CATALOG["win_range_frame"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(exp)
    for r_ in got.itertuples():
        uid, s = exp[int(r_.event_id)]
        assert int(r_.user_id) == uid
        assert r_.trailing_10min_value == pytest.approx(s, abs=0.02)


# --- aggregates -------------------------------------------------------


def test_agg_histogram_matches_python(spark, sf_dir):
    o = _pq(sf_dir, "orders")
    exp: dict[int, list] = {}
    for p in o.o_totalprice:
        b = math.floor(p / 20000.0)
        e = exp.setdefault(b, [0, math.inf, -math.inf])
        e[0] += 1
        e[1] = min(e[1], p)
        e[2] = max(e[2], p)
    got = CATALOG["agg_histogram"].builder(spark, sf_dir).toPandas()
    assert {
        int(r_.bin): [int(r_.n), float(r_.lo), float(r_.hi)]
        for r_ in got.itertuples()
    } == {b: [n, lo, hi] for b, (n, lo, hi) in exp.items()}


def test_agg_mode_matches_python(spark, sf_dir):
    c = _pq(sf_dir, "customer")
    n = _pq(sf_dir, "nation").set_index("n_nationkey")["n_name"]
    counts: Counter = Counter()
    for nk, seg in zip(c.c_nationkey, c.c_mktsegment):
        counts[(n[nk], seg)] += 1
    per_nation: dict[str, list] = defaultdict(list)
    for (name, seg), k in counts.items():
        per_nation[name].append((-k, seg))
    exp = {
        name: (min(pairs)[1], -min(pairs)[0])
        for name, pairs in per_nation.items()
    }
    got = CATALOG["agg_mode"].builder(spark, sf_dir).toPandas()
    assert {
        r_.n_name: (r_.mode_mktsegment, int(r_.n_customers))
        for r_ in got.itertuples()
    } == exp


def test_agg_weighted_avg_matches_python(spark, sf_dir):
    li = _pq(sf_dir, "lineitem")
    got = (
        CATALOG["agg_weighted_avg"].builder(spark, sf_dir).toPandas()
        .set_index("l_returnflag")
    )
    for rf, g in li.groupby("l_returnflag"):
        q = g.l_quantity.to_numpy()
        e = g.l_extendedprice.to_numpy()
        d = g.l_discount.to_numpy()
        row = got.loc[rf]
        assert row.sum_qty == pytest.approx(_r(float(q.sum()), 2), abs=0.02)
        assert row.wavg_price == pytest.approx(
            _r(float((e * q).sum() / q.sum()), 6), abs=2e-6
        )
        assert row.wavg_discount == pytest.approx(
            _r(float((d * q).sum() / q.sum()), 6), abs=2e-6
        )


def test_agg_collect_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    posting: dict[str, set[int]] = defaultdict(set)
    for doc_id, text in zip(docs.doc_id, docs.text):
        for w in set(_toks(text)):
            posting[w].add(int(doc_id))
    got = CATALOG["agg_collect"].builder(spark, sf_dir).toPandas()
    assert {
        r_.word: (r_.doc_ids, int(r_.n_docs)) for r_ in got.itertuples()
    } == {
        w: (",".join(str(i) for i in sorted(ids)), len(ids))
        for w, ids in posting.items()
    }


# --- dedup / decontamination -------------------------------------------


def test_dedup_keep_first_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    keeper: dict[str, int] = {}
    meta = {}
    for doc_id, text, lang, nc in zip(
        docs.doc_id, docs.text, docs.lang, docs.n_chars
    ):
        h = _md5(text)
        d = int(doc_id)
        if h not in keeper or d < keeper[h]:
            keeper[h] = d
        meta[d] = (lang, int(nc))
    exp = {d: meta[d] for d in keeper.values()}
    got = CATALOG["dedup_keep_first"].builder(spark, sf_dir).toPandas()
    assert {
        int(r_.doc_id): (r_.lang, int(r_.n_chars)) for r_ in got.itertuples()
    } == exp


def test_dedup_cross_source_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    srcs: dict[str, set[str]] = defaultdict(set)
    for text, src in zip(docs.text, docs.source):
        srcs[_md5(text)].add(src)
    exp: Counter = Counter()
    for ss in srcs.values():
        s = sorted(ss)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                exp[(s[i], s[j])] += 1
    got = CATALOG["dedup_cross_source"].builder(spark, sf_dir).toPandas()
    assert {
        (r_.source_a, r_.source_b): int(r_.n_shared)
        for r_ in got.itertuples()
    } == dict(exp)


def test_text_decontaminate_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    is_eval = {
        int(d): _md5(str(int(d)))[:2] < "0d" for d in docs.doc_id
    }
    blocked = {
        _md5(t)
        for d, t in zip(docs.doc_id, docs.text)
        if is_eval[int(d)]
    }
    exp = {
        int(d): lg
        for d, t, lg in zip(docs.doc_id, docs.text, docs.lang)
        if not is_eval[int(d)] and _md5(t) not in blocked
    }
    got = CATALOG["text_decontaminate"].builder(spark, sf_dir).toPandas()
    assert dict(zip(got.doc_id.astype(int), got.lang)) == exp


# --- text profiles ----------------------------------------------------


def test_text_hapax_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    per_src: dict[str, Counter] = defaultdict(Counter)
    for src, text in zip(docs.source, docs.text):
        per_src[src].update(_toks(text))
    got = (
        CATALOG["text_hapax"].builder(spark, sf_dir).toPandas()
        .set_index("source")
    )
    assert set(got.index) == set(per_src)
    for src, c in per_src.items():
        row = got.loc[src]
        hapax = sum(1 for v in c.values() if v == 1)
        assert int(row.n_types) == len(c)
        assert int(row.n_tokens) == sum(c.values())
        assert int(row.n_hapax) == hapax
        assert row.hapax_rate == pytest.approx(
            _r(hapax / len(c), 6), abs=2e-6
        )


def test_text_pack_sequences_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    exp = {}
    for lang, g in docs.groupby("lang"):
        cum = 0
        for doc_id, text in sorted(zip(g.doc_id, g.text)):
            n = len(_toks(text))
            exp[int(doc_id)] = (lang, n, cum // 512)
            cum += n
    got = CATALOG["text_pack_sequences"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(exp)
    for r_ in got.itertuples():
        lang, n, pack = exp[int(r_.doc_id)]
        assert (r_.lang, int(r_.n_tokens), int(r_.pack_id)) == (lang, n, pack)


def test_text_bigrams_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    c: Counter = Counter()
    for text in docs.text:
        t = _toks(text)
        for i in range(len(t) - 1):
            c[f"{t[i]} {t[i + 1]}"] += 1
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    got = CATALOG["text_bigrams"].builder(spark, sf_dir).toPandas()
    assert [
        (r_.bigram, int(r_.n_occurrences)) for r_ in got.itertuples()
    ] == top


def test_text_quality_filter_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    exp = {}
    for r_ in docs.itertuples():
        ws = _toks(r_.text)
        if not ws:
            continue
        n, ttr = len(ws), len(set(ws)) / len(ws)
        avg_len = sum(map(len, ws)) / len(ws)
        if n >= 20 and ttr >= 0.30 and avg_len <= 5.2:
            exp[int(r_.doc_id)] = (r_.lang, r_.source, n, _r(ttr, 6))
    got = CATALOG["text_quality_filter"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(exp)
    for r_ in got.itertuples():
        lang, src, n, ttr = exp[int(r_.doc_id)]
        assert (r_.lang, r_.source, int(r_.n_tokens)) == (lang, src, n)
        assert r_.type_token_ratio == pytest.approx(ttr, abs=2e-6)


def test_text_length_profile_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    got = (
        CATALOG["text_length_profile"].builder(spark, sf_dir).toPandas()
        .set_index("source")
    )
    assert set(got.index) == set(docs.source)
    for src, g in docs.groupby("source"):
        v = sorted(int(x) for x in g.n_chars)
        n = len(v)
        row = got.loc[src]
        assert int(row.n_docs) == n
        assert int(row.min_chars) == v[0]
        assert int(row.max_chars) == v[-1]
        assert row.avg_chars == pytest.approx(_r(sum(v) / n, 6), abs=2e-6)
        for q, col in ((0.50, "p50_chars"), (0.90, "p90_chars"),
                       (0.99, "p99_chars")):
            assert int(row[col]) == v[math.ceil(q * n) - 1]


# --- joins ------------------------------------------------------------


def test_join_skew_salted_matches_pandas_plain_join(spark, sf_dir):
    """Salting must be result-invariant: the ref is the PLAIN join."""
    li = _pq(sf_dir, "lineitem")[["l_orderkey", "l_extendedprice"]]
    o = _pq(sf_dir, "orders")[["o_orderkey", "o_orderpriority"]]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    got = (
        CATALOG["join_skew_salted"].builder(spark, sf_dir).toPandas()
        .set_index("o_orderpriority")
    )
    grp = j.groupby("o_orderpriority")
    assert set(got.index) == set(grp.groups)
    for prio, g in grp:
        assert int(got.loc[prio, "n_items"]) == len(g)
        assert got.loc[prio, "revenue"] == pytest.approx(
            _r(float(g.l_extendedprice.sum()), 2), abs=0.02
        )


# --- embeddings / events -----------------------------------------------


def test_embed_norm_bins_matches_python(spark, sf_dir):
    emb = _pq(sf_dir, "embeddings")
    cells: dict[tuple[int, int], list[float]] = defaultdict(list)
    for vec in emb.embedding:
        acc = 0.0
        for x in vec:  # dimension-ordered fold, like both engines
            xd = float(x)
            acc += xd * xd
        nrm = _r(math.sqrt(acc), 6)
        maxcomp = _r(max(abs(float(x)) for x in vec), 6)
        cells[(math.floor(nrm * 1000.0), math.floor(maxcomp * 100.0))].append(
            maxcomp
        )
    got = CATALOG["embed_norm_bins"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(cells)
    for r_ in got.itertuples():
        ms = cells[(int(r_.norm_mbin), int(r_.maxcomp_cbin))]
        assert int(r_.n_vectors) == len(ms)
        assert r_.avg_maxcomp == pytest.approx(
            _r(sum(ms) / len(ms), 6), abs=2e-6
        )


def test_events_retention_matches_python(spark, sf_dir):
    ev = _pq(sf_dir, "events")
    d = ev.ts.dt.date
    first = {}
    for uid, day in zip(ev.user_id, d):
        uid = int(uid)
        if uid not in first or day < first[uid]:
            first[uid] = day
    cells: Counter = Counter()
    seen = set()
    for uid, day in zip(ev.user_id, d):
        uid = int(uid)
        key = (uid, (day - first[uid]).days)
        if key not in seen:
            seen.add(key)
            cells[(str(first[uid]), key[1])] += 1
    got = CATALOG["events_retention"].builder(spark, sf_dir).toPandas()
    assert {
        (r_.cohort_date, int(r_.day_offset)): int(r_.n_users)
        for r_ in got.itertuples()
    } == dict(cells)
