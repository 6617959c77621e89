"""Third-implementation references for kernel-heavy keys of the
r7-green block — the cohort that will fill the round-11 driver
window. Same discipline as the sibling ref files: plain
python/numpy/pandas recomputation from the raw parquet, independent
of BOTH engines. The MinHash helpers are imported from
``test_round9c_refs`` so the funnel's python reference stays ONE
implementation.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from mapreducepy_spark.registry import load_catalog

from .test_round9c_refs import _md5, _shingles

CATALOG = load_catalog()


def _pq(sf_dir: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def _r(x: float, d: int) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


def _ntile(n_rows: int, n_buckets: int, pos: int) -> int:
    """SQL NTILE: first (n % b) buckets get one extra row; pos is
    1-based."""
    base, extra = divmod(n_rows, n_buckets)
    cut = extra * (base + 1)
    if pos <= cut:
        return (pos - 1) // (base + 1) + 1
    return extra + (pos - cut - 1) // base + 1


# --- windows ----------------------------------------------------------


def test_win_ntile_matches_python(spark, sf_dir):
    c = _pq(sf_dir, "customer")
    order = sorted(
        zip(c.c_acctbal, c.c_custkey),
        key=lambda t: (t[0] is not None, t[0], t[1]),  # NULLS FIRST
    )
    n = len(order)
    exp = {
        int(ck): _ntile(n, 4, pos)
        for pos, (_, ck) in enumerate(order, start=1)
    }
    got = CATALOG["win_ntile"].builder(spark, sf_dir).toPandas()
    assert dict(zip(got.c_custkey.astype(int), got.wealth_quartile)) == exp


def test_win_dist_matches_python(spark, sf_dir):
    o = _pq(sf_dir, "orders")
    exp = {}
    for ck, g in o.groupby("o_custkey"):
        rows = sorted(zip(g.o_totalprice, g.o_orderkey))
        n = len(rows)
        for pos, (_, ok) in enumerate(rows, start=1):
            # o_orderkey unique -> rank == pos, rows <= current == pos
            pr = 0.0 if n == 1 else (pos - 1) / (n - 1)
            exp[int(ok)] = (_r(pr, 6), _r(pos / n, 6), _ntile(n, 4, pos))
    got = CATALOG["win_dist"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(exp)
    for r_ in got.itertuples():
        pr, cume, q = exp[int(r_.o_orderkey)]
        assert r_.pct_rank == pytest.approx(pr, abs=2e-6)
        assert r_.cume == pytest.approx(cume, abs=2e-6)
        assert int(r_.quartile) == q


def test_win_running_matches_python(spark, sf_dir):
    o = _pq(sf_dir, "orders")
    exp = {}
    for ck, g in o.groupby("o_custkey"):
        rows = sorted(
            zip(g.o_orderdate, g.o_orderkey, g.o_totalprice),
            key=lambda t: (t[0], t[1]),
        )
        run = 0.0
        for i, (_, ok, price) in enumerate(rows):
            run += float(price)
            window = [p for (_, _, p) in rows[max(0, i - 2) : i + 1]]
            exp[int(ok)] = (
                _r(run, 2),
                _r(sum(window) / len(window), 4),
            )
    got = CATALOG["win_running"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(exp)
    for r_ in got.itertuples():
        run, mv = exp[int(r_.o_orderkey)]
        assert r_.running_spend == pytest.approx(run, abs=0.02)
        assert r_.moving_avg_3 == pytest.approx(mv, abs=2e-4)


# --- aggregates -------------------------------------------------------


def test_agg_quantile_disc_matches_python(spark, sf_dir):
    li = _pq(sf_dir, "lineitem")
    li = li[li.l_extendedprice.notna()]
    got = (
        CATALOG["agg_quantile_disc"].builder(spark, sf_dir).toPandas()
        .set_index("l_returnflag")
    )
    for rf, g in li.groupby("l_returnflag"):
        v = sorted(float(x) for x in g.l_extendedprice)
        n = len(v)
        row = got.loc[rf]
        assert int(row.n_rows) == n
        assert float(row.p50_price) == v[math.ceil(0.50 * n) - 1]
        assert float(row.p95_price) == v[math.ceil(0.95 * n) - 1]


def _type7(sorted_vals: list[float], p: float) -> float:
    n = len(sorted_vals)
    h = (n - 1) * p + 1.0
    lo = int(math.floor(h))
    frac = h - lo
    hi_v = sorted_vals[lo] if lo < n else sorted_vals[lo - 1]
    return sorted_vals[lo - 1] + frac * (hi_v - sorted_vals[lo - 1])


def test_agg_stats_matches_numpy(spark, sf_dir):
    li = _pq(sf_dir, "lineitem")
    got = (
        CATALOG["agg_stats"].builder(spark, sf_dir).toPandas()
        .set_index("l_returnflag")
    )
    for rf, g in li.groupby("l_returnflag"):
        q = g.l_quantity.to_numpy(np.float64)
        e = g.l_extendedprice.to_numpy(np.float64)
        d = np.sort(g.l_discount.to_numpy(np.float64))
        row = got.loc[rf]
        assert row.sd_qty == pytest.approx(_r(q.std(ddof=1), 6), abs=2e-6)
        assert row.var_price == pytest.approx(
            _r(e.var(ddof=1), 4), abs=2e-4
        )
        corr = float(np.corrcoef(q, e)[0, 1])
        assert row.corr_qty_price == pytest.approx(_r(corr, 6), abs=2e-6)
        assert row.median_disc == pytest.approx(
            _r(_type7(list(d), 0.5), 6), abs=2e-6
        )


def test_agg_pivot_matches_python(spark, sf_dir):
    li = _pq(sf_dir, "lineitem")
    got = (
        CATALOG["agg_pivot"].builder(spark, sf_dir).toPandas()
        .set_index("l_returnflag")
    )
    for rf, g in li.groupby("l_returnflag"):
        for status, col in (("O", "qty_open"), ("F", "qty_fulfilled")):
            s = g[g.l_linestatus == status].l_quantity.sum()
            v = got.loc[rf, col]
            if len(g[g.l_linestatus == status]) == 0:
                assert pd.isna(v)
            else:
                assert v == pytest.approx(_r(float(s), 2), abs=0.02)


def test_agg_rollup_matches_python(spark, sf_dir):
    li = _pq(sf_dir, "lineitem")
    exp = {}
    for (rf, ls), g in li.groupby(["l_returnflag", "l_linestatus"]):
        exp[(rf, ls)] = (_r(float(g.l_quantity.sum()), 2), len(g))
    for rf, g in li.groupby("l_returnflag"):
        exp[(rf, None)] = (_r(float(g.l_quantity.sum()), 2), len(g))
    exp[(None, None)] = (_r(float(li.l_quantity.sum()), 2), len(li))
    got = CATALOG["agg_rollup"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(exp)
    for r_ in got.itertuples():
        rf = None if pd.isna(r_.l_returnflag) else r_.l_returnflag
        ls = None if pd.isna(r_.l_linestatus) else r_.l_linestatus
        sq, n = exp[(rf, ls)]
        assert r_.sum_qty == pytest.approx(sq, abs=0.02)
        assert int(r_.n_rows) == n


def test_agg_key_skew_matches_python(spark, sf_dir):
    o = _pq(sf_dir, "orders")
    per = Counter(int(k) for k in o.o_custkey)
    n_keys, n_rows = len(per), sum(per.values())
    mx = max(per.values())
    singles = sum(1 for v in per.values() if v == 1)
    topk = sum(
        n for _, n in sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    )
    got = CATALOG["agg_key_skew"].builder(spark, sf_dir).toPandas()
    assert len(got) == 1
    r_ = got.iloc[0]
    assert (
        int(r_.n_keys), int(r_.n_rows), int(r_.max_key_rows),
        int(r_.n_singleton_keys), int(r_.topk_rows),
    ) == (n_keys, n_rows, mx, singles, topk)
    assert int(r_.max_share_ppm) == math.floor(mx / n_rows * 1e6 + 0.5)
    assert int(r_.topk_share_ppm) == math.floor(topk / n_rows * 1e6 + 0.5)
    assert r_.max_vs_mean == pytest.approx(
        _r(mx / (n_rows / n_keys), 4), abs=2e-4
    )


def test_agg_top_revenue_matches_python(spark, sf_dir):
    li = _pq(sf_dir, "lineitem")
    start = pd.Timestamp("1996-01-01")
    end = pd.Timestamp("1996-04-01")
    li = li[(li.l_shipdate >= start) & (li.l_shipdate < end)]
    cents: Counter = Counter()
    for sk, price, disc in zip(
        li.l_suppkey, li.l_extendedprice, li.l_discount
    ):
        cents[int(sk)] += math.floor(price * (1 - disc) * 100.0 + 0.5)
    mx = max(cents.values())
    supp = _pq(sf_dir, "supplier").set_index("s_suppkey")["s_name"]
    exp = {
        sk: (supp[sk], mx / 100.0) for sk, v in cents.items() if v == mx
    }
    got = CATALOG["agg_top_revenue"].builder(spark, sf_dir).toPandas()
    assert {
        int(r_.s_suppkey): (r_.s_name, float(r_.total_revenue))
        for r_ in got.itertuples()
    } == exp


# --- text / embeddings / funnel -----------------------------------------


def test_text_vocab_coverage_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    wc: Counter = Counter()
    for text in docs.text:
        wc.update(w for w in text.split(" ") if w)
    total = sum(wc.values())
    ordered = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
    cums = []
    acc = 0
    for _, n in ordered:
        acc += n
        cums.append(acc)
    got = CATALOG["text_vocab_coverage"].builder(spark, sf_dir).toPandas()
    assert sorted(got.k.astype(int)) == [10, 100, 1000]
    for r_ in got.itertuples():
        used = min(int(r_.k), len(ordered))
        assert int(r_.n_types_used) == used
        assert int(r_.tokens_covered) == cums[used - 1]
        assert r_.coverage == pytest.approx(
            _r(cums[used - 1] / total, 6), abs=2e-6
        )


def test_embed_bucket_purity_matches_python(spark, sf_dir):
    emb = _pq(sf_dir, "embeddings")
    cells: Counter = Counter()
    for vec, label in zip(emb.embedding, emb.label):
        if vec is None or len(vec) != 64:
            continue
        bucket = sum(1 << i for i in range(4) if float(vec[i]) > 0)
        cells[(bucket, int(label))] += 1
    per_bucket: dict[int, list] = defaultdict(list)
    for (b, lab), n in cells.items():
        per_bucket[b].append((-n, lab))
    got = CATALOG["embed_bucket_purity"].builder(spark, sf_dir).toPandas()
    assert set(got.bucket.astype(int)) == set(per_bucket)
    for r_ in got.itertuples():
        pairs = per_bucket[int(r_.bucket)]
        n_vecs = sum(-c for c, _ in pairs)
        top_c, top_lab = min(pairs)
        assert int(r_.n_vecs) == n_vecs
        assert int(r_.n_labels) == len(pairs)
        assert (int(r_.top_label), int(r_.top_n)) == (top_lab, -top_c)
        assert r_.purity == pytest.approx(_r(-top_c / n_vecs, 6), abs=2e-6)


def test_dedup_threshold_sweep_matches_python(spark, sf_dir):
    """Recompute the LSH candidate set AND each pair's exact Jaccard
    in python (the test_round9c_refs pipeline), band at 0.1, and
    check the survivors-at-or-above cumulative curve."""
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
        mh[d] = [
            min(h[4 * i :] + h[: 4 * i] for h in hs) for i in range(8)
        ]
    buckets: dict[tuple[int, str], list[int]] = defaultdict(list)
    for d, sig in mh.items():
        for b in range(4):
            buckets[(b, sig[2 * b] + sig[2 * b + 1])].append(d)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    bands: Counter = Counter()
    for a, b in pairs:
        inter = len(shset[a] & shset[b])
        jac = _r(inter / (len(shset[a]) + len(shset[b]) - inter), 6)
        bands[min(math.floor(jac * 10.0), 9) / 10.0] += 1
    cum = 0
    exp = {}
    for t in sorted(bands, reverse=True):
        cum += bands[t]
        exp[t] = (bands[t], cum)
    got = CATALOG["dedup_threshold_sweep"].builder(spark, sf_dir).toPandas()
    assert {
        float(r_.threshold): (int(r_.n_pairs), int(r_.n_pairs_at_or_above))
        for r_ in got.itertuples()
    } == exp
