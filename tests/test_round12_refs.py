"""Third-implementation references, round-10 session (VERDICT r9
work order #4): the 5 remaining non-thin keys that relied on
parity + sweeps alone (sim_ann_ivf, dedup_embedding, rollup_multires,
join_range_binned, multimodal_cols), property references for the 3
permanently parked rows-only keys (sample_fraction,
sample_stratified, agg_approx_distinct — no oracle by protocol, so
pytest IS their evidence), and refs for this session's growth keys.
Same discipline as the sibling ref files: plain python/numpy/pandas
recomputation from the raw parquet, independent of BOTH engines.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from mapreducepy_spark.registry import load_catalog

CATALOG = load_catalog()


def _pq(sf_dir: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def _r(x: float, d: int) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


def _valid_units(emb: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, unit rows) under the similarity family's validity
    predicate: exactly 64 components, norm² > 0."""
    ok = emb.embedding.map(
        lambda v: v is not None and len(v) == 64
    )
    emb = emb[ok]
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    nsq = (mat * mat).sum(axis=1)
    keep = nsq > 0
    mat = mat[keep] / np.sqrt(nsq[keep])[:, None]
    return emb.vec_id.to_numpy(np.int64)[keep], mat


# --- multimodal_cols --------------------------------------------------


def test_multimodal_cols_matches_pandas(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    emb = _pq(sf_dir, "embeddings")
    j = docs.merge(emb, left_on="doc_id", right_on="vec_id")
    got = (
        CATALOG["multimodal_cols"].builder(spark, sf_dir).toPandas()
        .set_index(["lang", "label"])
    )
    groups = j.groupby(["lang", "label"])
    assert len(got) == groups.ngroups
    for (lang, label), g in groups:
        row = got.loc[(lang, label)]
        assert int(row.n_docs) == len(g)
        assert abs(row.avg_chars - _r(g.n_chars.mean(), 4)) < 2e-4
        # sequential per-row fold like the engine's aggregate()
        norms = []
        for v in g.embedding:
            acc = 0.0
            for x in v:
                acc += float(x) * float(x)
            norms.append(acc)
        assert abs(row.avg_norm_sq - sum(norms) / len(norms)) < 2e-6


# --- dedup_embedding --------------------------------------------------


def test_dedup_embedding_matches_numpy(spark, sf_dir):
    ids, unit = _valid_units(_pq(sf_dir, "embeddings"))
    sim = unit @ unit.T
    ia, ib = np.nonzero(np.triu(sim >= 0.4, k=1))
    # orient by vec_id (engine pairs on vec_a < vec_b, not row order)
    a, b = ids[ia], ids[ib]
    swap = a > b
    a[swap], b[swap] = b[swap], a[swap]
    ref = {
        (int(x), int(y)): float(s)
        for x, y, s in zip(a, b, sim[ia, ib])
    }
    # self-validating margin: no pair may sit on the 0.4 knife-edge
    assert np.abs(sim[np.triu_indices_from(sim, k=1)] - 0.4).min() > 1e-9
    got = CATALOG["dedup_embedding"].builder(spark, sf_dir).toPandas()
    got_pairs = {
        (int(r.vec_a), int(r.vec_b)): r.cos_sim for r in got.itertuples()
    }
    assert set(got_pairs) == set(ref)
    for k, c in got_pairs.items():
        assert abs(c - _r(ref[k], 6)) < 2e-6, k


# --- rollup_multires --------------------------------------------------


def test_rollup_multires_matches_pandas(spark, sf_dir):
    e = _pq(sf_dir, "events")
    got = (
        CATALOG["rollup_multires"].builder(spark, sf_dir).toPandas()
        .set_index(["res", "bucket_start", "event_type"])
    )
    n_expected = 0
    for res, freq in (("minute", "min"), ("hour", "h"), ("day", "D")):
        g = e.assign(bucket=e.ts.dt.floor(freq)).groupby(
            ["bucket", "event_type"]
        )["value"]
        n_expected += g.count().shape[0]
        for (bucket, typ), cnt in g.count().items():
            row = got.loc[(res, bucket, typ)]
            assert int(row.n_events) == int(cnt)
        for (bucket, typ), s in g.sum().items():
            row = got.loc[(res, bucket, typ)]
            assert abs(row.sum_value - _r(float(s), 2)) < 2e-2
    assert len(got) == n_expected


# --- join_range_binned ------------------------------------------------


def test_join_range_binned_matches_bruteforce(spark, sf_dir):
    e = _pq(sf_dir, "events")
    us = e.ts.astype("datetime64[us]").astype("int64").to_numpy()
    ids = e.event_id.to_numpy(np.int64)
    order = np.argsort(us, kind="stable")
    us, ids = us[order], ids[order]
    ref = {}
    for i in range(len(us)):  # sorted two-pointer sweep, O(n·k)
        j = i + 1
        while j < len(us) and us[j] - us[i] <= 2_000_000:
            a, b = ids[i], ids[j]
            if a > b:
                a, b = b, a
            # delta is (ts_b - ts_a) keyed by event_id order
            d = us[j] - us[i] if ids[i] < ids[j] else us[i] - us[j]
            ref[(int(a), int(b))] = int(d)
            j += 1
    got = CATALOG["join_range_binned"].builder(spark, sf_dir).toPandas()
    got_pairs = {
        (int(r.event_a), int(r.event_b)): int(r.delta_us)
        for r in got.itertuples()
    }
    assert got_pairs == ref


# --- sim_ann_ivf ------------------------------------------------------


def test_sim_ann_ivf_matches_numpy(spark, sf_dir):
    ids, unit = _valid_units(_pq(sf_dir, "embeddings"))
    # coarse quantizer: the 16 lowest-vec_id valid rows, unit-normed
    cent = unit[np.argsort(ids, kind="stable")[:16]]
    # per-ROW assignment: nearest centroid, ties to the lowest cell
    sims_c = unit @ cent.T
    cell = sims_c.argmax(axis=1)  # argmax takes first (lowest) on tie
    sim = unit @ unit.T
    ref = {}
    for c in range(16):
        rows = np.nonzero(cell == c)[0]
        for i in rows:
            best = None
            for j in rows:
                if ids[j] == ids[i]:
                    continue
                key = (-sim[i, j], ids[j])
                if best is None or key < best[0]:
                    best = (key, ids[j], sim[i, j])
            if best is not None:
                cand = (best[0], best[1], best[2], c)
                prev = ref.get(ids[i])
                # collapse duplicate ids across cells: (cos desc,
                # neighbor asc, cell asc)
                if prev is None or (cand[0], cand[3]) < (prev[0], prev[3]):
                    ref[ids[i]] = cand
    got = CATALOG["sim_ann_ivf"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(ref)
    for r in got.itertuples():
        _, nbr, cos, c = ref[r.query_id]
        assert int(r.cell) == int(c), r.query_id
        assert abs(r.cos_sim - _r(cos, 6)) < 2e-6, r.query_id
        # neighbor identity only asserted when the ref's pick is
        # unambiguous at double noise (self-validating margin)
        assert int(r.neighbor_id) == int(nbr), r.query_id


# --- parked rows-only keys (pytest IS their evidence) -----------------


def test_sample_fraction_is_deterministic_bounded_subset(spark, sf_dir):
    li = _pq(sf_dir, "lineitem")
    n = len(li)
    a = CATALOG["sample_fraction"].builder(spark, sf_dir).toPandas()
    b = CATALOG["sample_fraction"].builder(spark, sf_dir).toPandas()
    key = ["l_orderkey", "l_linenumber"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )  # same seed -> same sample
    # subset of the parent relation
    parent = set(zip(li.l_orderkey, li.l_linenumber))
    assert set(zip(a.l_orderkey, a.l_linenumber)) <= parent
    # Bernoulli(0.1) count within ±5 sigma
    sd = math.sqrt(n * 0.1 * 0.9)
    assert abs(len(a) - 0.1 * n) < 5 * sd


def test_sample_stratified_respects_per_stratum_quotas(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    fractions = {"en": 0.3, "de": 0.8, "fr": 0.8, "es": 0.8, "zh": 1.0}
    got = (
        CATALOG["sample_stratified"].builder(spark, sf_dir).toPandas()
        .set_index("lang")["n_kept"]
    )
    again = (
        CATALOG["sample_stratified"].builder(spark, sf_dir).toPandas()
        .set_index("lang")["n_kept"]
    )
    assert got.sort_index().equals(again.sort_index())  # deterministic
    base = docs.groupby("lang").size()
    for lang, frac in fractions.items():
        n = int(base.get(lang, 0))
        if n == 0:
            continue
        kept = int(got.get(lang, 0))
        assert kept <= n
        if frac == 1.0:
            assert kept == n  # quota 1.0 keeps everything
        else:
            sd = math.sqrt(n * frac * (1 - frac))
            assert abs(kept - frac * n) < 5 * sd + 1, lang


def test_agg_approx_distinct_within_hll_error_of_exact(spark, sf_dir):
    li = _pq(sf_dir, "lineitem")
    exact = li.groupby("l_returnflag").l_orderkey.nunique()
    got = (
        CATALOG["agg_approx_distinct"].builder(spark, sf_dir).toPandas()
        .set_index("l_returnflag")
    )
    sizes = li.groupby("l_returnflag").size()
    assert len(got) == len(exact)
    for flag, ex in exact.items():
        row = got.loc[flag]
        assert int(row.n_rows) == int(sizes[flag])
        # rsd 0.02 requested; 10x slack = the documented contract
        # (agg_approx_distinct_bound pins the same 10% band under
        # the driver's oracle)
        assert abs(int(row.approx_orders) - ex) <= max(0.10 * ex, 2.0)


# --- this session's growth keys ---------------------------------------


def test_events_absence_monitor_matches_python(spark, sf_dir):
    e = _pq(sf_dir, "events")
    e = e[e.user_id.notna() & e.ts.notna()]
    us = e.ts.astype("datetime64[us]").astype("int64")
    cutoff = int(us.max())
    thr = 24 * 3600 * 1_000_000
    ref = set()
    for uid, g in e.assign(us=us).groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        t = g.us.to_numpy()
        for i in range(len(t)):
            nxt = t[i + 1] if i + 1 < len(t) else cutoff
            kind = "gap" if i + 1 < len(t) else "tail"
            if nxt - t[i] > thr:
                ref.add((int(uid), int(t[i]), kind, int(nxt - t[i])))
    got = CATALOG["events_absence_monitor"].builder(spark, sf_dir).toPandas()
    got_set = {
        (
            int(r.user_id),
            int(pd.Timestamp(r.last_seen).value // 1000),
            r.alert_kind,
            int(round(r.silence_sec * 1_000_000)),
        )
        for r in got.itertuples()
    }
    assert got_set == ref


def test_join_stream_interval_matches_bruteforce(spark, sf_dir):
    e = _pq(sf_dir, "events")
    v = e[e.event_type == "view"]
    c = e[e.event_type == "click"]
    ref = set()
    for r in c.itertuples():
        for s in v[v.user_id == r.user_id].itertuples():
            lag = (r.ts - s.ts).value  # ns
            if 0 < lag <= 60 * 60 * 1_000_000_000:
                ref.add((int(r.event_id), int(s.event_id), lag // 1000))
    got = CATALOG["join_stream_interval"].builder(spark, sf_dir).toPandas()
    got_set = {
        (
            int(r.click_id),
            int(r.view_id),
            int(round(r.lag_sec * 1_000_000)),
        )
        for r in got.itertuples()
    }
    assert got_set == ref


def test_pivot_roundtrip_matches_wide_form_cells(spark, sf_dir):
    """The docstring's promise: the re-longed frame equals the wide
    pivot cell-by-cell, and both equal the direct pandas aggregate;
    the dropped rows are exactly the NULL cells."""
    li = _pq(sf_dir, "lineitem")
    direct = (
        li[li.l_linestatus.isin(["O", "F"])]
        .groupby(["l_returnflag", "l_linestatus"])
        .l_quantity.sum()
    )
    got = (
        CATALOG["pivot_roundtrip"].builder(spark, sf_dir).toPandas()
        .set_index(["l_returnflag", "l_linestatus"])["sum_qty"]
    )
    assert set(got.index) == set(direct.index)
    for k, s in direct.items():
        assert abs(got[k] - _r(float(s), 2)) < 2e-2, k
    # the synthetic fixture populates every (flag, status) combo, so
    # the NULL-cell drop path is exercised by the adversarial sweep
    # fixtures (missing combos + all-NULL-quantity groups), not here;
    # this ref pins the invariance on the populated cells
    assert len(got) == li.l_returnflag.nunique() * 2


def test_text_heavy_hitters_bound_matches_python_mg(spark, sf_dir):
    """Independent Misra-Gries recomputation (naive decrement-loop,
    different code shape from the engine's level-based kernel) on a
    DIFFERENT sharding (deterministic doc_id%8 — the engine shards by
    physical partition since r11): asserting (a) the engine's exact
    top-k rows match pandas, (b) both theorem flags hold under the
    python sketch too (guarantee-implies-survival; undercount within
    summed decrement rounds) — which is the point: the flags are
    shard-independent theorems, so ANY sharding, including this one,
    must satisfy them, (c) the sketch is NON-DEGENERATE on
    this data — decrement rounds really happened (capacity 16 <
    vocab) and the undercount is genuinely nonzero somewhere. The
    fixture's ~31-word vocabulary is NEAR-UNIFORM (top word ≈ n/26
    at every SF), so the count·(cap+1) > n survival guarantee is
    data-VACUOUS here at any capacity that still decrements; its
    non-trivial branch is proven on a constructed zipf-skewed corpus
    (test_heavy_hitters_survival_guarantee_fires_on_skewed_corpus),
    and the adversarial sweep's corpus covers the vacuous side (the
    sketch legitimately evicts a count-2 top word there and
    survival_ok stays TRUE)."""
    from collections import Counter

    docs = _pq(sf_dir, "documents")
    rows = []
    for r in docs.itertuples():
        if r.text is None:
            continue
        for pos, w in enumerate(str(r.text).split(" ")):
            if w != "":
                rows.append((r.lang, r.doc_id, pos, w))
    toks = pd.DataFrame(rows, columns=["lang", "doc_id", "pos", "word"])
    got = (
        CATALOG["text_heavy_hitters_bound"].builder(spark, sf_dir).toPandas()
    )
    assert got.survival_ok.all() and got.err_ok.all()
    total_dec, any_undercount = 0, False
    for lang, g in toks.groupby("lang", dropna=False):
        exact = Counter(g.word)
        n_lang = sum(exact.values())
        top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        gl = got[got.lang == lang].sort_values("rank")
        assert [(r.word, int(r.n)) for r in gl.itertuples()] == [
            (w, int(c)) for w, c in top
        ], lang
        merged, dec_total = Counter(), 0
        for s in range(8):
            gs = g[g.doc_id % 8 == s].sort_values(["doc_id", "pos", "word"])
            counters, dec = {}, 0
            for w in gs.word:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < 16:
                    counters[w] = 1
                else:
                    dec += 1
                    for k in list(counters):
                        counters[k] -= 1
                        if counters[k] == 0:
                            del counters[k]
            dec_total += dec
            merged.update(counters)
        total_dec += dec_total
        for w, c in top:
            if c * 17 > n_lang:  # the MG survival guarantee fires
                assert w in merged, (lang, w)
            assert 0 <= c - merged.get(w, 0) <= dec_total, (lang, w)
            if c - merged.get(w, 0) > 0:
                any_undercount = True
    assert total_dec > 0     # the decrement path is real on this corpus
    assert any_undercount    # ...and the bound guards a REAL undercount


def test_heavy_hitters_survival_guarantee_fires_on_skewed_corpus(
    spark, tmp_path
):
    """The survival guarantee's NON-TRIVIAL branch, on a constructed
    zipf-skewed corpus where the fixture cannot reach it: 'hot'
    carries >1/17 of the stream (count·17 > n) while 30 filler words
    force real decrements (vocab 31 > capacity 16). The engine must
    emit survival_ok=TRUE via ACTUAL survival (the python sketch
    confirms 'hot' is in the merged summary and the guarantee fired),
    and the exact top-1 must be 'hot'. Mutation-visible: a kernel
    that dropped guaranteed words, or a guarantee computed against
    the wrong stream length, flips this test."""
    import duckdb

    fillers = [f"w{i:02d}" for i in range(30)]
    rows = []
    for d in range(40):
        # 10 'hot' + 6 distinct fillers per doc -> hot ≈ 62% of tokens
        toks = ["hot"] * 10 + [fillers[(d * 6 + k) % 30] for k in range(6)]
        rows.append((d, " ".join(toks), "en", "web", len(" ".join(toks))))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    got = (
        CATALOG["text_heavy_hitters_bound"]
        .builder(spark, str(tmp_path))
        .toPandas()
        .sort_values("rank")
    )
    assert got.word.iloc[0] == "hot"
    n_lang = 40 * 16
    assert int(got.n.iloc[0]) * 17 > n_lang  # the guarantee FIRES
    assert got.survival_ok.all() and got.err_ok.all()
    # python confirmation that survival was actual, not vacuous
    merged, dec_total = {}, 0
    for s in range(8):
        stream = []
        for d in range(s, 40, 8):
            toks = ["hot"] * 10 + [
                fillers[(d * 6 + k) % 30] for k in range(6)
            ]
            for pos, w in enumerate(toks):
                stream.append((d, pos, w))
        counters, dec = {}, 0
        for _, _, w in sorted(stream):
            if w in counters:
                counters[w] += 1
            elif len(counters) < 16:
                counters[w] = 1
            else:
                dec += 1
                for k in list(counters):
                    counters[k] -= 1
                    if counters[k] == 0:
                        del counters[k]
        dec_total += dec
        for w, c in counters.items():
            merged[w] = merged.get(w, 0) + c
    assert "hot" in merged
    assert dec_total > 0  # the sketch really decremented
    # oracle agreement on the same corpus
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    from .parity_util import canon_frame

    dpd = con.execute(CATALOG["text_heavy_hitters_bound"].oracle).fetchdf()
    spd = CATALOG["text_heavy_hitters_bound"].builder(
        spark, str(tmp_path)
    ).toPandas()
    assert canon_frame(spd) == canon_frame(dpd)
