"""Third-implementation references for round-8 growth keys that had
none — these lead the round-9 driver window, so independent evidence
on exactly this block is what makes a hash mismatch diagnosable.
Each kernel is recomputed in plain numpy/pandas/python from the raw
parquet, independent of BOTH engines.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from mapreducepy_spark.registry import load_catalog

CATALOG = load_catalog()


def _pq(sf_dir: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def _type7(sorted_vals: np.ndarray, p: float) -> float:
    """The repo's explicit type-7 interpolation (h = (n-1)p + 1)."""
    n = len(sorted_vals)
    h = (n - 1) * p + 1.0
    lo = int(math.floor(h))
    frac = h - lo
    lo_v = float(sorted_vals[lo - 1])
    hi_v = float(sorted_vals[lo]) if lo < n else lo_v
    return lo_v + frac * (hi_v - lo_v)


def test_agg_mad_matches_numpy_two_pass(spark, sf_dir):
    got = (
        CATALOG["agg_mad"].builder(spark, sf_dir).toPandas()
        .set_index("o_orderpriority")
    )
    o = _pq(sf_dir, "orders")
    o = o[o.o_totalprice.notna()]
    for prio, g in o.groupby("o_orderpriority", dropna=False):
        v = np.sort(g["o_totalprice"].to_numpy(np.float64))
        med = math.floor(_type7(v, 0.5) * 1e6 + 0.5) / 1e6  # inner round
        dev = np.sort(np.abs(v - med))
        mad = math.floor(_type7(dev, 0.5) * 1e6 + 0.5) / 1e6
        assert int(got.loc[prio, "n_rows"]) == len(v)
        assert got.loc[prio, "median_price"] == pytest.approx(med, abs=2e-6)
        assert got.loc[prio, "mad_price"] == pytest.approx(mad, abs=2e-6)


def test_win_ema_matches_numpy_closed_form(spark, sf_dir):
    got = CATALOG["win_ema"].builder(spark, sf_dir).toPandas()
    ev = _pq(sf_dir, "events")
    ev = ev.sort_values(
        ["user_id", "ts", "event_id", "value"],
        na_position="first",
        kind="stable",
    )
    want: dict[int, float | None] = {}
    for _, g in ev.groupby("user_id", dropna=False):
        vals = g["value"].tolist()
        ids = g["event_id"].tolist()
        for i in range(len(vals)):
            frame = [
                v for v in vals[max(0, i - 7) : i + 1] if pd.notna(v)
            ]
            n = len(frame)
            if n == 0:
                ema = None
            else:
                # ema_k = (x_k + ema_{k-1})/2 from a fresh start:
                # c_1 = 2^-(n-1), c_j = 2^-(n-j+1) for j >= 2
                ema = 0.0
                for j, x in enumerate(frame, start=1):
                    c = 0.5 ** ((n - 1) if j == 1 else (n - j + 1))
                    ema += x * c
                ema = math.floor(ema * 1e6 + 0.5) / 1e6
            if pd.notna(ids[i]):
                want[int(ids[i])] = ema
    checked = 0
    for row in got.itertuples():
        if pd.isna(row.event_id) or int(row.event_id) not in want:
            continue
        w = want[int(row.event_id)]
        if w is None:
            assert pd.isna(row.ema8), row.event_id
        else:
            assert row.ema8 == pytest.approx(w, abs=2e-6), row.event_id
        checked += 1
    assert checked > 100


def test_events_funnel_timing_matches_pandas(spark, sf_dir):
    got = (
        CATALOG["events_funnel_timing"].builder(spark, sf_dir).toPandas()
        .set_index("stage")
    )
    ev = _pq(sf_dir, "events")
    ev = ev[ev.ts.notna()]
    v = ev[ev.event_type == "view"].groupby("user_id")["ts"].min()
    clicks = ev[ev.event_type == "click"].merge(
        v.rename("t1"), left_on="user_id", right_index=True
    )
    c = clicks[clicks.ts > clicks.t1].groupby("user_id")["ts"].min()
    purch = ev[ev.event_type == "purchase"].merge(
        c.rename("t2"), left_on="user_id", right_index=True
    )
    p = purch[purch.ts > purch.t2].groupby("user_id")["ts"].min()
    g1 = (
        (c - v.loc[c.index]).dt.total_seconds().to_numpy() * 1e6
    ).round()  # µs gaps (fixture is µs-aligned so round() is exact)
    g2 = ((p - c.loc[p.index]).dt.total_seconds().to_numpy() * 1e6).round()
    for stage, gaps in (("view>click", g1), ("click>purchase", g2)):
        gaps = np.sort(gaps)
        assert int(got.loc[stage, "n_users"]) == len(gaps)
        for q, col in ((0.5, "p50_sec"), (0.9, "p90_sec")):
            want = math.floor(_type7(gaps, q) / 1e6 * 1e6 + 0.5) / 1e6
            assert got.loc[stage, col] == pytest.approx(want, abs=2e-6), (
                stage,
                col,
            )


def test_sample_weighted_hash_matches_hashlib(spark, sf_dir):
    got = (
        CATALOG["sample_weighted_hash"].builder(spark, sf_dir).toPandas()
        .set_index(["lang", "source"])
    )
    docs = _pq(sf_dir, "documents")
    agg: dict[tuple, list[int]] = {}
    for r in docs.itertuples():
        key = (r.lang, r.source)
        n_total, n_kept, id_sum = agg.get(key, [0, 0, 0])
        n_total += 1
        if pd.notna(r.doc_id) and pd.notna(r.n_chars):
            u16 = int(
                hashlib.md5(str(int(r.doc_id)).encode()).hexdigest()[:4], 16
            )
            cut = math.floor(min(1.0, float(r.n_chars) / 800.0) * 65536.0)
            if u16 < cut:
                n_kept += 1
                id_sum += int(r.doc_id)
        agg[key] = [n_total, n_kept, id_sum]
    assert len(agg) == len(got)
    kept_any = 0
    for key, (n_total, n_kept, id_sum) in agg.items():
        assert int(got.loc[key, "n_total"]) == n_total, key
        assert int(got.loc[key, "n_kept"]) == n_kept, key
        assert int(got.loc[key, "kept_id_sum"]) == id_sum, key
        kept_any += n_kept
    assert kept_any > 0  # the sampler must actually keep something


def test_cdc_snapshot_diff_matches_pandas(spark, sf_dir):
    got = (
        CATALOG["cdc_snapshot_diff"].builder(spark, sf_dir).toPandas()
        .set_index("class")
    )
    o = _pq(sf_dir, "orders")
    o = o[
        o.o_custkey.notna()
        & o.o_orderdate.notna()
        & (o.o_custkey % 10 == 0)
    ].sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="stable")

    def snapshot(ts: str) -> dict[int, int]:
        t = pd.Timestamp(ts)
        out: dict[int, int] = {}
        for ck, g in o.groupby("o_custkey"):
            dates = g["o_orderdate"].tolist()
            keys = g["o_orderkey"].tolist()
            for i in range(len(dates)):
                vfrom = dates[i]
                vto = dates[i + 1] if i + 1 < len(dates) else None
                if vfrom <= t and (vto is None or t < vto):
                    out[int(ck)] = int(keys[i])
        return out

    a, b = snapshot("1996-06-01"), snapshot("1999-06-01")
    cls: dict[str, list[int]] = {}
    for ck in set(a) | set(b):
        if ck not in a:
            c = "appeared"
        elif ck not in b:
            c = "disappeared"
        elif a[ck] == b[ck]:
            c = "unchanged"
        else:
            c = "changed"
        cls.setdefault(c, []).append(ck)
    assert set(cls) == set(got.index)
    for c, keys in cls.items():
        assert int(got.loc[c, "n_keys"]) == len(keys), c
        assert int(got.loc[c, "min_key"]) == min(keys), c
        assert int(got.loc[c, "max_key"]) == max(keys), c


def test_events_burst_detect_matches_pandas(spark, sf_dir):
    got = CATALOG["events_burst_detect"].builder(spark, sf_dir).toPandas()
    got = got.set_index(["event_type", "bucket"]).sort_index()
    ev = _pq(sf_dir, "events")
    ev = ev[ev.ts.notna() & ev.event_type.notna()]
    bucket = ev["ts"].dt.floor("10min")
    counts = (
        ev.assign(bucket=bucket)
        .groupby(["event_type", "bucket"])
        .size()
        .rename("n")
        .reset_index()
        .sort_values(["event_type", "bucket"], kind="stable")
    )
    n_checked = 0
    for etype, g in counts.groupby("event_type"):
        ns = g["n"].tolist()
        bks = g["bucket"].tolist()
        for i in range(len(ns)):
            trail = ns[max(0, i - 6) : i]
            row = got.loc[(etype, bks[i])]
            assert int(row["n_events"]) == ns[i]
            if trail:
                avg = sum(trail) / len(trail)
                assert row["trail_avg"] == pytest.approx(avg, abs=2e-6)
                want_burst = 1 if (len(trail) >= 3 and ns[i] > 3.0 * avg) else 0
                assert int(row["is_burst"]) == want_burst, (etype, bks[i])
            else:
                assert pd.isna(row["trail_avg"])
                assert int(row["is_burst"]) == 0
            n_checked += 1
    assert n_checked == len(got)


def test_join_point_in_time_matches_bruteforce(spark, sf_dir):
    got = CATALOG["join_point_in_time"].builder(spark, sf_dir).toPandas()
    ev = _pq(sf_dir, "events")
    ev = ev[ev.user_id.notna() & (ev.user_id % 10 == 0)]
    o = _pq(sf_dir, "orders")
    o = o[o.o_custkey.notna() & (o.o_custkey % 10 == 0) & o.o_orderdate.notna()]
    o = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="stable")
    chains: dict[int, list[tuple]] = {}
    for ck, g in o.groupby("o_custkey"):
        chains[int(ck)] = [
            (r.o_orderdate, i + 1, int(r.o_orderkey))
            for i, r in enumerate(g.itertuples())
        ]
    got_i = got.set_index("event_id")
    checked = 0
    for r in ev.itertuples():
        if pd.isna(r.event_id):
            continue
        row = got_i.loc[int(r.event_id)]
        if pd.isna(r.ts):
            assert pd.isna(row["version"]), r.event_id
            continue
        cands = [
            c for c in chains.get(int(r.user_id), []) if c[0] <= r.ts
        ]
        if not cands:
            assert pd.isna(row["version"]), r.event_id
        else:
            vf, ver, ok = max(cands)  # lexicographic (valid_from, version, orderkey)
            assert int(row["version"]) == ver, r.event_id
            assert int(row["orderkey"]) == ok, r.event_id
            assert row["valid_from"] == vf, r.event_id
        checked += 1
    assert checked == len(got)


def test_text_source_drift_matches_numpy_chi2(spark, sf_dir):
    got = (
        CATALOG["text_source_drift"].builder(spark, sf_dir).toPandas()
        .set_index("source")
    )
    docs = _pq(sf_dir, "documents")
    counts: dict[tuple, int] = {}
    for r in docs.itertuples():
        if r.text is None:
            continue
        for w in str(r.text).split(" "):
            if w:
                counts[(r.source, w)] = counts.get((r.source, w), 0) + 1
    glob: dict[str, int] = {}
    srctot: dict = {}
    for (s, w), c in counts.items():
        glob[w] = glob.get(w, 0) + c
        srctot[s] = srctot.get(s, 0) + c
    gt = sum(glob.values())
    for s, t in srctot.items():
        chi2_u = 0
        seen = 0
        for w, g in glob.items():
            c = counts.get((s, w), 0)
            exp = t * g / gt
            chi2_u += int(math.floor((c - exp) * (c - exp) / exp * 1e6 + 0.5))
            if c > 0:
                seen += 1
        assert int(got.loc[s, "n_tokens"]) == t, s
        assert int(got.loc[s, "vocab_seen"]) == seen, s
        assert int(got.loc[s, "vocab_total"]) == len(glob), s
        assert int(got.loc[s, "chi2_u"]) == chi2_u, s


def test_embed_outlier_census_matches_numpy(spark, sf_dir):
    got = (
        CATALOG["embed_outlier_census"].builder(spark, sf_dir).toPandas()
        .set_index("label")
    )
    emb = _pq(sf_dir, "embeddings")
    emb = emb[emb.embedding.notna()]
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(mat * 1e6 + 0.5)
    n = q.shape[0]
    mu = q.sum(axis=0) / n
    var = (q * q).sum(axis=0) / n - mu * mu
    sd = np.where(var > 0, np.sqrt(np.maximum(var, 0)), np.nan)
    z = np.abs((q - mu) / sd)           # NaN for zero-variance dims
    maxz = np.nanmax(z, axis=1)
    labels = emb["label"].to_numpy()
    for lab in np.unique(labels):
        m = maxz[labels == lab]
        assert int(got.loc[lab, "n_vectors"]) == len(m)
        assert int(got.loc[lab, "n_flagged"]) == int((m > 4.0).sum())
        assert int(got.loc[lab, "sum_maxz_u"]) == int(
            np.floor(m * 1e6 + 0.5).sum()
        )


def test_multitable_ann_dominates_single_table(spark, sf_dir):
    """Structural property: the two-table best-of pick can never be
    WORSE than the single-table pick for the same query (table 0 of
    the multitable probe IS sim_ann_lsh's hyperplane set)."""
    multi = (
        CATALOG["sim_ann_multitable"].builder(spark, sf_dir).toPandas()
        .set_index("query_id")
    )
    single = (
        CATALOG["sim_ann_lsh"].builder(spark, sf_dir).toPandas()
        .groupby("query_id")["cos_sim"].max()
    )
    common = multi.index.intersection(single.index)
    assert len(common) > 100
    diffs = multi.loc[common, "cos_sim"] - single.loc[common]
    assert (diffs >= -1e-9).all()
    # and the second table must genuinely add wins somewhere
    assert (multi["src_table"] == 1).any()
