"""Third-implementation references for the round-9 growth keys: each
kernel is recomputed in plain numpy/pandas/python from the raw
parquet, independent of BOTH engines. Two-engine parity can agree on
a shared misreading of the spec (the round-8 eigen lesson); a third
implementation pins the intended math.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from mapreducepy_spark.registry import load_catalog

CATALOG = load_catalog()


def _pq(sf_dir: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def test_js_divergence_matches_numpy(spark, sf_dir):
    got = (
        CATALOG["text_js_divergence"]
        .builder(spark, sf_dir)
        .toPandas()
        .set_index("source")
    )
    docs = _pq(sf_dir, "documents")
    toks = []
    for _, r in docs.iterrows():
        if r["text"] is None:
            continue
        for w in str(r["text"]).split(" "):
            if w:
                toks.append((r["source"], w))
    tf = pd.DataFrame(toks, columns=["source", "word"])
    global_counts = tf.groupby("word").size()
    T = global_counts.sum()
    for src, g in tf.groupby("source"):
        cnt = g.groupby("word").size()
        N = cnt.sum()
        p = cnt / N
        q = global_counts.loc[p.index] / T
        m = (p + q) / 2
        kl_p = float((p * np.log(p / m)).sum())
        kl_q_in = float((q * np.log(q / m)).sum())
        js = 0.5 * (kl_p + kl_q_in + math.log(2) * (1 - float(q.sum())))
        assert int(got.loc[src, "n_tokens"]) == int(N)
        assert got.loc[src, "js_div"] == pytest.approx(js, abs=2e-6), src
        assert got.loc[src, "q_mass"] == pytest.approx(
            float(q.sum()), abs=2e-6
        ), src
        # JS over ln is bounded by ln 2
        assert -1e-9 <= got.loc[src, "js_div"] <= math.log(2) + 1e-9


def test_markov_entropy_matches_python(spark, sf_dir):
    got = (
        CATALOG["events_markov_entropy"]
        .builder(spark, sf_dir)
        .toPandas()
        .set_index("from_type")
    )
    ev = _pq(sf_dir, "events")
    ev = ev.sort_values(
        ["user_id", "ts", "event_id"], na_position="first", kind="stable"
    )
    trans: dict[tuple, int] = {}
    for _, g in ev.groupby("user_id"):
        types = g["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            if b is not None:
                trans[(a, b)] = trans.get((a, b), 0) + 1
    rows: dict[str, dict[str, int]] = {}
    for (a, b), n in trans.items():
        rows.setdefault(a, {})[b] = n
    for a, outs in rows.items():
        n_out = sum(outs.values())
        ent = -sum(
            (n / n_out) * math.log(n / n_out) for n in outs.values()
        )
        top = sorted(outs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert int(got.loc[a, "n_out"]) == n_out, a
        assert int(got.loc[a, "n_next_types"]) == len(outs), a
        assert got.loc[a, "top_next"] == top[0], a
        assert got.loc[a, "top_prob"] == pytest.approx(
            top[1] / n_out, abs=2e-6
        ), a
        assert got.loc[a, "entropy"] == pytest.approx(ent, abs=2e-6), a


def test_quantile_bound_exact_median_matches_numpy(spark, sf_dir):
    got = (
        CATALOG["agg_approx_quantile_bound"]
        .builder(spark, sf_dir)
        .toPandas()
        .set_index("l_returnflag")
    )
    li = _pq(sf_dir, "lineitem")
    li = li[li.l_extendedprice.notna()]
    for flag, g in li.groupby("l_returnflag"):
        v = np.sort(g["l_extendedprice"].to_numpy(np.float64))
        n = len(v)
        mid = math.ceil(0.5 * n)  # lower-median discrete rank (1-based)
        assert int(got.loc[flag, "n_rows"]) == n
        assert got.loc[flag, "exact_p50"] == pytest.approx(
            v[mid - 1], abs=2e-6
        ), flag
        assert bool(got.loc[flag, "within_bound"]) is True, flag


def test_centroid_drift_matches_numpy(spark, sf_dir):
    got = (
        CATALOG["embed_centroid_drift"]
        .builder(spark, sf_dir)
        .toPandas()
        .set_index("label")
    )
    emb = _pq(sf_dir, "embeddings")
    emb = emb[emb.embedding.notna()]
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    assert mat.shape[1] == 64
    q = np.floor(mat * 1e6 + 0.5)
    labels = emb["label"].to_numpy()
    mu_g = q.mean(axis=0)
    for lab in np.unique(labels):
        sub = q[labels == lab]
        gap = sub.mean(axis=0) - mu_g
        drift = math.sqrt(float((gap * gap).sum())) / 1e6
        j = int(np.lexsort((np.arange(64), -np.abs(gap)))[0])
        assert int(got.loc[lab, "n_vectors"]) == len(sub)
        assert got.loc[lab, "drift"] == pytest.approx(drift, abs=2e-6)
        assert int(got.loc[lab, "max_gap_dim"]) == j + 1
        assert got.loc[lab, "max_gap"] == pytest.approx(
            float(abs(gap[j])) / 1e6, abs=2e-6
        )


def test_cluster_histogram_conserves_docs(spark, sf_dir):
    hist = CATALOG["dedup_cluster_histogram"].builder(spark, sf_dir).toPandas()
    docs = _pq(sf_dir, "documents")
    assert int(hist["n_docs"].sum()) == int(docs["doc_id"].notna().sum())
    assert (
        hist["n_docs"] == hist["cluster_size"] * hist["n_clusters"]
    ).all()
    # CC clusters are >= 2 docs; exactly one synthesized singleton row
    assert (hist["cluster_size"] == 1).sum() == 1


def test_minhash_recall_is_consistent_with_funnel(spark, sf_dir):
    rec = CATALOG["dedup_minhash_recall"].builder(spark, sf_dir).toPandas()
    true_pairs = CATALOG["dedup_ngram_jaccard"].builder(spark, sf_dir).toPandas()
    assert int(rec["n_true"].sum()) == len(true_pairs)
    assert (rec["n_caught"] <= rec["n_true"]).all()
    assert ((rec["recall"] >= 0) & (rec["recall"] <= 1)).all()
    # every caught pair must actually be an LSH candidate
    cand = CATALOG["dedup_near"].builder(spark, sf_dir).toPandas()
    cand_set = set(zip(cand["doc_a"], cand["doc_b"]))
    tp = set(zip(true_pairs["doc_a"], true_pairs["doc_b"]))
    assert int(rec["n_caught"].sum()) == len(tp & cand_set)


def test_asof_tolerance_consistent_with_asof(spark, sf_dir):
    from mapreducepy_spark.operators.joins import _ASOF_TOL_US

    base = (
        CATALOG["join_asof"].builder(spark, sf_dir).toPandas()
        .sort_values(["event_id", "user_id"]).reset_index(drop=True)
    )
    tol = (
        CATALOG["join_asof_tolerance"].builder(spark, sf_dir).toPandas()
        .sort_values(["event_id", "user_id"]).reset_index(drop=True)
    )
    assert len(base) == len(tol)
    lag_us = (
        base["ts"].astype("int64") // 1000 * 1000
        - base["o_orderdate"].astype("int64") // 1000 * 1000
    ) // 1000  # ns -> us on the µs-aligned fixture
    fresh = (
        base["o_orderdate"].notna()
        & base["ts"].notna()
        & (lag_us <= _ASOF_TOL_US)
    )
    assert (tol["o_orderkey"].notna() == fresh).all()
    matched = tol[tol["o_orderkey"].notna()]
    base_m = base[fresh]
    assert (
        matched["o_orderkey"].to_numpy() == base_m["o_orderkey"].to_numpy()
    ).all()


def test_fn_interval_matches_python_calendar(spark, sf_dir):
    import calendar
    import datetime as dt

    got = (
        CATALOG["fn_interval"].builder(spark, sf_dir).toPandas()
        .set_index("o_orderkey")
    )
    orders = _pq(sf_dir, "orders")
    sample = orders.dropna(subset=["o_orderdate"]).head(500)
    for _, r in sample.iterrows():
        d = r["o_orderdate"].date()
        k = r["o_orderkey"]
        # clamped month addition
        m = d.month - 1 + 3
        y, m = d.year + m // 12, m % 12 + 1
        day = min(d.day, calendar.monthrange(y, m)[1])
        assert got.loc[k, "plus_3_months"] == str(dt.date(y, m, day))
        assert got.loc[k, "month_end"] == str(
            dt.date(d.year, d.month, calendar.monthrange(d.year, d.month)[1])
        )
        assert int(got.loc[k, "qtr"]) == (d.month - 1) // 3 + 1
        assert got.loc[k, "qtr_start"] == str(
            dt.date(d.year, ((d.month - 1) // 3) * 3 + 1, 1)
        )
        assert int(got.loc[k, "iso_week"]) == d.isocalendar()[1]
        assert int(got.loc[k, "dow"]) == d.isoweekday() % 7 + 1


def test_zorder_matches_python_morton(spark, sf_dir):
    got = (
        CATALOG["scan_zorder_stats"]
        .builder(spark, sf_dir)
        .toPandas()
        .set_index("z_bucket")
    )
    orders = _pq(sf_dir, "orders")
    orders = orders.dropna(subset=["o_custkey", "o_orderdate"])
    epoch = pd.Timestamp("1995-01-01")
    cust8 = (orders["o_custkey"].abs() % 256).astype(int)
    day8 = (((orders["o_orderdate"] - epoch).dt.days).abs() % 256).astype(int)

    def morton(a: int, b: int) -> int:
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    z = pd.Series(
        [morton(a, b) for a, b in zip(cust8, day8)], index=cust8.index
    )
    df = pd.DataFrame({"bucket": z // 1024, "c": cust8, "d": day8})
    for bucket, g in df.groupby("bucket"):
        assert int(got.loc[bucket, "n_rows"]) == len(g)
        assert int(got.loc[bucket, "cust_span"]) == int(g["c"].max() - g["c"].min())
        assert int(got.loc[bucket, "day_span"]) == int(g["d"].max() - g["d"].min())
    # THE z-order property: every bucket bounds BOTH axes to a
    # fraction of the 0-255 domain (top-10 z bits fixed -> each axis
    # has its top 5 bits fixed -> span < 2^3 * consecutive-range = 8...
    # buckets of 1024 codes span at most 32 values per axis)
    assert (got["cust_span"] <= 32).all()
    assert (got["day_span"] <= 32).all()


def test_zorder_sign_stable_on_negative_keys_and_preepoch_dates(
    spark, tmp_path
):
    """Adversarial: a negative custkey and a pre-epoch order date must
    interleave identically on both engines — DuckDB's // is floor
    division, Spark's div truncates toward zero, so only the abs()'d
    non-negative operands are engine-stable (ADVICE r8 class)."""
    import duckdb

    rows = [
        (-7, "1990-06-15"),   # pre-epoch AND negative key
        (-300, "1996-03-03"),
        (5, "1994-12-31"),    # one day pre-epoch
        (123, "1997-07-07"),
    ]
    o = pd.DataFrame(rows, columns=["o_custkey", "o_orderdate"])
    o["o_orderkey"] = range(1, len(o) + 1)
    o["o_orderstatus"] = "O"
    o["o_totalprice"] = 1.0
    o["o_orderpriority"] = "1-URGENT"
    o["o_orderdate"] = pd.to_datetime(o["o_orderdate"]).astype(
        "datetime64[us]"
    )
    d = tmp_path / "zneg"
    d.mkdir()
    o.to_parquet(d / "orders.parquet", index=False)
    spd = CATALOG["scan_zorder_stats"].builder(spark, str(d)).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{d}/orders.parquet')"
    )
    dpd = con.execute(CATALOG["scan_zorder_stats"].oracle).fetchdf()
    from .parity_util import canon_frame

    assert canon_frame(spd) == canon_frame(dpd)
