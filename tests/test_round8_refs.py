"""Third-implementation references for the round-8 driver-window keys.

Same rationale as ``test_round7_growth`` / ``test_third_refs``: the
driver gate proves Spark == DuckDB; these recompute the same answers
with plain Python / pandas / numpy — code sharing NOTHING with either
engine formulation — so a both-engines-wrong-the-same-way bug in a
key that is about to earn its first driver evidence cannot hide
behind green parity rows.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from mapreducepy_spark.registry import load_catalog

CATALOG = load_catalog()


def _pq(sf_dir: str, table: str) -> pd.DataFrame:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pandas()


def _r2(x: float) -> float:
    return math.floor(x * 100.0 + 0.5) / 100.0


# --- merge_upsert vs a plain-Python latest-wins dict fold -------------


def test_merge_upsert_matches_python_fold(spark, sf_dir):
    got = CATALOG["merge_upsert"].builder(spark, sf_dir).toPandas()
    cust = _pq(sf_dir, "customer")
    orders = _pq(sf_dir, "orders")
    recs = []
    for t in cust.itertuples(index=False):
        recs.append(
            dict(key=t.c_custkey, is_change=0, ts=None, ck=None,
                 balance=t.c_acctbal, op="U", src="base", w=0)
        )
    for t in orders.itertuples(index=False):
        ts = None if pd.isna(t.o_orderdate) else t.o_orderdate
        recs.append(
            dict(key=None if pd.isna(t.o_custkey) else t.o_custkey,
                 is_change=1, ts=ts, ck=t.o_orderkey,
                 balance=None if pd.isna(t.o_totalprice)
                 else t.o_totalprice,
                 op="D" if t.o_orderkey % 13 == 0 else "U",
                 src="chg", w=1)
        )

    def sort_key(r):
        # (is_change DESC, ts DESC NULLS LAST, ck DESC NULLS LAST,
        #  balance DESC NULLS LAST, op ASC)
        return (
            -r["is_change"],
            (1, 0) if r["ts"] is None else (0, -r["ts"].timestamp()),
            (1, 0) if r["ck"] is None else (0, -r["ck"]),
            (1, 0.0) if r["balance"] is None else (0, -r["balance"]),
            r["op"],
        )

    state: dict = {}
    counts: dict = {}
    for r in recs:
        k = r["key"]
        counts[k] = counts.get(k, 0) + r["w"]
        if k not in state or sort_key(r) < sort_key(state[k]):
            state[k] = r
    want = {
        (str(k), str(_r2(v["balance"])) if v["balance"] is not None
         else None, v["src"], str(counts[k]))
        for k, v in state.items()
        if v["op"] != "D"
    }
    got_set = {
        (None if pd.isna(t.key) else str(t.key),
         None if pd.isna(t.balance) else str(t.balance),
         t.last_src, str(t.n_changes))
        for t in got.itertuples(index=False)
    }
    assert got_set == want


# --- scd2_intervals vs a pandas version chain --------------------------


def test_scd2_matches_pandas_versions(spark, sf_dir):
    got = CATALOG["scd2_intervals"].builder(spark, sf_dir).toPandas()
    o = _pq(sf_dir, "orders")
    keep = o[(o.o_custkey.fillna(0) % 10) == 0].copy()
    want_rows = []
    for ck, g in keep.groupby("o_custkey", dropna=False):
        # ASC NULLS LAST on (orderdate, orderkey)
        g = g.sort_values(
            ["o_orderdate", "o_orderkey"], na_position="last"
        ).reset_index(drop=True)
        nxt = list(g["o_orderdate"][1:]) + [None]
        for i, t in enumerate(g.itertuples(index=False)):
            vto = nxt[i]
            is_cur = 1 if (vto is None or pd.isna(vto)) else 0
            want_rows.append(
                (str(ck), str(i + 1),
                 None if pd.isna(t.o_orderdate) else str(t.o_orderdate),
                 None if (vto is None or pd.isna(vto)) else str(vto),
                 str(is_cur), str(t.o_orderkey), t.o_orderpriority,
                 str(_r2(t.o_totalprice))),
            )
    got_rows = {
        (str(t.custkey), str(t.version),
         None if pd.isna(t.valid_from) else str(t.valid_from),
         None if pd.isna(t.valid_to) else str(t.valid_to),
         str(t.is_current), str(t.orderkey), t.priority, str(t.price))
        for t in got.itertuples(index=False)
    }
    assert got_rows == set(want_rows)
    assert len(got_rows) == len(want_rows)  # versions are unique


# --- win_cum_distinct vs a plain-Python running-set scan ---------------


def test_cum_distinct_matches_python_sets(spark, sf_dir):
    got = CATALOG["win_cum_distinct"].builder(spark, sf_dir).toPandas()
    e = _pq(sf_dir, "events")

    def null_first(v):
        return (0, 0) if pd.isna(v) else (1, v)

    want = []
    for uid, g in e.groupby("user_id", dropna=False):
        rows = sorted(
            g.itertuples(index=False),
            key=lambda t: (
                null_first(t.ts),
                null_first(t.event_id),
                null_first(t.event_type),
                null_first(t.value),
            ),
        )
        seen: set = set()
        for t in rows:
            seen.add(t.event_type if not pd.isna(t.event_type) else None)
            want.append((str(t.event_id), str(uid), len(seen)))
    got_rows = sorted(
        (str(t.event_id), str(t.user_id), int(t.n_types_seen))
        for t in got.itertuples(index=False)
    )
    assert got_rows == sorted(want)


# --- events_peak_concurrency vs a brute-force sweep ---------------------


def test_peak_concurrency_matches_bruteforce(spark, sf_dir):
    got = (
        CATALOG["events_peak_concurrency"]
        .builder(spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    e = _pq(sf_dir, "events")
    e = e[e.ts.notna() & e.event_type.notna()]
    horizon = pd.Timedelta(minutes=10)
    for typ, g in e.groupby("event_type"):
        starts = list(g["ts"])
        cands = sorted({t for t in starts} | {t + horizon for t in starts})
        best_c, best_t = -1, None
        for t in cands:
            # half-open [ts, ts+10min): active iff ts <= t < ts+10min
            c = sum(1 for s in starts if s <= t < s + horizon)
            if c > best_c:
                best_c, best_t = c, t
        assert int(got.loc[typ, "peak_concurrency"]) == best_c, typ
        assert got.loc[typ, "peak_ts"] == best_t, typ
    assert set(got.index) == set(e["event_type"].unique())


# --- shipment-graph pair: degree histogram + BFS -----------------------


def _edges(sf_dir: str) -> set[tuple[int, int]]:
    from mapreducepy_spark.operators.graph import _PR_END, _PR_START

    li = _pq(sf_dir, "lineitem")
    li = li[
        (li.l_shipdate >= pd.Timestamp(f"{_PR_START} 00:00:00"))
        & (li.l_shipdate < pd.Timestamp(f"{_PR_END} 00:00:00"))
    ]
    ps = {
        (int(p) * 2, int(s) * 2 + 1)
        for p, s in zip(li.l_partkey, li.l_suppkey)
        if not (pd.isna(p) or pd.isna(s))
    }
    return ps | {(b, a) for a, b in ps}


def test_degree_stats_matches_python_dict(spark, sf_dir):
    got = CATALOG["graph_degree_stats"].builder(spark, sf_dir).toPandas()
    deg: dict[int, int] = {}
    for src, _ in _edges(sf_dir):
        deg[src] = deg.get(src, 0) + 1
    hist: dict[tuple[str, int], int] = {}
    for node, d in deg.items():
        side = "part" if node % 2 == 0 else "supplier"
        hist[(side, d)] = hist.get((side, d), 0) + 1
    got_rows = {
        (t.side, int(t.degree), int(t.n_nodes))
        for t in got.itertuples(index=False)
    }
    assert got_rows == {(s, d, n) for (s, d), n in hist.items()}


def test_reachability_matches_python_bfs(spark, sf_dir):
    from mapreducepy_spark.operators.graph import _REACH_SEED_MOD

    got = (
        CATALOG["graph_reachability"]
        .builder(spark, sf_dir)
        .toPandas()
        .set_index("hop")
    )
    edges = _edges(sf_dir)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    l0 = {
        a for a in adj
        if a % 2 == 1 and (a // 2) % _REACH_SEED_MOD == 0
    }
    l1 = set().union(*(adj[n] for n in l0)) - l0 if l0 else set()
    l2 = (
        set().union(*(adj[n] for n in l1)) - l0 - l1 if l1 else set()
    )
    for hop, s in ((0, l0), (1, l1), (2, l2)):
        assert int(got.loc[hop, "n_nodes"]) == len(s), hop
        assert int(got.loc[hop, "sum_node"]) == sum(s), hop


# --- sample_group_reservoir vs hashlib ranking --------------------------


def test_group_reservoir_matches_hashlib(spark, sf_dir):
    got = CATALOG["sample_group_reservoir"].builder(spark, sf_dir).toPandas()
    docs = _pq(sf_dir, "documents")
    docs = docs[docs.doc_id.notna()]
    want = []
    for (lang, src), g in docs.groupby(
        ["lang", "source"], dropna=False
    ):
        ranked = sorted(
            (hashlib.md5(str(int(d)).encode()).hexdigest(), int(d))
            for d in g["doc_id"]
        )
        for i, (_, d) in enumerate(ranked[:3], start=1):
            want.append((str(lang), str(src), d, i))
    got_rows = {
        (str(t.lang), str(t.source), int(t.doc_id), int(t.pick))
        for t in got.itertuples(index=False)
    }
    assert got_rows == set(want)


# --- embed_pq_codes vs a numpy PQ encoder -------------------------------


def test_pq_codes_matches_numpy(spark, sf_dir):
    from mapreducepy_spark.llm.embedstats import _DIM, _PQ_K, _PQ_M, _PQ_SUB

    got = CATALOG["embed_pq_codes"].builder(spark, sf_dir).toPandas()
    emb = _pq(sf_dir, "embeddings")
    ok = emb[emb.embedding.map(
        lambda a: a is not None and len(a) == _DIM
    )]
    ids = ok["vec_id"].to_numpy(np.int64)
    X = np.stack(ok["embedding"].to_list()).astype(np.float64)
    Q = np.floor(X * 1e6 + 0.5).astype(np.int64)
    agg: dict[tuple[int, int], list[int]] = {}
    cb = {  # codeword cw of subspace s = quantized subvector
        (s, int(cw)): Q[ids == cw][0][s * _PQ_SUB:(s + 1) * _PQ_SUB]
        for s in range(_PQ_M) for cw in range(_PQ_K) if (ids == cw).any()
    }
    for row in Q:
        for s in range(_PQ_M):
            v = row[s * _PQ_SUB:(s + 1) * _PQ_SUB]
            best = min(
                (int(((v - c) ** 2).sum()), cw)
                for (ss, cw), c in cb.items() if ss == s
            )
            key = (s, best[1])
            cur = agg.setdefault(key, [0, 0])
            cur[0] += 1
            cur[1] += best[0]
    got_rows = {
        (int(t.s), int(t.codeword), int(t.n_assigned), int(t.sum_err_u2))
        for t in got.itertuples(index=False)
    }
    assert got_rows == {
        (s, cw, n, err) for (s, cw), (n, err) in agg.items()
    }


# --- embed_top_eigen vs numpy.linalg.eigh -------------------------------


def test_top_eigen_matches_numpy_eigh(spark, sf_dir):
    """TRUE independence: not a re-run of the power iteration, but a
    dense eigendecomposition of the same integer covariance matrix.
    With _EIG_ITERS=64 the card must point at the genuine top
    eigenvector (cos > 0.99) and estimate its eigenvalue to 0.1% —
    the property the docstring sells. (At the previous 3 iterations
    the measured cos was 0.45: an unconverged card, caught by writing
    exactly this test.)"""
    from mapreducepy_spark.llm.embedstats import _DIM, _EIG_C_SCALE

    got = (
        CATALOG["embed_top_eigen"]
        .builder(spark, sf_dir)
        .toPandas()
        .sort_values("dim")
    )
    emb = _pq(sf_dir, "embeddings")
    ok = emb[
        emb.embedding.map(lambda a: a is not None and len(a) == _DIM)
        & emb.vec_id.notna()
    ]
    Q = np.floor(
        np.stack(ok["embedding"].to_list()).astype(np.float64) * 1e6 + 0.5
    )
    n = len(Q)
    s = Q.sum(axis=0)
    cov = (Q.T @ Q / n - np.outer(s / n, s / n)) / 1e12
    C = np.floor(cov * _EIG_C_SCALE + 0.5)
    w, V = np.linalg.eigh(C)
    top_vec, top_lam = V[:, -1], w[-1]
    v = got["v_scaled"].to_numpy(np.float64)
    cos = abs(v @ top_vec) / (np.linalg.norm(v) * np.linalg.norm(top_vec))
    assert cos > 0.99, cos
    # lam_scaled ≈ λ_C · 1e6 (the eigenvector's pinned L∞ scale)
    lam = got["lam_scaled"].iloc[0] / 1e6
    assert lam == pytest.approx(top_lam, rel=1e-3)


# --- the as-of pair vs plain-Python scans --------------------------------


def test_asof_backward_matches_bruteforce(spark, sf_dir):
    got = (
        CATALOG["join_asof"].builder(spark, sf_dir).toPandas()
    )
    e = _pq(sf_dir, "events")
    o = _pq(sf_dir, "orders")
    o = o[o.o_custkey.notna() & o.o_orderdate.notna()]
    by_user: dict = {
        u: list(zip(g.o_orderdate, g.o_orderkey))
        for u, g in o.groupby("o_custkey")
    }
    want = {}
    for t in e.itertuples(index=False):
        pick = None
        if not pd.isna(t.ts):
            cands = [
                (d, k) for d, k in by_user.get(t.user_id, [])
                if d <= t.ts
            ]
            if cands:
                pick = max(cands)  # latest date, then largest key
        want[str(t.event_id)] = (
            None if pick is None else (str(pick[1]), str(pick[0]))
        )
    for t in got.itertuples(index=False):
        w = want[str(t.event_id)]
        if w is None:
            assert pd.isna(t.o_orderkey), t
        else:
            assert (str(int(t.o_orderkey)), str(t.o_orderdate)) == w, t
    assert len(got) == len(e)


def test_asof_forward_matches_bruteforce(spark, sf_dir):
    got = CATALOG["join_asof_forward"].builder(spark, sf_dir).toPandas()
    e = _pq(sf_dir, "events")
    o = _pq(sf_dir, "orders")
    o = o[o.o_custkey.notna() & o.o_orderdate.notna()]
    by_user: dict = {
        u: list(zip(g.o_orderdate, g.o_orderkey))
        for u, g in o.groupby("o_custkey")
    }
    want = {}
    for t in e.itertuples(index=False):
        pick = None
        if not pd.isna(t.ts):
            cands = [
                (d, k) for d, k in by_user.get(t.user_id, [])
                if d >= t.ts
            ]
            if cands:
                pick = min(cands)  # earliest date, then smallest key
        want[str(t.event_id)] = (
            None if pick is None else (str(pick[1]), str(pick[0]))
        )
    for t in got.itertuples(index=False):
        w = want[str(t.event_id)]
        if w is None:
            assert pd.isna(t.o_orderkey), t
        else:
            assert (str(int(t.o_orderkey)), str(t.o_orderdate)) == w, t
    assert len(got) == len(e)


# --- agg_moments vs numpy moment formulas -------------------------------


def test_moments_match_numpy(spark, sf_dir):
    got = (
        CATALOG["agg_moments"]
        .builder(spark, sf_dir)
        .toPandas()
        .set_index("l_returnflag")
    )
    li = _pq(sf_dir, "lineitem")
    li = li[li.l_discount.notna()]
    for flag, g in li.groupby("l_returnflag"):
        q = np.floor(g["l_discount"].to_numpy(np.float64) * 100 + 0.5)
        mu, m2 = q.mean(), ((q - q.mean()) ** 2).mean()
        m3 = ((q - q.mean()) ** 3).mean()
        m4 = ((q - q.mean()) ** 4).mean()
        assert int(got.loc[flag, "n"]) == len(q)
        assert got.loc[flag, "mean_disc"] == pytest.approx(
            mu / 100, abs=2e-6
        )
        assert got.loc[flag, "m2_centi"] == pytest.approx(m2, abs=2e-6)
        if m2 > 0:
            assert got.loc[flag, "skewness"] == pytest.approx(
                m3 / m2**1.5, abs=1e-4
            )
            assert got.loc[flag, "excess_kurtosis"] == pytest.approx(
                m4 / m2**2 - 3, abs=1e-4
            )


# --- physical-order invariance of ROWS-frame windows ---------------------


@pytest.mark.parametrize(
    "key",
    [
        "win_rolling_median",
        "win_cum_distinct",
        "win_ema",
        "win_lead_lag",
        "win_streak",
        "events_ohlc",
        "win_range_frame",
        "events_dau_rolling",
    ],
)
def test_rows_frame_windows_are_physical_order_invariant(
    spark, tmp_path, key
):
    """ADVICE r7 reproduced and pinned; VERDICT r8 work order #5 made
    the guard structural: with duplicate (ts, event_id) rows, a ROWS
    frame decides order-ties by PHYSICAL row order unless the window
    ORDER BY is total — reversing the duplicate rows (and scattering
    input partitions) must not change any output row. Covers every
    events-table key whose frame is ROWS (or whose first/last pick is
    tie-sensitive) over the non-unique (ts, event_id) ordering."""
    import pandas as pd

    from mapreducepy_spark.registry import load_catalog

    rows = [
        (0, "2024-01-01 10:00:00", 1, "view", 10.0, None),
        (99, "2024-03-03 10:00:00", 6, "view", None, None),
        (99, "2024-03-03 10:00:00", 6, "view", 7.5, "{}"),
        (99, "2024-03-03 10:00:00", 6, "click", 2.0, None),
        (100, "2024-03-03 10:05:00", 6, "view", 1.0, None),
    ]
    outs = []
    for order in ([0, 1, 2, 3, 4], [4, 3, 2, 1, 0]):
        ev = pd.DataFrame(
            [rows[i] for i in order],
            columns=[
                "event_id", "ts", "user_id", "event_type", "value",
                "props",
            ],
        )
        ev["event_id"] = ev["event_id"].astype("Int64")
        ev["ts"] = pd.to_datetime(ev["ts"]).astype("datetime64[us]")
        d = tmp_path / f"{key}_{order[0]}"
        d.mkdir()
        ev.to_parquet(d / "events.parquet", index=False)
        df = load_catalog()[key].builder(spark, str(d))
        # scatter the physical layout on top of the file order
        pdf = (
            df.repartition(7)
            .toPandas()
            .astype(str)
            .sort_values(list(df.columns))
            .reset_index(drop=True)
        )
        outs.append(pdf)
    pd.testing.assert_frame_equal(outs[0], outs[1])


@pytest.mark.parametrize("key", ["win_running", "win_first_last"])
def test_orders_rows_frame_windows_are_physical_order_invariant(
    spark, tmp_path, key
):
    """The orders-table half of the ROWS-frame invariance pin: a
    physically DUPLICATED order row (same orderkey — the replayed-
    ingest reality) plus same-(custkey, orderdate) rows with distinct
    orderkeys, reversed and scattered across partitions, must leave
    running sums / first-last picks unchanged — the (orderdate,
    orderkey) window order plus identical duplicate rows make the
    output multiset order-free."""
    import pandas as pd

    from mapreducepy_spark.registry import load_catalog

    rows = [
        (1, 10, "O", 100.0, "2024-01-01 00:00:00", "1-URGENT"),
        (2, 10, "O", 50.0, "2024-01-01 00:00:00", "1-URGENT"),
        (2, 10, "O", 50.0, "2024-01-01 00:00:00", "1-URGENT"),
        (3, 10, "F", 25.0, "2024-01-02 00:00:00", "2-HIGH"),
        (4, 11, "F", 75.0, "2024-01-01 00:00:00", "2-HIGH"),
    ]
    outs = []
    for order in ([0, 1, 2, 3, 4], [4, 3, 2, 1, 0]):
        o = pd.DataFrame(
            [rows[i] for i in order],
            columns=[
                "o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderdate", "o_orderpriority",
            ],
        )
        o["o_orderdate"] = pd.to_datetime(o["o_orderdate"]).astype(
            "datetime64[us]"
        )
        d = tmp_path / f"{key}_{order[0]}"
        d.mkdir()
        o.to_parquet(d / "orders.parquet", index=False)
        df = load_catalog()[key].builder(spark, str(d))
        pdf = (
            df.repartition(7)
            .toPandas()
            .astype(str)
            .sort_values(list(df.columns))
            .reset_index(drop=True)
        )
        outs.append(pdf)
    pd.testing.assert_frame_equal(outs[0], outs[1])
