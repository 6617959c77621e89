"""Independent references for the round-7 growth kernels.

The driver gate proves Spark == DuckDB; these tests prove the shared
algebra is also RIGHT, by checking each kernel against a third
implementation (numpy / pandas / plain Python) that shares no code
with either engine formulation. A both-engines-wrong-the-same-way bug
cannot survive this file.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from mapreducepy_spark.registry import load_catalog

CATALOG = load_catalog()


def _pq(sf_dir: str, table: str) -> pd.DataFrame:
    return pq.read_table(f"{sf_dir}/{table}.parquet").to_pandas()


# --- the type-7 interpolation algebra, hammered by hypothesis --------


def _type7(values: list[float], p: float) -> float:
    """The exact formula both engines run in agg_quantile_cont /
    win_rolling_median, re-stated in plain Python."""
    v = sorted(values)
    n = len(v)
    h = (n - 1) * p + 1.0
    lo_i = math.floor(h)
    lo = v[lo_i - 1]
    hi = v[lo_i] if lo_i < n else lo
    return lo + (h - math.floor(h)) * (hi - lo)


def test_type7_formula_matches_numpy_linear():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.floats(
                min_value=0.01, max_value=1e6, allow_nan=False
            ).map(lambda x: round(x, 2)),
            min_size=1,
            max_size=40,
        ),
        st.sampled_from([0.5, 0.95, 0.25, 0.9]),
    )
    def hammer(values, p):
        ours = _type7(values, p)
        ref = float(np.percentile(np.array(values), p * 100.0))
        assert ours == pytest.approx(ref, rel=1e-12, abs=1e-9)

    hammer()


def test_quantile_cont_builder_matches_numpy(spark, sf_dir):
    got = (
        CATALOG["agg_quantile_cont"]
        .builder(spark, sf_dir)
        .toPandas()
        .set_index("l_returnflag")
        .sort_index()
    )
    li = _pq(sf_dir, "lineitem")[["l_returnflag", "l_extendedprice"]].dropna()
    for flag, grp in li.groupby("l_returnflag"):
        for col, p in (("p50_price", 50), ("p95_price", 95)):
            ref = float(np.percentile(grp["l_extendedprice"].values, p))
            ref = math.floor(ref * 1e6 + 0.5) / 1e6
            assert got.loc[flag, col] == pytest.approx(ref, abs=2e-6), (
                flag,
                col,
            )


# --- rolling median vs pandas ----------------------------------------


def test_rolling_median_builder_matches_pandas(spark, sf_dir):
    got = (
        CATALOG["win_rolling_median"]
        .builder(spark, sf_dir)
        .toPandas()
        .set_index("event_id")["med7"]
    )
    e = _pq(sf_dir, "events").sort_values(["user_id", "ts", "event_id"])
    ref = (
        e.groupby("user_id")["value"]
        .rolling(7, min_periods=1)
        .median()
        .reset_index(drop=True)
    )
    ref.index = e["event_id"].values
    assert len(got) == len(ref)
    for eid in got.index:
        want = math.floor(ref.loc[eid] * 1e6 + 0.5) / 1e6
        assert got.loc[eid] == pytest.approx(want, abs=2e-6), eid


# --- interval overlap vs plain-Python brute force --------------------


def test_interval_overlap_builder_matches_bruteforce(spark, sf_dir):
    got = (
        CATALOG["join_interval_overlap"]
        .builder(spark, sf_dir)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    e = _pq(sf_dir, "events")
    # pandas 2.x preserves the parquet unit (datetime64[us] here) —
    # normalize explicitly instead of assuming ns
    us = e["ts"].astype("datetime64[us]").astype("int64")
    e = e.assign(s=us, dur=(e["value"] * 60_000_000.0).apply(math.floor))
    e = e.assign(t_end=e["s"] + e["dur"].astype("int64"))
    agg: dict = {}
    a = e[e.event_type == "view"]
    b = e[e.event_type == "purchase"]
    for uid, ga in a.groupby("user_id"):
        gb = b[b.user_id == uid]
        ovs = [
            min(ae, be) - max(as_, bs)
            for as_, ae in zip(ga["s"], ga["t_end"])
            for bs, be in zip(gb["s"], gb["t_end"])
            if as_ < be and bs < ae
        ]
        if ovs:
            agg[uid] = (len(ovs), sum(ovs), max(ovs))
    assert set(got.index) == set(agg)
    for uid, (n, tot, mx) in agg.items():
        assert got.loc[uid, "n_pairs"] == n
        assert got.loc[uid, "overlap_sec"] == pytest.approx(
            math.floor(tot / 1e6 * 100 + 0.5) / 100, abs=1e-9
        )
        assert got.loc[uid, "max_overlap_sec"] == pytest.approx(
            math.floor(mx / 1e6 * 100 + 0.5) / 100, abs=1e-9
        )


# --- nearest as-of vs plain-Python scan -------------------------------


def test_asof_nearest_builder_matches_bruteforce(spark, sf_dir):
    got = (
        CATALOG["join_asof_nearest"]
        .builder(spark, sf_dir)
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    e = _pq(sf_dir, "events")
    o = _pq(sf_dir, "orders").dropna(subset=["o_custkey", "o_orderdate"])
    o = o.assign(
        us=o["o_orderdate"].astype("datetime64[us]").astype("int64")
    )
    by_user = {u: g for u, g in o.groupby("o_custkey")}
    e = e.assign(ets=e["ts"].astype("datetime64[us]").astype("int64"))
    for _, row in e.iterrows():
        eid, uid = row["event_id"], row["user_id"]
        ets = int(row["ets"])
        g = by_user.get(uid)
        if g is None or not len(g):
            assert pd.isna(got.loc[eid, "o_orderkey"]), eid
            continue
        # min |diff|; tie: backward side, then largest key backward /
        # smallest key forward — exactly the registered pick rules
        best = min(
            (
                (
                    abs(ets - us),
                    0 if us <= ets else 1,
                    -key if us <= ets else key,
                ),
                key,
            )
            for key, us in zip(g["o_orderkey"], g["us"])
        )
        assert got.loc[eid, "o_orderkey"] == best[1], eid
        assert got.loc[eid, "diff_us"] == best[0][0], eid


# --- calendar gap fill vs pandas reference ----------------------------


def test_gap_fill_builder_matches_pandas(spark, sf_dir):
    got = CATALOG["events_gap_fill"].builder(spark, sf_dir).toPandas()
    e = _pq(sf_dir, "events")
    daily = (
        e.assign(d=e["ts"].dt.normalize())
        .groupby(["user_id", "d"])
        .size()
        .rename("n")
        .reset_index()
    )
    rows = []
    for uid, g in daily.groupby("user_id"):
        lookup = dict(zip(g["d"], g["n"]))
        for d in pd.date_range(g["d"].min(), g["d"].max(), freq="D"):
            rows.append((uid, d.strftime("%Y-%m-%d"), lookup.get(d, 0)))
    ref = pd.DataFrame(rows, columns=["user_id", "day", "n_events"])
    g = got.sort_values(["user_id", "day"]).reset_index(drop=True)
    r = ref.sort_values(["user_id", "day"]).reset_index(drop=True)
    assert len(g) == len(r)
    assert (g["user_id"] == r["user_id"]).all()
    assert (g["day"] == r["day"]).all()
    assert (g["n_events"].astype(int) == r["n_events"].astype(int)).all()


# --- MRL energy ratios vs numpy ---------------------------------------


def test_mrl_error_builder_matches_numpy(spark, sf_dir):
    got = (
        CATALOG["embed_mrl_error"]
        .builder(spark, sf_dir)
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    emb = _pq(sf_dir, "embeddings")["embedding"]
    mats = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
    eng = np.floor(mats * mats * 1e6 + 0.5).astype(np.int64)
    total = eng.sum(axis=1)
    keep_mask = total > 0
    eng, total = eng[keep_mask], total[keep_mask]
    for k in (8, 16, 32):
        keep_u = np.floor(
            eng[:, :k].sum(axis=1).astype(np.float64)
            / total.astype(np.float64)
            * 1e6
            + 0.5
        ).astype(np.int64)
        assert got.loc[k, "n_vecs"] == len(keep_u)
        assert got.loc[k, "avg_keep"] == pytest.approx(
            math.floor(keep_u.sum() / len(keep_u) + 0.5) / 1e6, abs=2e-6
        )
        assert got.loc[k, "min_keep"] == pytest.approx(
            keep_u.min() / 1e6, abs=1e-9
        )
        assert got.loc[k, "n_below_90"] == int((keep_u < 900_000).sum())
