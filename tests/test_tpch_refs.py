"""Third-implementation references for the three most intricate
TPC-H pipelines (Q2 argmin-over-multi-join, Q8 conditional market
share, Q9 profit rollup) — pandas merges + exact integer cents, the
same discipline as the other ref files. These keys already carry
oracle parity and the adversarial TPC-H sweep; the pandas refs add
an engine-independent recomputation of the full relational chain.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pytest

from mapreducepy_spark.registry import load_catalog

CATALOG = load_catalog()


def _pq(sf_dir: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def _r(x: float, d: int) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


def _cents(x: float) -> int:
    return math.floor(x * 100.0 + 0.5)


def test_join_min_cost_supplier_matches_pandas(spark, sf_dir):
    """Q2: cheapest EUROPE supplier per part, argmin over the
    decorrelated (part, supplier) min-unit-cost table."""
    su = _pq(sf_dir, "supplier")
    na = _pq(sf_dir, "nation")
    re_ = _pq(sf_dir, "region")
    eu_regions = set(re_[re_.r_name == "EUROPE"].r_regionkey)
    eu_nations = set(na[na.n_regionkey.isin(eu_regions)].n_nationkey)
    eu_supp = set(su[su.s_nationkey.isin(eu_nations)].s_suppkey.astype(int))
    li = _pq(sf_dir, "lineitem")
    li = li[(li.l_quantity > 0) & li.l_suppkey.isin(eu_supp)]
    per_pair: dict[tuple[int, int], float] = {}
    for pk, sk, price, qty in zip(
        li.l_partkey, li.l_suppkey, li.l_extendedprice, li.l_quantity
    ):
        key = (int(pk), int(sk))
        cost = float(price) / float(qty)
        if key not in per_pair or cost < per_pair[key]:
            per_pair[key] = cost
    per_part: dict[int, list[tuple[float, int]]] = defaultdict(list)
    for (pk, sk), cost in per_pair.items():
        per_part[pk].append((cost, sk))
    got = CATALOG["join_min_cost_supplier"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(per_part)
    for r_ in got.itertuples():
        pairs = per_part[int(r_.partkey)]
        cost, sk = min(pairs)
        assert int(r_.best_suppkey) == sk
        assert r_.best_cost == pytest.approx(_r(cost, 6), abs=2e-6)
        assert int(r_.n_suppliers) == len(pairs)


def test_join_market_share_matches_pandas(spark, sf_dir):
    """Q8: NATION_2's share of yearly ECONOMY-part revenue sold to
    ASIA-region customers — numerator and denominator as exact
    integer cents over the same joined rows."""
    p = _pq(sf_dir, "part")
    parts = set(p[p.p_type == "ECONOMY"].p_partkey.astype(int))
    na = _pq(sf_dir, "nation")
    asia_nations = set(na[na.n_regionkey == 2].n_nationkey)
    nation_name = na.set_index("n_nationkey")["n_name"]
    c = _pq(sf_dir, "customer")
    mkt_cust = set(
        c[c.c_nationkey.isin(asia_nations)].c_custkey.astype(int)
    )
    su = _pq(sf_dir, "supplier").set_index("s_suppkey")["s_nationkey"]
    o = _pq(sf_dir, "orders").set_index("o_orderkey")
    li = _pq(sf_dir, "lineitem")
    num: dict[int, int] = defaultdict(int)
    den: dict[int, int] = defaultdict(int)
    for ok, pk, sk, price, disc in zip(
        li.l_orderkey, li.l_partkey, li.l_suppkey,
        li.l_extendedprice, li.l_discount,
    ):
        if int(pk) not in parts or int(ok) not in o.index:
            continue
        row = o.loc[int(ok)]
        if int(row.o_custkey) not in mkt_cust:
            continue
        year = int(pd.Timestamp(row.o_orderdate).year)
        cents = _cents(float(price) * (1 - float(disc)))
        den[year] += cents
        if nation_name[su[int(sk)]] == "NATION_2":
            num[year] += cents
    got = CATALOG["join_market_share"].builder(spark, sf_dir).toPandas()
    assert set(got.o_year.astype(int)) == set(den)
    for r_ in got.itertuples():
        y = int(r_.o_year)
        assert r_.mkt_share == pytest.approx(
            _r(num.get(y, 0) / den[y], 6), abs=2e-6
        )
        assert float(r_.total_revenue) == den[y] / 100.0


def test_agg_nation_profit_matches_pandas(spark, sf_dir):
    """Q9 variant: per (supplier nation, year) profit over the
    %red% part family, revenue minus the deterministic half-retail
    cost proxy, all in exact integer cents."""
    p = _pq(sf_dir, "part")
    p = p[p.p_name.str.contains("red", na=False)]
    retail = p.set_index("p_partkey")["p_retailprice"]
    na = _pq(sf_dir, "nation").set_index("n_nationkey")["n_name"]
    su = _pq(sf_dir, "supplier").set_index("s_suppkey")["s_nationkey"]
    o = _pq(sf_dir, "orders").set_index("o_orderkey")["o_orderdate"]
    li = _pq(sf_dir, "lineitem")
    profit: dict[tuple[str, int], int] = defaultdict(int)
    for ok, pk, sk, qty, price, disc in zip(
        li.l_orderkey, li.l_partkey, li.l_suppkey,
        li.l_quantity, li.l_extendedprice, li.l_discount,
    ):
        if int(pk) not in retail.index:
            continue
        nation = na[su[int(sk)]]
        year = int(pd.Timestamp(o[int(ok)]).year)
        rev = _cents(float(price) * (1 - float(disc)))
        cost = math.floor(
            _cents(float(retail[int(pk)])) * float(qty) * 0.5
        )
        profit[(nation, year)] += rev - cost
    got = CATALOG["agg_nation_profit"].builder(spark, sf_dir).toPandas()
    assert {
        (r_.nation, int(r_.o_year)): float(r_.sum_profit)
        for r_ in got.itertuples()
    } == {k: v / 100.0 for k, v in profit.items()}


def test_join_returned_items_matches_pandas(spark, sf_dir):
    """Q10: top-20 customers by returned-item revenue in 1996Q1,
    revenue in exact integer cents, ties broken by custkey."""
    o = _pq(sf_dir, "orders")
    o = o[
        (o.o_orderdate >= pd.Timestamp("1996-01-01"))
        & (o.o_orderdate < pd.Timestamp("1996-04-01"))
    ][["o_orderkey", "o_custkey"]]
    li = _pq(sf_dir, "lineitem")
    li = li[li.l_returnflag == "R"]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    cents = (
        (j.l_extendedprice * (1 - j.l_discount) * 100.0 + 0.5)
        .apply(math.floor)
    )
    per_cust = cents.groupby(j.o_custkey.astype(int)).sum()
    c = _pq(sf_dir, "customer").set_index("c_custkey")
    na = _pq(sf_dir, "nation").set_index("n_nationkey")["n_name"]
    rows = sorted(
        (
            (-int(v), int(ck), na[c.loc[int(ck), "c_nationkey"]],
             _r(float(c.loc[int(ck), "c_acctbal"]), 2))
            for ck, v in per_cust.items()
        ),
    )[:20]
    exp = [
        (ck, name, bal, -negv / 100.0) for negv, ck, name, bal in rows
    ]
    got = CATALOG["join_returned_items"].builder(spark, sf_dir).toPandas()
    assert [
        (int(r_.c_custkey), r_.n_name, float(r_.acctbal), float(r_.revenue))
        for r_ in got.itertuples()
    ] == exp


def test_agg_correlated_scalar_matches_pandas(spark, sf_dir):
    """Q17: lines below 0.2x their part's mean quantity, per brand."""
    li = _pq(sf_dir, "lineitem")
    cut = 0.2 * li.groupby("l_partkey").l_quantity.mean()
    brand = _pq(sf_dir, "part").set_index("p_partkey")["p_brand"]
    per_brand: dict[str, list[float]] = defaultdict(list)
    for pk, qty, price in zip(
        li.l_partkey, li.l_quantity, li.l_extendedprice
    ):
        if float(qty) < float(cut[int(pk)]):
            per_brand[brand[int(pk)]].append(float(price))
    got = CATALOG["agg_correlated_scalar"].builder(spark, sf_dir).toPandas()
    assert set(got.p_brand) == set(per_brand)
    for r_ in got.itertuples():
        prices = per_brand[r_.p_brand]
        assert int(r_.n_small_lines) == len(prices)
        assert r_.avg_yearly == pytest.approx(
            _r(sum(prices) / 7.0, 2), abs=0.02
        )


def test_join_lateral_topk_matches_pandas(spark, sf_dir):
    """Decorrelated LATERAL: each sharded order's two priciest lines."""
    o = _pq(sf_dir, "orders")
    o = o[o.o_orderkey % 10 == 0].set_index("o_orderkey")["o_orderdate"]
    li = _pq(sf_dir, "lineitem")
    li = li[li.l_orderkey % 10 == 0]
    exp = set()
    for ok, g in li.groupby("l_orderkey"):
        if int(ok) not in o.index:
            continue
        top2 = sorted(
            zip(g.l_extendedprice, g.l_linenumber), key=lambda t: (-t[0], t[1])
        )[:2]
        for price, ln in top2:
            exp.add((int(ok), pd.Timestamp(o[int(ok)]), int(ln), float(price)))
    got = CATALOG["join_lateral_topk"].builder(spark, sf_dir).toPandas()
    assert {
        (int(r_.o_orderkey), pd.Timestamp(r_.o_orderdate),
         int(r_.l_linenumber), float(r_.l_extendedprice))
        for r_ in got.itertuples()
    } == exp
    assert len(got) == len(exp)


def _ntile4(n_rows: int, pos: int) -> int:
    base, extra = divmod(n_rows, 4)
    cut = extra * (base + 1)
    if pos <= cut:
        return (pos - 1) // (base + 1) + 1
    return extra + (pos - cut - 1) // base + 1


def test_events_rfm_matches_python(spark, sf_dir):
    """RFM quartile grid: per purchasing user, recency/frequency/
    monetary quartiles (4 = best; the data-driven boundaries are
    tie-broken by user_id), then the segment rollup."""
    ev = _pq(sf_dir, "events")
    pu = ev[ev.event_type == "purchase"]
    agg = {}
    for uid, g in pu.groupby("user_id"):
        agg[int(uid)] = (
            g.ts.dt.date.max(),
            len(g),
            _r(float(g.value.sum()), 2),
        )
    gmax = max(d for d, _, _ in agg.values())
    users = sorted(agg)
    rec = {u: (gmax - agg[u][0]).days for u in users}
    n = len(users)
    scores = {}
    for axis, keyf in (
        (0, lambda u: (-rec[u], u)),          # recency DESC
        (1, lambda u: (agg[u][1], u)),        # frequency ASC
        (2, lambda u: (agg[u][2], u)),        # monetary ASC
    ):
        for pos, u in enumerate(sorted(users, key=keyf), start=1):
            scores.setdefault(u, [0, 0, 0])[axis] = _ntile4(n, pos)
    cells: dict[tuple, list[float]] = defaultdict(list)
    for u in users:
        cells[tuple(scores[u])].append(agg[u][2])
    got = CATALOG["events_rfm"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(cells)
    for r_ in got.itertuples():
        ms = cells[(int(r_.r_score), int(r_.f_score), int(r_.m_score))]
        assert int(r_.n_users) == len(ms)
        assert r_.avg_monetary == pytest.approx(
            _r(sum(ms) / len(ms), 4), abs=2e-4
        )
        assert r_.total_monetary == pytest.approx(
            _r(sum(ms), 2), abs=0.02
        )
