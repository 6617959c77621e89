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
