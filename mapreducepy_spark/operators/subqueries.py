"""Classic subquery / decorrelation shapes (SURVEY.md §2.3/§2.4).

The five patterns every SQL-on-big-data engine must decorrelate —
IN over a grouped HAVING (TPC-H Q18), disjunctive join predicates
(Q19), group-share-vs-global-scalar (Q11), anti-join against a
scalar-subquery threshold (Q22), and an EXISTS / NOT-EXISTS chain
(Q21) — each written as the flat DataFrame plan Catalyst's
decorrelation rules would produce, so the single-pass shape is
guaranteed rather than hoped for.

Hash-parity discipline: every threshold that compares a SUM of
doubles is computed in exact integer cents (``floor(x*100+0.5)`` per
row, BIGINT sums) on BOTH engines, so partial-aggregation order can
never flip a row across the boundary — the ``agg_correlated_scalar``
exact-int precedent, applied to money. Output money is the exact
cents sum divided once by 100.0 (deterministic IEEE).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from ..rounding import dround

# Orders whose total quantity exceeds this are "large volume"
# (fixture max ~460, mean ~103 — keeps ~1.4% of orders at sf0.01).
_Q18_MIN_QTY = 250

# Disjunctive-join branch predicates (brand / size / quantity bands,
# fixture brands are Brand#1..Brand#55 — each branch matches).
_Q19_BRANCHES = (
    ("Brand#11", 1, 15, 1, 20),
    ("Brand#22", 10, 30, 10, 35),
    ("Brand#33", 20, 50, 20, 50),
)

# A part is "important" above 5/4 of the MEAN per-part value. TPC-H
# Q11's literal fixed-share-of-global cutoff (0.0001/SF) must shrink
# with scale factor for exactly this reason — a fixed share against
# a growing key count goes degenerate (measured: 1/2000 keeps 971 of
# 2000 parts at sf0.01 and 0 of 20000 at sf0.1). The mean-relative
# form is scale-invariant: the fixture's value/mean dispersion is
# stable across SFs (p90 ≈ 1.27, max ≈ 1.8), so 5/4 keeps ~10% of
# parts at every SF.
_Q11_NUM = 5
_Q11_DEN = 4

# Customers with no order on/after this date are "idle" (fixture
# orderdates span 1995-01-01 .. 2001-08-01).
_Q22_CUTOFF = "2000-07-01"

_CENTS = "CAST(floor({x} * 100.0 + 0.5) AS BIGINT)"


def _cents(col: Column) -> Column:
    """Exact integer cents of a money double (both-engine formula)."""
    return F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("bigint")


# --- Q18: IN-subquery over grouped HAVING --------------------------

_ORACLE_JOIN_GROUPAGG_IN = f"""
WITH big AS (
    SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(l_quantity) > {_Q18_MIN_QTY}
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       o.o_totalprice, b.sum_qty
FROM orders o
JOIN big b ON b.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register(
    "join_groupagg_in", _ORACLE_JOIN_GROUPAGG_IN, tags=("join", "tpch")
)
def join_groupagg_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q18 shape — large-volume orders: ``o_orderkey IN
    (SELECT l_orderkey … GROUP BY … HAVING SUM(qty) > k)`` joined
    back to the customer. The IN-subquery decorrelates to exactly
    the aggregate-then-join written here; keeping the aggregate's
    ``sum_qty`` in the output (as Q18 does) makes it a plain inner
    join rather than a semi-join.

    Scale: lineitem aggregates on ``l_orderkey`` with map-side
    combine (≤7 lines per order ⇒ near-total collapse before the
    shuffle); orders joins the surviving ~1% on the SAME key, so the
    aggregate output needs no second shuffle; the customer join
    shuffles on ``c_custkey`` — at 100 TB both sides of each join
    are hash-partitioned once on their join key, and AQE is free to
    broadcast the filtered aggregate when the HAVING is selective.

    Hash parity: ``l_quantity`` is integral (fixture-checked), so
    the SUM is exact in a double at any partial-aggregation order
    and the HAVING compare plus the BIGINT cast are deterministic;
    every other output column is a passthrough.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > _Q18_MIN_QTY)
        .select(
            "l_orderkey", F.col("__qty").cast("bigint").alias("sum_qty")
        )
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
    )


# --- Q19: disjunctive predicate join -------------------------------

def _q19_branch_sql(brand: str, s0: int, s1: int, q0: int, q1: int) -> str:
    return (
        f"(p.p_brand = '{brand}' AND p.p_size BETWEEN {s0} AND {s1}"
        f" AND l.l_quantity BETWEEN {q0} AND {q1})"
    )


_ORACLE_JOIN_DISJUNCTIVE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM({_CENTS.format(x='l.l_extendedprice * (1 - l.l_discount)')})
            AS DOUBLE) / 100.0 AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE {" OR ".join(_q19_branch_sql(*b) for b in _Q19_BRANCHES)}
"""


@register(
    "join_disjunctive", _ORACLE_JOIN_DISJUNCTIVE, tags=("join", "tpch")
)
def join_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q19 shape — revenue under an OR-of-ANDs predicate
    that mixes columns from BOTH join sides. Written as one equi-join
    plus the raw disjunction: Catalyst extracts the common
    ``p_partkey`` equi-key, keeps the disjunction as a join residual,
    and pushes the per-side OR projections (brand/size bands to the
    part scan, quantity bands to the lineitem scan) below the join —
    the textbook reason NOT to hand-split the query into three
    unioned branches, which would scan lineitem three times.

    Scale: part is the dimension side and broadcasts (hinted); the
    100 TB lineitem side is filtered by the pushed-down quantity
    disjunction before the join and never shuffles.

    Hash parity: revenue is summed in exact integer cents per line
    (BIGINT), so the single global SUM is order-independent; the
    output double is one exact division by 100.0.
    """
    li = load(spark, sf_dir, "lineitem").alias("l")
    part = load(spark, sf_dir, "part").alias("p")
    branch = F.lit(False)
    for brand, s0, s1, q0, q1 in _Q19_BRANCHES:
        branch = branch | (
            (F.col("p.p_brand") == brand)
            & F.col("p.p_size").between(s0, s1)
            & F.col("l.l_quantity").between(q0, q1)
        )
    rev_cents = _cents(
        F.col("l.l_extendedprice") * (1 - F.col("l.l_discount"))
    )
    return (
        li.join(
            F.broadcast(part), F.col("l.l_partkey") == F.col("p.p_partkey")
        )
        .filter(branch)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            (F.sum(rev_cents).cast("double") / 100.0).alias("revenue"),
        )
    )


# --- Q11: group share vs a global scalar threshold -----------------

_Q11_VAL_CENTS = _CENTS.format(
    x="l_extendedprice * (1 - l_discount)"
)

_ORACLE_AGG_GLOBAL_SHARE = f"""
WITH pp AS (
    SELECT l_partkey,
           CAST(SUM({_Q11_VAL_CENTS}) AS BIGINT) AS val_cents
    FROM lineitem
    GROUP BY l_partkey
),
tot AS (
    SELECT CAST(SUM(val_cents) AS BIGINT) AS tot_cents,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM pp
)
SELECT pp.l_partkey,
       CAST(pp.val_cents AS DOUBLE) / 100.0 AS part_value
FROM pp, tot
WHERE pp.val_cents * tot.n_parts * {_Q11_DEN}
      > {_Q11_NUM} * tot.tot_cents
"""


@register(
    "agg_global_share", _ORACLE_AGG_GLOBAL_SHARE, tags=("agg", "tpch")
)
def agg_global_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q11 shape — groups whose aggregate exceeds a
    threshold derived from the GLOBAL aggregate (``HAVING SUM(v) >
    f * (SELECT SUM(v)/COUNT(*) …)``; here 5/4 of the mean per-part
    value — see ``_Q11_NUM`` for why the mean-relative form, unlike
    Q11's literal fixed share, stays non-degenerate at every scale
    factor). The scalar subquery decorrelates to: aggregate per key
    once, roll the per-key table up to the one-row total, broadcast
    it back via cross join, filter.

    Scale: ONE corpus-sized aggregation (partkey-keyed, map-side
    combine); the total is derived from the per-key table — Spark
    reuses the per-key Exchange for both consumers (the text_tfidf
    ReusedExchange pattern) — and rides a 1-row broadcast cross
    join, so the global threshold costs zero extra passes over
    lineitem.

    Hash parity: the threshold compare is exact BIGINT arithmetic
    (``val_cents · n_parts · 4 > 5 · tot_cents`` — the mean is never
    materialized as a double), so partial-sum order is irrelevant on
    both engines.
    """
    li = load(spark, sf_dir, "lineitem")
    val_cents = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    pp = li.groupBy("l_partkey").agg(
        F.sum(val_cents).cast("bigint").alias("val_cents")
    )
    tot = pp.agg(
        F.sum("val_cents").cast("bigint").alias("tot_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
    )
    return (
        pp.crossJoin(F.broadcast(tot))
        .filter(
            F.col("val_cents") * F.col("n_parts") * _Q11_DEN
            > _Q11_NUM * F.col("tot_cents")
        )
        .select(
            "l_partkey",
            (F.col("val_cents").cast("double") / 100.0).alias("part_value"),
        )
    )


# --- Q22: anti-join + scalar-average threshold ---------------------

_Q22_BAL_CENTS = _CENTS.format(x="c_acctbal")

_ORACLE_JOIN_ANTI_SCALAR = f"""
WITH pos AS (
    SELECT CAST(SUM({_Q22_BAL_CENTS}) AS BIGINT) AS sum_cents,
           CAST(COUNT(*) AS BIGINT) AS n_pos
    FROM customer WHERE c_acctbal > 0
),
idle AS (
    SELECT c.c_mktsegment, {_Q22_BAL_CENTS} AS bal_cents
    FROM customer c, pos
    WHERE {_Q22_BAL_CENTS} * pos.n_pos > pos.sum_cents
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '{_Q22_CUTOFF} 00:00:00'
      )
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(bal_cents) AS DOUBLE) / 100.0 AS total_acctbal
FROM idle
GROUP BY c_mktsegment
"""


@register(
    "join_anti_scalar", _ORACLE_JOIN_ANTI_SCALAR, tags=("join", "tpch")
)
def join_anti_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q22 shape — "idle high-balance customers": balance
    above the average of all positive balances (scalar subquery) AND
    no recent order (NOT EXISTS ⇒ anti-join), rolled up per market
    segment. (The fixture gives every customer at least one order
    ever, so the NOT EXISTS is made temporal: no order since
    2000-07-01 — same plan shape, non-degenerate result.)

    Scale: the scalar threshold is a 1-row broadcast cross join
    (never a per-row subquery); the anti-join shuffles customer and
    the date-filtered orders once each on custkey — the filter
    pushes to the orders scan, and at a selective cutoff AQE can
    broadcast the recent-orders side instead. The final rollup is a
    5-group aggregate.

    Hash parity: the average compare is exact integers —
    ``bal_cents * n_pos > sum_cents`` avoids ever materializing the
    average as a double — and the segment totals are BIGINT cents.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    bal_cents = _cents(F.col("c_acctbal"))
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal_cents).cast("bigint").alias("sum_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_pos"),
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(bal_cents * F.col("n_pos") > F.col("sum_cents"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            (F.sum(bal_cents).cast("double") / 100.0).alias(
                "total_acctbal"
            ),
        )
    )


# --- Q21: EXISTS / NOT-EXISTS chain --------------------------------

_ORACLE_JOIN_EXISTS_CHAIN = """
SELECT s.s_name,
       CAST(COUNT(*) AS BIGINT) AS n_last_ship_lines,
       CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS n_orders
FROM lineitem l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
)
AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
)
GROUP BY s.s_name
"""


@register(
    "join_exists_chain", _ORACLE_JOIN_EXISTS_CHAIN, tags=("join", "tpch")
)
def join_exists_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q21 shape — correlated EXISTS and NOT EXISTS against
    the same fact table: per supplier, the lineitems where it was the
    LAST shipper of a multi-supplier order (another supplier exists
    in the order; none shipped strictly later — shipdate ties keep
    every tied-last supplier, deterministically). EXISTS decorrelates
    to a left-semi join, NOT EXISTS to a left-anti join; chaining
    them on the probe keeps one flat pipeline instead of nested
    per-row subqueries.

    Scale (r13 optimization round — guide §2.4 "remove shuffles
    outright"): the decorrelated semi/anti chain shuffled the
    projected fact table THREE times (probe + two build sides, all on
    ``l_orderkey``). Both EXISTS predicates only compare a row to the
    OTHER rows of its own order, so they are order-partitioned window
    algebra: after ONE exchange on ``l_orderkey``,

    - EXISTS(other supplier)  ⇔  count(*) over (order) >
      count(*) over (order, supplier) — another row with a different
      suppkey exists;
    - NOT EXISTS(other supplier shipped strictly later)  ⇔
      ``max shipdate among OTHER suppliers <= own shipdate``, where
      that max is ``d1`` (the order's max) unless the row's supplier
      IS the lexicographic argmax ``k1`` of (shipdate, suppkey) — then
      it is ``m2 = max(shipdate WHERE suppkey != k1)``. If a DIFFERENT
      supplier ties ``d1``, m2 == d1 and the tie keeps every tied-last
      supplier, exactly the semi/anti semantics.

    The (order, supplier) window sits ABOVE the order windows so
    hashpartitioning(l_orderkey) satisfies both partitionings — one
    fact shuffle total (3 Exchange → 1, verified in
    plans/r13/join_exists_chain_after.txt); the supplier dimension
    still broadcasts.

    Hash parity: counts only — no doubles anywhere; the rewrite is
    pure integer/date comparisons, proven against the unchanged
    EXISTS/NOT-EXISTS oracle at sf0.001/0.01/0.1.

    NULL algebra (pinned by the adversarial null-sweep): a NULL
    l_orderkey or l_suppkey row can never be a survivor (the
    correlated equality / inequality is UNKNOWN), never an EXISTS
    witness and never a NOT-EXISTS offender — so those rows are
    pre-filtered (they also can't reach the supplier join). A NULL
    l_shipdate row CAN witness EXISTS and CAN survive (``l3.shipdate
    > NULL`` is UNKNOWN, so it has no offenders) but can never
    offend, so shipdates are guarded inside the window maxes and the
    anti-condition passes when either side of the comparison is NULL.
    """
    from pyspark.sql.window import Window

    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .filter(
            F.col("l_orderkey").isNotNull() & F.col("l_suppkey").isNotNull()
        )
    )
    supp = load(spark, sf_dir, "supplier")
    w_ord = Window.partitionBy("l_orderkey")
    w_os = Window.partitionBy("l_orderkey", "l_suppkey")
    step1 = li.select(
        "*",
        F.count(F.lit(1)).over(w_ord).alias("n_rows"),
        F.max(
            F.when(
                F.col("l_shipdate").isNotNull(),
                F.struct(
                    F.col("l_shipdate").alias("d"),
                    F.col("l_suppkey").alias("k"),
                ),
            )
        )
        .over(w_ord)
        .alias("top1"),
    )
    step2 = step1.select(
        "*",
        F.max(
            F.when(
                F.col("l_shipdate").isNotNull()
                & (F.col("l_suppkey") != F.col("top1.k")),
                F.col("l_shipdate"),
            )
        )
        .over(w_ord)
        .alias("m2"),
    )
    step3 = step2.select(
        "*", F.count(F.lit(1)).over(w_os).alias("n_own")
    )
    other_max = F.when(
        F.col("l_suppkey") == F.col("top1.k"), F.col("m2")
    ).otherwise(F.col("top1.d"))
    last = step3.filter(
        (F.col("n_rows") > F.col("n_own"))
        & (
            F.col("l_shipdate").isNull()
            | other_max.isNull()
            | (other_max <= F.col("l_shipdate"))
        )
    ).select("l_orderkey", "l_suppkey")
    return (
        last.join(
            F.broadcast(supp), last.l_suppkey == supp.s_suppkey
        )
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_last_ship_lines"),
            F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"),
        )
    )


# --- Q15: max-of-aggregate (the "view" shape) ----------------------

# Revenue window — one quarter inside the fixture's shipdate span.
_Q15_START = "1996-01-01"
_Q15_END = "1996-04-01"

_Q15_REV_CENTS = _CENTS.format(x="l_extendedprice * (1 - l_discount)")

_ORACLE_AGG_TOP_REVENUE = f"""
WITH rev AS (
    SELECT l_suppkey,
           CAST(SUM({_Q15_REV_CENTS}) AS BIGINT) AS rev_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q15_START} 00:00:00'
      AND l_shipdate <  TIMESTAMP '{_Q15_END} 00:00:00'
    GROUP BY l_suppkey
),
mx AS (
    SELECT CAST(MAX(rev_cents) AS BIGINT) AS max_cents FROM rev
)
SELECT s.s_suppkey, s.s_name,
       CAST(rev.rev_cents AS DOUBLE) / 100.0 AS total_revenue
FROM rev CROSS JOIN mx
JOIN supplier s ON s.s_suppkey = rev.l_suppkey
WHERE rev.rev_cents = mx.max_cents
"""


@register(
    "agg_top_revenue", _ORACLE_AGG_TOP_REVENUE, tags=("agg", "tpch")
)
def agg_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q15 shape — the top-revenue supplier over a quarter,
    i.e. ``WHERE total_revenue = (SELECT MAX(total_revenue) FROM
    view)``: an aggregate compared against the MAX of that same
    aggregate. Decorrelated form: aggregate per supplier once, roll
    the per-key table up to the one-row max, broadcast it back via
    cross join, filter on equality (revenue ties all surface — the
    spec's own semantics).

    Scale: ONE corpus-sized aggregation with the date predicate
    pushed to the parquet scan; the max derives from the per-key
    table, and AQE serves the probe's second consumption from a
    ReusedExchange (the ``agg_global_share`` pattern). The supplier
    dimension broadcasts onto the ≤handful of surviving rows.

    Hash parity: revenue is summed in exact BIGINT cents, so the
    max-equality can never be perturbed by partial-sum order; the
    money double is produced by ONE division at the end.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{_Q15_START} 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(f"{_Q15_END} 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("bigint")
        .alias("rev_cents")
    )
    mx = rev.agg(F.max("rev_cents").cast("bigint").alias("max_cents"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_cents") == F.col("max_cents"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_cents").cast("double") / 100.0).alias(
                "total_revenue"
            ),
        )
    )


# --- Q20: nested-semi-join chain -----------------------------------

# A (part, supplier) pair is a "dominant shipper" when its shipped
# quantity exceeds _Q20_MULT times the part's MEAN per-pair quantity
# (exact rational compare q·m > MULT·tot). The RELATIVE-share form is
# scale-stable because pairs-per-part and lineitems-per-pair are both
# ~constant across SFs (measured: suppliers selected 1/10, 49/100,
# 143/1000 at sf0.001/0.01/0.1 — never empty, never saturated; a
# fixed absolute quantity cutoff saturates to all-suppliers as pairs
# accumulate — the agg_global_share degeneracy lesson).
_Q20_MULT = 3
_Q20_MAX_SIZE = 10  # part filter: small parts only (~20% of parts)

_ORACLE_JOIN_NESTED_SEMI = f"""
WITH pq AS (
    SELECT l_partkey AS pk, l_suppkey AS sk,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
    FROM lineitem GROUP BY 1, 2
),
pt AS (
    SELECT pk, CAST(SUM(q) AS BIGINT) AS tot,
           CAST(COUNT(*) AS BIGINT) AS m
    FROM pq GROUP BY pk
),
heavy AS (
    SELECT pq.sk
    FROM pq
    JOIN pt USING (pk)
    WHERE pq.q * pt.m > {_Q20_MULT} * pt.tot
      AND EXISTS (
          SELECT 1 FROM part p
          WHERE p.p_partkey = pq.pk AND p.p_size <= {_Q20_MAX_SIZE}
      )
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE EXISTS (SELECT 1 FROM heavy WHERE heavy.sk = s.s_suppkey)
"""


@register(
    "join_nested_semi", _ORACLE_JOIN_NESTED_SEMI, tags=("join", "tpch")
)
def join_nested_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q20 shape — a two-level nested EXISTS chain:
    suppliers having (a dominant shipped share of) (a part in a
    filtered class). Both EXISTS levels decorrelate to left-semi
    joins: the part-class filter semi-joins the pair aggregate, the
    surviving pair table semi-joins the supplier dimension — never a
    per-row subquery.

    Scale: the corpus-sized work is ONE (part, supplier)-keyed
    aggregation with map-side combine; the per-part totals derive
    from that pair table (same-key reuse), the part-class filter is
    a broadcast semi-join of a key-only projection, and the final
    semi-join probes the small supplier dimension with the DISTINCT
    dominant-supplier keys.

    Hash parity: the dominance threshold is the exact rational
    BIGINT compare ``q·m > MULT·tot`` (quantities are integral —
    checked, the ``agg_correlated_scalar`` precedent); no doubles
    exist anywhere.
    """
    li = load(spark, sf_dir, "lineitem")
    pq = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("q"))
    pt = pq.groupBy("pk").agg(
        F.sum("q").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    sized = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") <= _Q20_MAX_SIZE)
        .select(F.col("p_partkey").alias("pk"))
    )
    heavy = (
        pq.join(pt, "pk")
        .filter(F.col("q") * F.col("m") > _Q20_MULT * F.col("tot"))
        .join(F.broadcast(sized), "pk", "left_semi")
        .select("sk")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return supp.join(
        heavy, supp.s_suppkey == heavy.sk, "left_semi"
    ).select("s_suppkey", "s_name")


# --- Q7: volume shipping between nation pairs -----------------------

# The classic two-sided dimension join: the supplier's nation and the
# customer's nation decorate the SAME lineitem row through different
# join paths, and revenue rolls up per directed (supp_nation,
# cust_nation, year) cell for cross-border rows only. TPC-H Q7 pins
# two specific nations; the cell GRID form here keeps every pair so
# the result is scale-stable (~n_nations² × years rows) and the
# oracle check covers the whole matrix, not one cell.

_ORACLE_JOIN_VOLUME_SHIPPING = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM({_CENTS.format(x='l.l_extendedprice * (1 - l.l_discount)')})
            AS DOUBLE) / 100.0 AS revenue
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY supp_nation, cust_nation, l_year
"""


@register(
    "join_volume_shipping", _ORACLE_JOIN_VOLUME_SHIPPING,
    tags=("join", "tpch"),
)
def join_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q7 shape — cross-border trade volume per directed
    (supplier nation, customer nation, ship year): the same fact row
    reaches TWO copies of the nation dimension through different
    foreign-key paths (supplier side and customer→order side), and
    only rows whose two nations differ survive.

    Scale: lineitem⋈orders is the one big fact-fact shuffle (AQE
    picks SMJ vs broadcast by size); customer/supplier ride their
    own equi-joins; the nation dimension is broadcast TWICE under
    distinct aliases — aliasing, not re-reading, is what lets
    Catalyst plan two independent broadcast hashes from one tiny
    table. The cross-border filter runs after the nation decorate
    (it needs both names); the final rollup's cell count is
    ~n_nations² × years regardless of fact size, so the aggregation
    shuffle is constant-bounded.

    Hash parity: revenue summed in exact BIGINT cents (the Q15
    discipline), one division at the end; the year is an integer on
    both engines.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount",
    )
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, supp.s_nationkey == F.col("n1_key"))
        .join(n2, cust.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        (
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("double") / 100.0
        ).alias("revenue"),
    )


# --- Q2: correlated MIN over a multi-join (min-cost supplier) ------

_Q2_REGION = "EUROPE"

_ORACLE_JOIN_MIN_COST = f"""
WITH cost AS (
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice / l_quantity) AS unit_cost
    FROM lineitem
    WHERE l_quantity > 0
    GROUP BY l_partkey, l_suppkey
),
eu AS (
    SELECT c.l_partkey, c.l_suppkey, c.unit_cost
    FROM cost c
    JOIN supplier s ON c.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{_Q2_REGION}'
),
ranked AS (
    SELECT l_partkey, l_suppkey, unit_cost,
           ROW_NUMBER() OVER (
               PARTITION BY l_partkey
               ORDER BY unit_cost ASC NULLS LAST, l_suppkey ASC NULLS LAST
           ) AS rn,
           CAST(COUNT(*) OVER (PARTITION BY l_partkey) AS BIGINT)
               AS n_suppliers
    FROM eu
)
SELECT l_partkey AS partkey,
       l_suppkey AS best_suppkey,
       (floor(unit_cost * 1000000.0 + 0.5) / 1000000.0) AS best_cost,
       n_suppliers
FROM ranked WHERE rn = 1
"""


@register(
    "join_min_cost_supplier", _ORACLE_JOIN_MIN_COST,
    tags=("join", "subquery"),
)
def join_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q2 shape — a correlated MIN subquery over a
    multi-join ("the supplier offering each part cheapest, among
    EUROPE suppliers"), decorrelated: per-(part, supplier) unit cost
    from the fact table, the region filter applied through the
    supplier→nation→region dimension chain, then an argmin window
    per part (cost, then suppkey — deterministic on cost ties). The
    naive form re-runs the MIN subquery per outer row; this runs it
    once for all parts.

    Scale: the region filter is applied BELOW the aggregation — the
    dimension chain collapses to a broadcast LEFT SEMI onto the fact
    table, so only the ~1/|regions| surviving rows ride the one
    (partkey, suppkey) shuffle (measured 3× faster than
    aggregate-then-filter at sf0.1, and the gap grows with region
    selectivity). The argmin window then runs on the AGGREGATED
    table (|part×supplier| pairs, ~6× smaller than the filtered
    fact) keyed on partkey. The fact table shuffles exactly once.
    Filter-first is semantics-preserving here because the predicate
    is per-SUPPLIER, a grouping key of the MIN.

    Hash parity: MIN over doubles is order-free; the unit-cost
    division is a single IEEE op on identical parquet doubles;
    rounding only at output. Zero/NULL quantities are excluded by
    the > 0 predicate on both engines.
    """
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg = (
        load(spark, sf_dir, "region")
        .filter(F.col("r_name") == _Q2_REGION)
        .select("r_regionkey")
    )
    eu_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    eu = (
        li.join(
            F.broadcast(eu_supp),
            li.l_suppkey == F.col("s_suppkey"),
            "left_semi",
        )
        # ONE shuffle serves both the aggregation and the argmin
        # window: hash-partitioning on l_partkey alone satisfies the
        # (l_partkey, l_suppkey) grouping (prefix partitioning — all
        # rows of a pair share the partkey partition) AND the
        # window's partkey requirement, so EnsureRequirements adds no
        # second Exchange (plan-asserted).
        .repartition(F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity"))
            .alias("unit_cost")
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_partkey").orderBy(
        F.col("unit_cost").asc_nulls_last(),
        F.col("l_suppkey").asc_nulls_last(),
    )
    wc = Window.partitionBy("l_partkey")
    return (
        eu.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_suppliers", F.count(F.lit(1)).over(wc).cast("bigint")
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("best_suppkey"),
            dround("unit_cost", 6).alias("best_cost"),
            "n_suppliers",
        )
    )


# --- Q3 / Q5 / Q8 / Q10: the classic join+agg report shapes --------
# With these four, the engine covers 17 of the 22 TPC-H query shapes
# (1,2,3,5,7,8,10,11,13,15,17,18,19,20,21,22 + Q4's EXISTS variant
# via join_semi); the missing five need columns the fixture does not
# carry (shipmode/instruct, supplycost, name/address text).

_Q3_CUT = "1996-07-01"

_ORACLE_JOIN_SHIPPING_PRIORITY = f"""
SELECT l.l_orderkey,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0
                           + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '{_Q3_CUT} 00:00:00'
  AND l.l_shipdate > TIMESTAMP '{_Q3_CUT} 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
LIMIT 10
"""


@register(
    "join_shipping_priority", _ORACLE_JOIN_SHIPPING_PRIORITY,
    tags=("join", "tpch"),
)
def join_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q3 shape — segment-filtered unshipped-revenue top-N:
    BUILDING customers' orders placed before the cut whose lineitems
    ship after it, ranked by outstanding revenue; the classic
    "most valuable open orders" report.

    Scale: lineitem⋈orders is the one fact-fact join (both
    date-filtered at the scan — PushedFilters on both sides); the
    customer segment filter broadcasts. Top-10 is
    TakeOrderedAndProject over the aggregated (order, date) rows —
    no global sort materializes.

    Hash parity: revenue in exact BIGINT cents (per-row floor, the
    Q15 discipline) divided once; the ORDER/LIMIT tie-break is total
    (revenue, date, orderkey).
    """
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(f"{_Q3_CUT} 00:00:00").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(f"{_Q3_CUT} 00:00:00").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.sum(rev).cast("double") / 100.0).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
    )


_Q5_REGIONKEY = 3  # the fixture's EUROPE

_ORACLE_JOIN_LOCAL_SUPPLIER = f"""
SELECT n.n_name,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0
                           + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND s.s_nationkey = c.c_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_regionkey = {_Q5_REGIONKEY}
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
"""


@register(
    "join_local_supplier", _ORACLE_JOIN_LOCAL_SUPPLIER,
    tags=("join", "tpch"),
)
def join_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q5 shape — local-supplier volume: revenue per nation
    where the CUSTOMER and the SUPPLIER share the nation (the
    same-nation equality is the shape's signature — a correlation
    between two different dimension paths of the same fact row),
    restricted to one region and one order year.

    Scale: lineitem⋈orders is the fact-fact join (year predicate
    pushed to the orders scan); supplier/nation/region broadcast;
    the customer join carries the same-nation residual on its
    equi-key. Final rollup is |nations| rows.

    Hash parity: exact-cents revenue, one division.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_regionkey") == _Q5_REGIONKEY
    ).select("n_nationkey", "n_name")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg((F.sum(rev).cast("double") / 100.0).alias("revenue"))
    )


_Q8_TYPE = "ECONOMY"
_Q8_MKT_REGIONKEY = 2  # customers in the fixture's ASIA
_Q8_SHARE_NATION = "NATION_2"  # measured supplier nation (in ASIA)

_ORACLE_JOIN_MARKET_SHARE = f"""
WITH sales AS (
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0
                      + 0.5) AS BIGINT) AS rev_cents,
           ns.n_name AS supp_nation
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    WHERE p.p_type = '{_Q8_TYPE}'
      AND nc.n_regionkey = {_Q8_MKT_REGIONKEY}
)
SELECT o_year,
       (floor((CAST(SUM(CASE WHEN supp_nation = '{_Q8_SHARE_NATION}'
                             THEN rev_cents ELSE 0 END) AS DOUBLE)
               / CAST(SUM(rev_cents) AS DOUBLE))
              * 1000000.0 + 0.5) / 1000000.0) AS mkt_share,
       CAST(SUM(rev_cents) AS DOUBLE) / 100.0 AS total_revenue
FROM sales
GROUP BY o_year
"""


@register(
    "join_market_share", _ORACLE_JOIN_MARKET_SHARE, tags=("join", "tpch")
)
def join_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q8 shape — national market share: within one
    region's market for one part type, the fraction of yearly
    revenue supplied by one nation. The signature is the
    conditional-share aggregation (numerator = CASE-gated sum over
    the same rows as the denominator — one pass, no self-join) under
    a two-path nation decorate (customer's nation filters the
    market, supplier's nation is measured).

    Scale: the part-type filter broadcasts into the fact scan first
    (most selective); lineitem⋈orders is the fact-fact join;
    customer joins on its key; nation (twice, aliased) and supplier
    broadcast. One year-keyed rollup.

    Hash parity: both share terms are exact BIGINT cent sums;
    the single double division is IEEE-identical on identical ints;
    share rounded to 1e-6, revenue to cents.
    """
    p = load(spark, sf_dir, "part").filter(
        F.col("p_type") == _Q8_TYPE
    ).select("p_partkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount",
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nc = load(spark, sf_dir, "nation").filter(
        F.col("n_regionkey") == _Q8_MKT_REGIONKEY
    ).select(F.col("n_nationkey").alias("nc_key"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"),
        F.col("n_name").alias("supp_nation"),
    )
    rev_cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    sales = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("nc_key"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("ns_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev_cents.alias("rev_cents"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(
            F.col("supp_nation") == _Q8_SHARE_NATION, F.col("rev_cents")
        ).otherwise(F.lit(0))
    )
    den = F.sum("rev_cents")
    return sales.groupBy("o_year").agg(
        dround(num.cast("double") / den.cast("double"), 6).alias("mkt_share"),
        (den.cast("double") / 100.0).alias("total_revenue"),
    )


_ORACLE_JOIN_RETURNED_ITEMS = """
SELECT c.c_custkey,
       n.n_name,
       (floor(c.c_acctbal * 100.0 + 0.5) / 100.0) AS acctbal,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0
                           + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c.c_custkey, n.n_name, c.c_acctbal
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""


@register(
    "join_returned_items", _ORACLE_JOIN_RETURNED_ITEMS,
    tags=("join", "tpch"),
)
def join_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q10 shape — returned-item reporting: the 20
    customers who returned the most revenue in one quarter, decorated
    with nation and account balance (the "who should support call
    first" list).

    Scale: both fact scans carry pushed filters (returnflag on
    lineitem, the quarter on orders); the fact-fact join runs under
    AQE; nation broadcasts; the customer join keys on custkey.
    Top-20 is TakeOrderedAndProject over the per-customer rollup.

    Hash parity: revenue in exact cents; acctbal floor-rounded on
    both engines; (revenue, custkey) is a total order for the cut.
    """
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "n_name", "c_acctbal")
        .agg((F.sum(rev).cast("double") / 100.0).alias("revenue"))
        .select(
            "c_custkey", "n_name",
            dround("c_acctbal").alias("acctbal"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_ORACLE_AGG_FORECAST_REVENUE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(floor(l_extendedprice * l_discount * 100.0 + 0.5)
                     AS BIGINT)) AS DOUBLE) / 100.0 AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register(
    "agg_forecast_revenue", _ORACLE_AGG_FORECAST_REVENUE,
    tags=("agg", "tpch"),
)
def agg_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q6 shape — forecasting revenue change: the revenue
    that would have been gained by eliminating small discounts on
    low-quantity lines in one year. Deliberately the SIMPLEST query
    in the suite: a conjunctive filter + one global aggregate — its
    job is proving the fast path stays fast (every predicate reaches
    the parquet scan as a PushedFilter, the whole plan is one
    codegen'd stage, zero joins, zero wide shuffles).

    Hash parity: the per-line product floors to exact cents before
    the BIGINT sum (discount band compares are on stored doubles —
    equal on both engines since no arithmetic touches them).
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            (
                F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount")))
                .cast("double") / 100.0
            ).alias("revenue_delta"),
        )
    )


_ORACLE_AGG_PROMO_SHARE = """
WITH pl AS (
    SELECT CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0
                      + 0.5) AS BIGINT) AS rev_cents,
           CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS is_promo
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
)
SELECT (floor((100.0 * CAST(SUM(CASE WHEN is_promo = 1 THEN rev_cents
                                     ELSE 0 END) AS DOUBLE)
               / CAST(SUM(rev_cents) AS DOUBLE))
              * 1000000.0 + 0.5) / 1000000.0) AS promo_revenue_pct,
       CAST(SUM(rev_cents) AS DOUBLE) / 100.0 AS total_revenue
FROM pl
"""


@register(
    "agg_promo_share", _ORACLE_AGG_PROMO_SHARE, tags=("agg", "tpch")
)
def agg_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q14 shape — promotion effect: the percentage of one
    month's revenue that came from promotional parts. Same
    conditional-share algebra as ``join_market_share`` (CASE-gated
    numerator over the denominator's rows, one pass), with the part
    dimension broadcast into the month-filtered fact scan.

    Hash parity: both terms exact BIGINT cents; one double division,
    percentage rounded to 1e-6.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_type") == "PROMO", 1).otherwise(0).alias("is_promo"),
    )
    rev_cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    pl = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        rev_cents.alias("rev_cents"), "is_promo"
    )
    num = F.sum(
        F.when(F.col("is_promo") == 1, F.col("rev_cents")).otherwise(F.lit(0))
    )
    den = F.sum("rev_cents")
    return pl.agg(
        dround(
            F.lit(100.0) * num.cast("double") / den.cast("double"), 6
        ).alias("promo_revenue_pct"),
        (den.cast("double") / 100.0).alias("total_revenue"),
    )


# --- Q12 variant: shipping-speed priority census --------------------

# The fixture's lineitem has no l_shipmode / l_commitdate /
# l_receiptdate, so the Q12 "late by mode" form is unbuildable as
# written (README's TPC-H table documents the gap). This key keeps
# the query's SIGNATURE — group by a shipping attribute, CASE-count
# high-priority vs low-priority order lines inside each group — with
# the mode replaced by a ship-speed class derived from how long after
# the order date the line shipped. Interval comparisons (not
# datediff) so the same SQL text parses on both engines.
_ORACLE_JOIN_LATE_SHIPMENTS = """
SELECT CASE WHEN l.l_shipdate < o.o_orderdate THEN 'BACKDATED'
            WHEN l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
                 THEN 'FAST'
            WHEN l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
                 THEN 'REGULAR'
            ELSE 'SLOW' END AS ship_speed,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY ship_speed
"""


@register(
    "join_late_shipments", _ORACLE_JOIN_LATE_SHIPMENTS,
    tags=("join", "tpch"),
)
def join_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q12 shape (documented variant) — shipping priority
    census: for one ship-year, how many HIGH-priority vs low-priority
    order lines fall in each shipping-speed class. Q12's signature is
    the dual CASE-count over a fact-fact join grouped by a shipping
    attribute; the fixture lacks ``l_shipmode``, so the class derives
    from ship lag (interval thresholds against the order date — no
    engine-specific datediff).

    Scale: the ship-year predicate is pushed to the lineitem scan;
    lineitem⋈orders co-partitions on the order key under AQE; the
    dual counts fold map-side into 4 groups.

    Hash parity: integer counts only — nothing to round.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_orderdate").alias("o_orderdate_"),
    )
    speed = (
        F.when(F.col("l_shipdate") < F.col("o_orderdate_"), "BACKDATED")
        .when(
            F.col("l_shipdate")
            < F.col("o_orderdate_") + F.expr("INTERVAL 30 DAY"),
            "FAST",
        )
        .when(
            F.col("l_shipdate")
            < F.col("o_orderdate_") + F.expr("INTERVAL 90 DAY"),
            "REGULAR",
        )
        .otherwise("SLOW")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(speed.alias("ship_speed"), is_high.alias("is_high"))
        .groupBy("ship_speed")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(F.col("is_high"), 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


# --- Q9 variant: product-line profit by nation and year -------------

# No partsupp table in the fixture, so ps_supplycost does not exist
# (README's TPC-H table documents the gap). The variant keeps Q9's
# signature — profit = revenue minus quantity-scaled part cost,
# aggregated by the SUPPLIER's nation and the order year, for a
# p_name-matched part family — with the unit cost replaced by a
# deterministic proxy: half the part's retail price. The 0.5 factor
# is exact in binary, and retail_cents * quantity is an integer-valued
# double far below 2^53, so floor() lands identically on both engines.
_ORACLE_AGG_NATION_PROFIT = """
WITH profit AS (
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100.0
                      + 0.5) AS BIGINT)
           - CAST(floor(CAST(floor(p.p_retailprice * 100.0 + 0.5)
                             AS BIGINT) * l.l_quantity * 0.5)
                  AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
)
SELECT nation, o_year,
       CAST(SUM(profit_cents) AS DOUBLE) / 100.0 AS sum_profit
FROM profit
GROUP BY nation, o_year
"""


@register(
    "agg_nation_profit", _ORACLE_AGG_NATION_PROFIT, tags=("agg", "tpch")
)
def agg_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q9 shape (documented variant) — product-line profit:
    for every (supplier nation, order year), revenue minus cost over
    a part family selected by name pattern. The fixture has no
    partsupp/``ps_supplycost``, so unit cost is a deterministic proxy
    (half the retail price, exact in cents); the plan is the real
    Q9 plan — the part-family filter cuts the fact first, two
    dimension hops decorate the supplier's nation, and the order
    join supplies the year.

    Scale: part (name-filtered) broadcasts into the lineitem scan —
    the most selective cut runs first; supplier and nation broadcast;
    lineitem⋈orders is the one fact-fact shuffle (AQE-planned);
    final rollup is |nations|·|years| rows.

    Hash parity: profit is an exact BIGINT cent difference per line
    (retail_cents·qty·0.5 is an exactly-representable double, floored
    identically); one double division at the end.
    """
    p = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    rev_cents = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    cost_cents = F.floor(
        _cents(F.col("p_retailprice")) * F.col("l_quantity") * F.lit(0.5)
    ).cast("bigint")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "nation",
            F.year("o_orderdate").cast("int").alias("o_year"),
            (rev_cents - cost_cents).alias("profit_cents"),
        )
        .groupBy("nation", "o_year")
        .agg(
            (F.sum("profit_cents").cast("double") / 100.0).alias("sum_profit")
        )
    )


# --- Q16 variant: supplier diversity per part bucket -----------------

# No partsupp table, so supplier-part availability derives from the
# pairs that actually traded (DISTINCT l_partkey, l_suppkey — the
# fixture's observable supply relation), and the "customer
# complaints" supplier exclusion becomes the deterministic
# balance-under-review rule (s_acctbal < 0). The plan signature IS
# Q16: a distinct pair relation, an excluded-supplier anti-join, a
# part-attribute filter, COUNT(DISTINCT supplier) per attribute
# bucket.
_ORACLE_JOIN_SUPPLIER_PART_COUNT = """
WITH ps AS (
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p.p_brand, p.p_type, CAST(p.p_size AS INT) AS p_size,
       CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part p ON ps.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 14, 23, 45)
  AND ps.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
"""


@register(
    "join_supplier_part_count", _ORACLE_JOIN_SUPPLIER_PART_COUNT,
    tags=("join", "tpch"),
)
def join_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q16 shape (documented variant) — supplier diversity:
    how many distinct eligible suppliers can provide each
    (brand, type, size) part bucket. The fixture has no partsupp, so
    the supply relation is the distinct (partkey, suppkey) pairs
    observed in lineitem, and the complaint exclusion is the
    deterministic negative-balance rule.

    Scale: the distinct-pair reduction is the one fact-sized shuffle
    (map-side partial distinct collapses each partition to the pair
    space first); the excluded-supplier set and the filtered part
    dimension both broadcast (anti-join + inner join); the final
    COUNT(DISTINCT) groups a pair-sized relation by part attributes.

    Hash parity: integer counts only.
    """
    pairs = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 14, 23, 45)
    ).select(
        "p_partkey", "p_brand", "p_type", F.col("p_size").cast("int")
    )
    return (
        pairs.join(
            F.broadcast(bad),
            pairs.l_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt")
        )
    )
