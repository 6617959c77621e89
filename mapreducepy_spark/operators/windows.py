"""Window functions (SURVEY.md §2.5).

MapReduce origin: secondary sort (shuffle on partition key, sort
values in the reducer). Spark's ``WindowExec`` does exactly that —
one shuffle on ``partitionBy`` + in-partition sort — so every window
below names explicit, total orderings (deterministic tie-breaks are a
hash-parity requirement, SURVEY.md §4.3 item 3).

Scale: windows partitioned by a real key (custkey/user_id)
parallelize across executors. Beware windows with NO partitionBy —
they serialize onto one task; none are used here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load
from ..registry import register
from ..rounding import dround

_ORACLE_WIN_RANK = """
SELECT c_custkey, o_orderkey, o_totalprice, rnk, rn
FROM (
    SELECT o.o_custkey AS c_custkey, o.o_orderkey, o.o_totalprice,
           RANK() OVER w AS rnk,
           ROW_NUMBER() OVER w AS rn
    FROM orders o
    WINDOW w AS (PARTITION BY o.o_custkey
                 ORDER BY o.o_totalprice DESC NULLS LAST, o.o_orderkey ASC)
) t
WHERE rnk <= 3
"""


@register("win_rank", _ORACLE_WIN_RANK, tags=("window",))
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 — rank / row_number per partition: top-3 orders by price
    per customer."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rnk") <= 3)
    )


_ORACLE_WIN_RUNNING = """
SELECT o_custkey, o_orderkey,
       (floor((SUM(o_totalprice) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )) * 100.0 + 0.5) / 100.0) AS running_spend,
       (floor((AVG(o_totalprice) OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       )) * 10000.0 + 0.5) / 10000.0) AS moving_avg_3
FROM orders
"""


@register("win_running", _ORACLE_WIN_RUNNING, tags=("window",))
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — running sum + 3-row moving average per customer.

    Determinism: the frame order (orderdate, orderkey) is total, so
    both engines add the same doubles in the same sequence —
    bit-identical prefixes; ROUND is belt-and-braces.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_first(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        dround(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        dround(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias(
            "moving_avg_3"
        ),
    )


_ORACLE_WIN_LEAD_LAG = """
SELECT event_id, user_id, ts,
       LAG(event_id) OVER w AS prev_event_id,
       date_diff('microsecond', LAG(ts) OVER w, ts) AS gap_us
FROM events
WINDOW w AS (PARTITION BY user_id
             ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST)
"""


@register("win_lead_lag", _ORACLE_WIN_LEAD_LAG, tags=("window",))
def win_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — lag/lead: time since the user's previous event.

    The gap is computed in integer microseconds (``unix_micros``)
    because the fixture ``ts`` is ns-precision parquet truncated to
    µs by both engines — integer math sidesteps float epoch issues.
    The event_id tie-break is pinned NULLS FIRST on both engines
    (Spark's ASC default vs DuckDB's NULLS LAST — the r5 sweep's
    NULL-id-at-equal-ts rows diverged here before the pin).
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc_nulls_first()
    )
    prev_ts = F.lag("ts").over(w)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_id").over(w).alias("prev_event_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)).alias("gap_us"),
    )


_ORACLE_WIN_NTILE = """
SELECT c_custkey, c_acctbal,
       NTILE(4) OVER (ORDER BY c_acctbal ASC NULLS FIRST, c_custkey ASC) AS wealth_quartile
FROM customer
"""


@register("win_ntile", _ORACLE_WIN_NTILE, tags=("window",))
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 — ntile quartiles over account balance.

    Scale: a bare ``NTILE(4) OVER (ORDER BY ...)`` serializes every
    customer through one task. This runs the distributed two-level
    rank instead (``operators.prefix``, the ``range_partition_plan``
    shape): value-range shards on acctbal → shard-local rank windows
    in parallel → constant-sized shard offsets via broadcast join;
    the tile is then EXACT integer algebra from (global rank, total)
    — ``ntile_from_rank`` reproduces the builtin bit-for-bit, so the
    oracle keeps the plain NTILE text.
    """
    from .prefix import ntile_from_rank, with_global_prefix

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked = with_global_prefix(
        c,
        "c_acctbal",
        [F.col("c_acctbal").asc_nulls_first(), F.col("c_custkey").asc()],
        count_as="rows_before",
        total_count_as="n_total",
    )
    return ranked.select(
        "c_custkey",
        "c_acctbal",
        ntile_from_rank(
            F.col("rows_before") + 1, F.col("n_total"), 4
        ).alias("wealth_quartile"),
    )


_ORACLE_WIN_DIST = """
SELECT o_custkey, o_orderkey,
       (floor((PERCENT_RANK() OVER w) * 1000000.0 + 0.5) / 1000000.0) AS pct_rank,
       (floor((CUME_DIST() OVER w) * 1000000.0 + 0.5) / 1000000.0) AS cume,
       NTILE(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_totalprice ASC NULLS FIRST, o_orderkey ASC)
"""


@register("win_dist", _ORACLE_WIN_DIST, tags=("window",))
def win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W4 completion — distribution ranks (percent_rank,
    cume_dist) alongside ntile, same one-shuffle window exec as
    every other ``win_*`` (total order ⇒ deterministic)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").asc_nulls_first(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        dround(F.percent_rank().over(w), 6).alias("pct_rank"),
        dround(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


_ORACLE_WIN_RANGE_FRAME = """
SELECT event_id, user_id,
       (floor((SUM(value) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts) ASC
           RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW
       )) * 100.0 + 0.5) / 100.0) AS trailing_10min_value
FROM events
"""


@register("win_range_frame", _ORACLE_WIN_RANGE_FRAME, tags=("window", "range"))
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 completion — RANGE (value-based) frame: each event's
    trailing-10-minute value sum per user. Unlike a ROWS frame the
    bound is on the ORDER VALUE (µs epoch), so gaps and ties are
    handled by time, not row position — and tie rows share a frame,
    which keeps the result deterministic without a row tie-break.

    Scale: same single-shuffle WindowExec as every window; the frame
    just changes the in-partition scan bounds.
    """
    from ..io import load as _load

    e = _load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts").asc())
        .rangeBetween(-600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        dround(F.sum("value").over(w), 2).alias("trailing_10min_value"),
    )


_ORACLE_WIN_FIRST_LAST = """
SELECT DISTINCT
       o_custkey AS custkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_ok,
       LAST_VALUE(o_orderkey) OVER w AS last_ok,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_ok,
       FIRST_VALUE(o_orderdate) OVER w AS first_date,
       LAST_VALUE(o_orderdate) OVER w AS last_date,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_orders
FROM orders
WINDOW w AS (
    PARTITION BY o_custkey
    ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC NULLS LAST
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


@register("win_first_last", _ORACLE_WIN_FIRST_LAST, tags=("window",))
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W-family completion — FIRST_VALUE / LAST_VALUE / NTH_VALUE
    with an explicit full-partition frame: per customer, the first,
    last and second order of their history in one pass (the
    customer-lifecycle card: acquisition order, latest order, the
    repeat-purchase probe). One row per customer.

    The frame is the POINT: the default window frame with an ORDER
    BY is unbounded-preceding→CURRENT ROW, under which LAST_VALUE
    degenerates to "this row" and NTH_VALUE(2) is NULL until row 2 —
    on BOTH engines. Pinning ROWS UNBOUNDED PRECEDING→UNBOUNDED
    FOLLOWING makes all three functions read the whole partition,
    and the total order (date, orderkey) makes them deterministic.

    Scale: one shuffle on the customer key; the unbounded frame is
    O(1) state per partition pass (Spark evaluates it as a single
    buffered frame). The DISTINCT collapse rides the same
    partitioning — no second exchange.
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(
            F.col("o_orderdate").asc_nulls_last(),
            F.col("o_orderkey").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("custkey"),
            F.first("o_orderkey").over(w).alias("first_ok"),
            F.last("o_orderkey").over(w).alias("last_ok"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
            F.first("o_orderdate").over(w).alias("first_date"),
            F.last("o_orderdate").over(w).alias("last_date"),
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_orders"),
        )
        .distinct()
    )


# --- rolling median over a bounded frame -----------------------------

# Neither engine's windowed median/percentile builtin shares an
# interpolation formula with the other (the agg_quantile_cont
# finding), so both sides materialize the ≤7-element frame as a
# sorted list and run the SAME type-7 algebra on it: h = (n−1)·0.5+1,
# lo = arr[⌊h⌋], hi = arr[⌊h⌋+1] (NULL out of bounds ⇒ lo), result =
# lo + (h−⌊h⌋)·(hi−lo). With n ≤ 7 the fraction is exactly 0 or 0.5,
# so the interpolation is bit-identical by construction.
_MED_FRAME = 7  # current row + 6 preceding

_ORACLE_WIN_ROLLING_MEDIAN = f"""
WITH framed AS (
    SELECT event_id, user_id,
           -- median over OBSERVED values: frame membership is by ROW
           -- (NULL-value rows occupy a slot) but NULLs are filtered
           -- before sorting — DuckDB's list() keeps NULLs while
           -- Spark's collect_list drops them (adversarial sweep);
           -- NULLS FIRST pins the tie order where event_id is NULL
           -- (ts, event_id) is NOT unique (the adversarial fixture
           -- carries duplicate event_ids at one ts with different
           -- values — ADVICE r7), and with a ROWS frame, membership
           -- among order-ties is physical row order: value joins the
           -- ORDER BY so the frame is pinned by data, not file layout
           list_sort(list_filter(list(value) OVER (
               PARTITION BY user_id
               ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST,
                        value ASC NULLS FIRST
               ROWS BETWEEN {_MED_FRAME - 1} PRECEDING AND CURRENT ROW
           ), x -> x IS NOT NULL)) AS arr
    FROM events
),
ranked AS (
    SELECT event_id, user_id, arr,
           CAST(len(arr) - 1 AS DOUBLE) * 0.5 + 1.0 AS h
    FROM framed
)
SELECT event_id, user_id,
       (floor((arr[CAST(floor(h) AS BIGINT)]
               + (h - floor(h))
                 * (COALESCE(arr[CAST(floor(h) AS BIGINT) + 1],
                             arr[CAST(floor(h) AS BIGINT)])
                    - arr[CAST(floor(h) AS BIGINT)]))
              * 1000000.0 + 0.5) / 1000000.0) AS med7
FROM ranked
"""


@register(
    "win_rolling_median", _ORACLE_WIN_ROLLING_MEDIAN,
    tags=("window", "quantile"),
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median of the last 7 event values per user — the
    robust-smoothing window every monitoring pipeline wants and no
    engine pair computes compatibly out of the box (windowed
    percentile builtins disagree on interpolation, the
    ``agg_quantile_cont`` finding applied to frames). Both engines
    sort the materialized ≤7-element frame and run the same explicit
    type-7 algebra, so the result is bit-identical by construction.

    Scale: ONE user-keyed shuffle; per-row state is the bounded
    frame (7 values — collect over an UNBOUNDED frame would be the
    anti-pattern; this is O(frame) per row at any corpus size). The
    sort key includes ``value`` because (ts, event_id) is NOT unique
    (adversarial fixture: duplicate event_ids at one ts with
    different values — ADVICE r7): a ROWS frame decides order-ties
    by physical row order, so without the value pin frame membership
    — and the answer — would depend on file layout / partitioning.
    With the pin, frames of fully-identical rows are interchangeable
    and the result is partitioning-independent.

    Hash parity: sorted frame values are data; h and the
    interpolation are identical IEEE ops (fraction exactly 0 or 0.5
    for n ≤ 7); rounded to 1e-6.
    """
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc_nulls_first(),
            F.col("event_id").asc_nulls_first(),
            F.col("value").asc_nulls_first(),
        )
        .rowsBetween(-(_MED_FRAME - 1), Window.currentRow)
    )
    framed = e.select(
        "event_id",
        "user_id",
        F.sort_array(F.collect_list("value").over(w)).alias("arr"),
    )
    # empty frame (every value in the window NULL) ⇒ NULL median on
    # both sides: lo indexes out of range ⇒ NULL propagates
    h = (F.size("arr") - 1).cast("double") * F.lit(0.5) + F.lit(1.0)
    lo_idx = F.floor(h).cast("long")  # 1-based
    lo = F.get("arr", (lo_idx - 1).cast("int"))
    hi = F.coalesce(F.get("arr", lo_idx.cast("int")), lo)
    med = lo + (h - F.floor(h)) * (hi - lo)
    return framed.select(
        "event_id",
        "user_id",
        (
            F.floor(med * F.lit(1_000_000.0) + F.lit(0.5))
            / F.lit(1_000_000.0)
        ).alias("med7"),
    )


# --- cumulative distinct via first-occurrence flags -------------------

# COUNT(DISTINCT) over a running frame is unsupported in both engines
# (the events_dau_rolling finding); the standard rewrite marks each
# (user, event_type)'s FIRST occurrence with one row_number window,
# then a running SUM of the 0/1 flag is the cumulative distinct count
# — two windows, both partitioned under user_id, one exchange.
# value joins BOTH order keys: (ts, event_id) is not unique (the
# adversarial dup-id pair), and with ROWS frames the flag placement
# AND the running-sum frame would otherwise decide ties by physical
# row order — the same hazard ADVICE r7 proved on win_rolling_median.
_ORACLE_WIN_CUM_DISTINCT = """
WITH flagged AS (
    SELECT event_id, user_id, ts, event_type, value,
           CASE WHEN ROW_NUMBER() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST,
                             event_type ASC NULLS FIRST, value ASC NULLS FIRST
                ) = 1 THEN 1 ELSE 0 END AS is_first
    FROM events
)
SELECT event_id, user_id,
       CAST(SUM(is_first) OVER (
           PARTITION BY user_id
           ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST,
                    event_type ASC NULLS FIRST, value ASC NULLS FIRST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_types_seen
FROM flagged
"""


@register(
    "win_cum_distinct", _ORACLE_WIN_CUM_DISTINCT, tags=("window",)
)
def win_cum_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct event types seen per user as of each event
    — the "breadth of engagement over time" curve. A running
    COUNT(DISTINCT) frame is unsupported in both engines, so the
    first occurrence of each (user, type) is flagged with one
    row_number window and a running sum of the flag does the
    counting — O(1) window state instead of a per-row distinct set.

    Scale: the explicit user repartition lets BOTH windows (the
    (user, type) flagger — user-hash co-locates every subset key —
    and the user running sum) ride ONE exchange; two in-partition
    sorts, no join, no set-valued state.

    Hash parity: integer flags and counts; ordering pinned by the
    unique (ts, event_id) pair.
    """
    e = load(spark, sf_dir, "events").repartition("user_id")
    # value joins both order keys — (ts, event_id) is not unique
    # (adversarial dup-id pair) and ROWS-frame tie placement would
    # otherwise follow physical row order (the ADVICE r7 hazard)
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc_nulls_first(),
        F.col("event_id").asc_nulls_first(),
        F.col("event_type").asc_nulls_first(),
        F.col("value").asc_nulls_first(),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc_nulls_first(),
            F.col("event_id").asc_nulls_first(),
            F.col("event_type").asc_nulls_first(),
            F.col("value").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            "value",
            F.when(F.row_number().over(w_first) == 1, 1)
            .otherwise(0)
            .alias("is_first"),
        )
        .select(
            "event_id",
            "user_id",
            F.sum("is_first").over(w_run).cast("bigint").alias(
                "n_types_seen"
            ),
        )
    )


# --- bounded exponential moving average -------------------------------

# α = 1/2 EXACTLY: every weight is a power of two, and scaling a
# double by 2^-k is exact in IEEE-754 (pure exponent shift) — so the
# only rounding in the whole EMA is the additions, which both engines
# run in the same index order (the _DUCK_COS sequential-fold
# discipline). An α that is not a dyadic rational would put a libm
# pow() in the hot path, where engines may differ in the last ulp.
_EMA_FRAME = 8  # current row + 7 preceding

_ORACLE_WIN_EMA = f"""
WITH framed AS (
    SELECT event_id, user_id,
           -- frame membership is by ROW (the rolling-median rule);
           -- NULL values are dropped from the fold; value joins the
           -- ORDER BY because (ts, event_id) is not unique
           list_filter(list(value) OVER (
               PARTITION BY user_id
               ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST,
                        value ASC NULLS FIRST
               ROWS BETWEEN {_EMA_FRAME - 1} PRECEDING AND CURRENT ROW
           ), x -> x IS NOT NULL) AS arr
    FROM events
),
sized AS (
    SELECT event_id, user_id, arr, len(arr) AS n FROM framed
)
SELECT event_id, user_id,
       CASE WHEN n = 0 THEN NULL ELSE
           (floor(list_sum(list_transform(range(1, n + 1),
               j -> arr[CAST(j AS BIGINT)]
                    * (CASE WHEN j = 1
                            THEN 1.0 / CAST(1 << (n - 1) AS DOUBLE)
                            ELSE 1.0 / CAST(1 << (n - j + 1) AS DOUBLE)
                       END)))
             * 1000000.0 + 0.5) / 1000000.0)
       END AS ema8
FROM sized
"""


@register("win_ema", _ORACLE_WIN_EMA, tags=("window", "smoothing"))
def win_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded exponential moving average (α = ½, last 8 observed
    values) per user — the monitoring smoother next to the rolling
    median: recency-weighted, so a level shift shows up in 1-2 events
    instead of 4. The recursion ``ema_k = (x_k + ema_{k-1})/2`` from
    a fresh start per frame has the closed form
    ``Σ_j c_j·x_j`` with ``c_1 = 2^{-(n-1)}``, ``c_j = 2^{-(n-j+1)}``
    — computed as an explicit index fold so both engines run the
    identical IEEE ops in the identical order.

    Scale: ONE user-keyed shuffle, O(frame)=8 state per row (an
    UNBOUNDED ema would be the window-unfriendly recursion; bounding
    the frame is what makes it a plain window aggregate). The total
    (ts, event_id, value) sort pins frame membership AND fold order,
    so the answer is partitioning-independent.

    Hash parity: weights are exact powers of two (exponent shifts);
    additions run in index order on both engines; 1e-6 round guards
    transport.
    """
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc_nulls_first(),
            F.col("event_id").asc_nulls_first(),
            F.col("value").asc_nulls_first(),
        )
        .rowsBetween(-(_EMA_FRAME - 1), Window.currentRow)
    )
    # collect_list drops NULLs and yields frame (= sort) order
    framed = e.select(
        "event_id", "user_id", F.collect_list("value").over(w).alias("arr")
    )
    n = F.size("arr")
    # exact 2^-k weights via a literal lookup (element k+1 = 2^-k):
    # shiftleft needs a literal bit count, and pow() would put libm
    # in the parity path — the array literals are exact doubles
    pow2 = F.array(*[F.lit(0.5**k) for k in range(_EMA_FRAME)])
    coef = lambda j: F.element_at(  # noqa: E731
        pow2,
        (F.when(j == 1, n - 1).otherwise(n - j + 1) + 1).cast("int"),
    )
    # greatest(n, 1): sequence(1, 0) would infer step -1 and emit
    # [1, 0], whose 0 index errors element_at — the n = 0 case is
    # already forced NULL by the outer branch, this just keeps the
    # unevaluated expression well-formed
    weighted = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda j: F.element_at("arr", j.cast("int")) * coef(j),
    )
    ema = F.aggregate(
        weighted, F.lit(0.0).cast("double"), lambda acc, x: acc + x
    )
    return framed.select(
        "event_id",
        "user_id",
        F.when(
            n == 0, F.lit(None).cast("double")
        ).otherwise(
            F.floor(ema * F.lit(1_000_000.0) + F.lit(0.5))
            / F.lit(1_000_000.0)
        ).alias("ema8"),
    )
