"""Change-data-capture / warehouse-maintenance operators.

The two batch shapes every lakehouse pipeline runs nightly:

- ``merge_upsert`` — MERGE a changelog onto a base snapshot
  (latest-wins per key, with delete tombstones): the Type-1 upsert.
- ``scd2_intervals`` — derive Type-2 slowly-changing-dimension
  validity intervals from a change stream (valid_from / valid_to /
  is_current per version).

Both are expressed as ONE window over the union of their inputs —
no join, a single shuffle keyed on the business key — which is the
plan that survives 100 TB: the changelog and the snapshot co-shuffle
once, per-key state is O(1) (the window carries only rank/lead), and
skewed keys are bounded by per-key change volume, not corpus size.
A MERGE implemented as base-LEFT-JOIN-changes would shuffle the base
twice (once to join, once to overwrite); the union-window form never
rewrites untouched rows' lineage.

Fixture mapping: ``customer`` is the base snapshot (account balance),
``orders`` is the changelog (each order re-states the customer's
balance as its total price; deterministic rule ``o_orderkey % 13 = 0``
marks a tombstone). Synthetic, but the operator is input-agnostic —
the rule exists so the oracle can predict inserts, updates AND
deletes from construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from ..rounding import dround, dround_sql

# A deterministic tombstone rule the oracle can re-derive: every
# 13th orderkey is a DELETE of that customer, everything else an
# UPSERT of their balance. NULL orderkeys (adversarial ingest rows)
# fall to the ELSE arm on both engines (NULL % 13 = NULL, never 0).
_TOMBSTONE_SQL = "CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END"

_ORACLE_MERGE_UPSERT = f"""
WITH unioned AS (
    SELECT c_custkey AS key,
           0 AS is_change,
           CAST(NULL AS TIMESTAMP) AS ts,
           CAST(NULL AS BIGINT) AS ck,
           c_acctbal AS balance,
           'U' AS op,
           'base' AS src
    FROM customer
    UNION ALL
    SELECT o_custkey, 1, o_orderdate, o_orderkey, o_totalprice,
           {_TOMBSTONE_SQL}, 'chg'
    FROM orders
),
ranked AS (
    SELECT *,
           ROW_NUMBER() OVER (
               PARTITION BY key
               ORDER BY is_change DESC, ts DESC NULLS LAST,
                        ck DESC NULLS LAST, balance DESC NULLS LAST,
                        op ASC
           ) AS rn,
           SUM(is_change) OVER (PARTITION BY key) AS n_changes
    FROM unioned
)
SELECT key, {dround_sql('balance')} AS balance,
       src AS last_src,
       CAST(n_changes AS BIGINT) AS n_changes
FROM ranked
WHERE rn = 1 AND op <> 'D'
"""


@register("merge_upsert", _ORACLE_MERGE_UPSERT, tags=("cdc", "merge"))
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (upsert + delete) of a changelog onto a base snapshot:
    per business key, the LATEST event wins — an 'U' change
    overwrites the base row, a 'D' tombstone removes the key, a key
    seen only in the changelog is an insert, a key never changed
    survives as its base row. Latest = (o_orderdate, o_orderkey)
    within the changelog; any change outranks the base.

    Plan: union the snapshot and the changelog, ONE window keyed on
    the business key (row_number picks the winner, a running sum
    counts applied changes), filter the tombstones. No join — the
    single shuffle is the whole MERGE, untouched base rows ride it
    exactly once, and per-key memory is O(1). Deletes are encoded as
    absence, which is what an overwrite-on-read table format wants
    from the batch job that compacts it.

    Hash parity: the winner ordering breaks every tie explicitly
    (NULLS LAST pinned on both engines — Spark's ASC default is
    nulls-first, DuckDB's is nulls-last, so defaults MUST NOT be
    relied on); balance is deterministically rounded.
    """
    unioned = base_snapshot(load(spark, sf_dir, "customer")).unionByName(
        orders_changelog(load(spark, sf_dir, "orders"))
    )
    return live_view(merge_reduce(unioned))


def base_snapshot(customer: DataFrame) -> DataFrame:
    """Customer snapshot in the unioned changelog shape (weight 0 —
    base rows never count as applied changes)."""
    return customer.select(
        F.col("c_custkey").alias("key"),
        F.lit(0).alias("is_change"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("bigint").alias("ck"),
        F.col("c_acctbal").alias("balance"),
        F.lit("U").alias("op"),
        F.lit("base").alias("src"),
        F.lit(0).cast("bigint").alias("weight"),
    )


def orders_changelog(orders: DataFrame) -> DataFrame:
    """Orders as a changelog of customer balance (weight 1 each;
    the deterministic ``_TOMBSTONE_SQL`` rule marks deletes)."""
    return orders.select(
        F.col("o_custkey").alias("key"),
        F.lit(1).alias("is_change"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("ck"),
        F.col("o_totalprice").alias("balance"),
        F.when(F.col("o_orderkey") % 13 == 0, "D")
        .otherwise("U")
        .alias("op"),
        F.lit("chg").alias("src"),
        F.lit(1).cast("bigint").alias("weight"),
    )


def merge_reduce(unioned: DataFrame) -> DataFrame:
    """The ONE latest-wins fold shared by the batch ``merge_upsert``
    and the streaming CDC apply (streaming/cdc.py): keep each key's
    winner row — tombstones INCLUDED (dropping them here would let a
    late lower-sequence 'U' resurrect a deleted key; deletes
    materialize only in ``live_view``) — plus the accumulated
    applied-change count. Because the winner is an argmax over a
    total order and the count is a sum of carried weights, the fold
    is ASSOCIATIVE and ORDER-INDEPENDENT: folding batch-by-batch
    (any split, any arrival order) equals one global fold, which is
    what the cross-batch replay test pins.
    """
    w = Window.partitionBy("key").orderBy(
        F.col("is_change").desc(),
        F.col("ts").desc_nulls_last(),
        F.col("ck").desc_nulls_last(),
        F.col("balance").desc_nulls_last(),
        F.col("op").asc(),
    )
    wall = Window.partitionBy("key")
    return (
        unioned.withColumn("rn", F.row_number().over(w))
        .withColumn("w_sum", F.sum("weight").over(wall))
        .filter(F.col("rn") == 1)
        .drop("rn", "weight")
        .withColumnRenamed("w_sum", "weight")
    )


def live_view(state: DataFrame) -> DataFrame:
    """Materialize deletes: the queryable table a reader sees over
    the merge state (tombstoned keys are absent)."""
    return state.filter(F.col("op") != "D").select(
        "key",
        dround("balance").alias("balance"),
        F.col("src").alias("last_src"),
        F.col("weight").cast("bigint").alias("n_changes"),
    )


_ORACLE_SCD2 = f"""
SELECT o_custkey AS custkey,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
       o_orderdate AS valid_from,
       LEAD(o_orderdate) OVER w AS valid_to,
       CAST(CASE WHEN LEAD(o_orderdate) OVER w IS NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS is_current,
       o_orderkey AS orderkey,
       o_orderpriority AS priority,
       {dround_sql('o_totalprice')} AS price
FROM orders
WHERE COALESCE(o_custkey % 10, 0) = 0
WINDOW w AS (
    PARTITION BY o_custkey
    ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC NULLS LAST
)
"""


@register("scd2_intervals", _ORACLE_SCD2, tags=("cdc", "scd2"))
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD interval derivation: each change event becomes a
    dimension VERSION with a half-open validity interval
    ``[valid_from, valid_to)`` — ``valid_to`` is the next version's
    start, NULL on the current row (the classic point-in-time-join
    dimension shape; ``join_asof`` is the probe that reads it).

    Plan: one window (row_number + lead share the same sort) over
    the changelog keyed on the business key — a single shuffle,
    no self-join; the naive formulation (t1 JOIN t2 ON t2.date >
    t1.date, MIN) is quadratic per key and is exactly what this
    operator replaces. At 100 TB the change stream shuffles once on
    the dimension key and every version row is emitted map-side
    after the sort.

    Hash parity: null ordering pinned on both engines (Spark asc
    defaults nulls-first, DuckDB nulls-last); is_current as 0/1
    BIGINT (portable boolean); price deterministically rounded.
    The custkey-shard predicate only bounds the catalog key's output
    volume (every order becomes a version row and the gate collects
    them); NULL custkeys stay in the kept shard via COALESCE, so the
    NULL-partition path remains exercised.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(),
        F.col("o_orderkey").asc_nulls_last(),
    )
    return load(spark, sf_dir, "orders").filter(
        F.coalesce(F.col("o_custkey") % 10, F.lit(0)) == 0
    ).select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.when(F.lead("o_orderdate").over(w).isNull(), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_current"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderpriority").alias("priority"),
        dround("o_totalprice").alias("price"),
    )


# --- point-in-time (feature-store) join over the SCD2 dimension ------

# The probe scd2_intervals' docstring promises: for each event, the
# dimension VERSION whose half-open [valid_from, valid_to) interval
# contains the event time. Because the versions TILE each key's
# timeline (valid_to = next valid_from), containment is exactly
# "latest valid_from <= ts" — the as-of backward carry — with one
# subtlety: duplicate valid_from dates create zero-length intervals
# that contain nothing, and the max-struct carry's (valid_from,
# version) order picks the HIGHEST version among the tie, which is
# precisely the row whose valid_to extends past the tie date. So the
# PIT join is join_asof's union-timeline plan probing scd2's output:
# one shuffle, no join node, O(1) state per row.

_ORACLE_JOIN_PIT = f"""
WITH v AS (
    SELECT o_custkey AS custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w AS valid_to,
           o_orderkey AS orderkey
    FROM orders
    WHERE COALESCE(o_custkey % 10, 0) = 0 AND o_custkey IS NOT NULL
    WINDOW w AS (
        PARTITION BY o_custkey
        ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC NULLS LAST
    )
),
e AS (
    SELECT event_id, user_id, ts,
           row_number() OVER (ORDER BY event_id, user_id, ts) AS rid
    FROM events
    WHERE user_id IS NOT NULL AND user_id % 10 = 0
)
SELECT event_id, user_id, ts, version, orderkey, valid_from
FROM (
    SELECT e.event_id, e.user_id, e.ts, e.rid,
           v.version, v.orderkey, v.valid_from,
           ROW_NUMBER() OVER (
               PARTITION BY e.rid ORDER BY v.version DESC NULLS LAST
           ) AS rn
    FROM e
    LEFT JOIN v
      ON e.user_id = v.custkey
     AND v.valid_from <= e.ts
     AND (v.valid_to IS NULL OR e.ts < v.valid_to)
) t
WHERE rn = 1
"""


@register("join_point_in_time", _ORACLE_JOIN_PIT, tags=("join", "asof", "cdc"))
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each event (of the SCD2-sharded users)
    picks the dimension VERSION valid at its timestamp — the
    feature-store primitive that makes training features leakage-free
    (a model must see the attribute value AS OF the event, never a
    later revision). Probes the exact version chain
    ``scd2_intervals`` emits.

    Scale: the ``join_asof`` union-timeline plan, UNCHANGED — union
    the version starts and the events on one per-user timeline,
    carry the running max(struct(valid_from, version, orderkey)),
    keep event rows. ONE shuffle, no join node, no per-event version
    fan-out; half-open tiling makes "latest start <= ts" equal to
    interval containment, and the struct order resolves zero-length
    versions (duplicate dates) to the surviving one.

    NULL semantics: NULL-ts events sort first (asc) and see an empty
    backward frame ⇒ NULL version, matching the oracle's
    ``valid_from <= NULL`` never-true; NULL-date versions are
    filtered from the timeline like join_asof's NULL-key rule.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & (F.col("user_id") % 10 == 0)
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.coalesce(F.col("o_custkey") % 10, F.lit(0)) == 0)
        & F.col("o_custkey").isNotNull()
    )
    wv = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(),
        F.col("o_orderkey").asc_nulls_last(),
    )
    versions = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.row_number().over(wv).cast("bigint").alias("version"),
        F.col("o_orderkey").alias("orderkey"),
    ).filter(F.col("t").isNotNull())
    ev = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        "ts",
        F.lit(None)
        .cast("struct<valid_from:timestamp,version:bigint,orderkey:bigint>")
        .alias("ver"),
    )
    vd = versions.select(
        "user_id",
        "t",
        F.lit(0).alias("is_event"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.struct(
            F.col("t").alias("valid_from"), "version", "orderkey"
        ).alias("ver"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("is_event").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.unionByName(vd)
        .withColumn("best", F.max("ver").over(w))
        .filter(F.col("is_event") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("best.version").alias("version"),
            F.col("best.orderkey").alias("orderkey"),
            F.col("best.valid_from").alias("valid_from"),
        )
    )


def pit_versions(orders: DataFrame) -> DataFrame:
    """The MATERIALIZED SCD2 dimension the streaming PIT twin probes:
    (custkey, version, valid_from, valid_to, orderkey) for the %10
    shard — the same version chain ``join_point_in_time`` walks with
    its join-free carry, here as the explicit table a deployment
    would persist (the dimension IS materialized in a feature store;
    only the batch backfill gets to fuse the derivation and the probe
    into one window)."""
    o = orders.filter(
        (F.coalesce(F.col("o_custkey") % 10, F.lit(0)) == 0)
        & F.col("o_custkey").isNotNull()
        & F.col("o_orderdate").isNotNull()
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(),
        F.col("o_orderkey").asc_nulls_last(),
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.col("o_orderkey").alias("orderkey"),
    )


# --- dimension churn between two point-in-time snapshots ---------------

# Two PIT lookups at literal dates over the same version chain, full-
# outer-compared per key: which dimension keys appeared, disappeared,
# changed attribute, or held steady between snapshot A and B — the
# warehouse-maintenance diff a team reads after a backfill ("how much
# of the dimension did this reload actually move?").
_SNAP_A = "1996-06-01 00:00:00"
_SNAP_B = "1999-06-01 00:00:00"


def _duck_snapshot(ts: str) -> str:
    return f"""
    SELECT custkey, orderkey
    FROM v
    WHERE valid_from <= TIMESTAMP '{ts}'
      AND (valid_to IS NULL OR TIMESTAMP '{ts}' < valid_to)
"""


_ORACLE_CDC_SNAPSHOT_DIFF = f"""
WITH v AS (
    SELECT o_custkey AS custkey,
           o_orderdate AS valid_from,
           LEAD(o_orderdate) OVER w AS valid_to,
           o_orderkey AS orderkey
    FROM orders
    WHERE COALESCE(o_custkey % 10, 0) = 0 AND o_custkey IS NOT NULL
      AND o_orderdate IS NOT NULL
    WINDOW w AS (
        PARTITION BY o_custkey
        ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC NULLS LAST
    )
),
a AS ({_duck_snapshot(_SNAP_A)}),
b AS ({_duck_snapshot(_SNAP_B)}),
j AS (
    SELECT COALESCE(a.custkey, b.custkey) AS custkey,
           a.orderkey AS ok_a, b.orderkey AS ok_b
    FROM a FULL OUTER JOIN b ON a.custkey = b.custkey
)
SELECT CASE WHEN ok_a IS NULL THEN 'appeared'
            WHEN ok_b IS NULL THEN 'disappeared'
            WHEN ok_a = ok_b THEN 'unchanged'
            ELSE 'changed' END AS class,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MIN(custkey) AS BIGINT) AS min_key,
       CAST(MAX(custkey) AS BIGINT) AS max_key
FROM j
GROUP BY 1
"""


@register(
    "cdc_snapshot_diff", _ORACLE_CDC_SNAPSHOT_DIFF, tags=("cdc", "scd2")
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension churn between two point-in-time snapshots: evaluate
    the SCD2 version chain at two literal dates and classify every
    key as appeared / disappeared / changed / unchanged — the
    reload-audit census. ("disappeared" is reachable only through
    zero-length duplicate-date versions or a NULL-bounded tail, so
    its absence is itself a signal the chain tiles cleanly.)

    Scale: the version chain derives once (one dimension-keyed
    window); each snapshot is a FILTER on it (interval containment
    at a literal — no join, no second pass over orders); the diff is
    one full-outer join of two key-sized sides, aggregated to four
    rows. At 100 TB the orders scan dominates and is shared; the
    snapshots are |keys| rows each.

    Hash parity: pure integer keys/counts; class labels from the
    identical CASE shape.
    """
    versions = pit_versions(load(spark, sf_dir, "orders"))
    # derive once, filter twice: the chain feeds both snapshots
    versions = versions.localCheckpoint()

    def snapshot(ts: str, out: str) -> DataFrame:
        return versions.filter(
            (F.col("valid_from") <= F.lit(ts).cast("timestamp"))
            & (
                F.col("valid_to").isNull()
                | (F.lit(ts).cast("timestamp") < F.col("valid_to"))
            )
        ).select("custkey", F.col("orderkey").alias(out))

    a = snapshot(_SNAP_A, "ok_a").alias("a")
    b = snapshot(_SNAP_B, "ok_b").alias("b")
    j = a.join(b, F.col("a.custkey") == F.col("b.custkey"), "full").select(
        F.coalesce(F.col("a.custkey"), F.col("b.custkey")).alias("custkey"),
        "ok_a",
        "ok_b",
    )
    cls = (
        F.when(F.col("ok_a").isNull(), "appeared")
        .when(F.col("ok_b").isNull(), "disappeared")
        .when(F.col("ok_a") == F.col("ok_b"), "unchanged")
        .otherwise("changed")
    )
    return j.groupBy(cls.alias("class")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.min("custkey").cast("bigint").alias("min_key"),
        F.max("custkey").cast("bigint").alias("max_key"),
    )
