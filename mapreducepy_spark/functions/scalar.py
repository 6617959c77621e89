"""Scalar function surface (SURVEY.md §2.8) — one showcase query per
family. Everything here is a built-in Catalyst expression (JVM-side,
whole-stage codegen) — the fast path the engine keeps UDFs off of.

Cross-engine notes baked into the oracles:
- Spark ``length``/``year``/``floor`` return INT/LONG while DuckDB
  returns BIGINT/DOUBLE — explicit CASTs align dtypes.
- transcendentals (ln/exp/pow) are not bit-identical across libm
  implementations → (floor((…) * 1000000.0 + 0.5) / 1000000.0) on both sides.
- epoch seconds via integer ``unix_micros``/``epoch_us`` (float
  epochs lose µs precision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from ..rounding import dround

_ORACLE_FN_STRING = """
SELECT p_partkey,
       lower(p_name) AS name_lower,
       upper(p_brand) AS brand_upper,
       substring(p_type, 1, 5) AS type_prefix,
       concat_ws('-', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
       string_split(p_name, ' ')[1] AS first_word,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
       CAST(length(p_name) AS BIGINT) AS name_len,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
FROM part
"""


@register("fn_string", _ORACLE_FN_STRING, tags=("functions",))
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — string functions: case, substring, concat, split,
    regex extract, length, padding."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("-", F.col("p_brand"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


_ORACLE_FN_DATE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(month(o_orderdate) AS INT) AS order_month,
       CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
       date_trunc('month', o_orderdate) AS order_month_start,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since_epoch_start,
       epoch_us(o_orderdate) AS order_us,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date
FROM orders
"""


@register("fn_date", _ORACLE_FN_DATE, tags=("functions",))
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — date/time functions over ``o_orderdate`` (timestamp[ms])."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
        F.unix_micros(F.col("o_orderdate")).alias("order_us"),
        # DATE-typed outputs canonicalize differently across pandas
        # bridges → serialize as ISO string on both sides.
        F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
    )


_ORACLE_FN_MATH = """
SELECT l_orderkey, l_linenumber,
       (floor((l_extendedprice) * 10.0 + 0.5) / 10.0) AS price_r1,
       CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct_floor,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       (floor((abs(l_quantity - 25.0)) * 1000000.0 + 0.5) / 1000000.0) AS qty_dev,
       (floor((sqrt(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0) AS price_sqrt,
       (floor((power(l_discount, 2)) * 10000000000.0 + 0.5) / 10000000000.0) AS disc_sq,
       (floor((ln(l_extendedprice + 1)) * 1000000.0 + 0.5) / 1000000.0) AS price_ln,
       (floor((exp(l_discount)) * 1000000.0 + 0.5) / 1000000.0) AS disc_exp,
       CAST(l_quantity AS BIGINT) % 5 AS qty_mod5
FROM lineitem
"""


@register("fn_math", _ORACLE_FN_MATH, tags=("functions",))
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — math functions: round/floor/ceil/abs/sqrt/pow/ln/exp/mod."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround("l_extendedprice", 1).alias("price_r1"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
        dround(F.abs(F.col("l_quantity") - 25.0), 6).alias("qty_dev"),
        dround(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        dround(F.pow("l_discount", F.lit(2)), 10).alias("disc_sq"),
        dround(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        dround(F.exp("l_discount"), 6).alias("disc_exp"),
        (F.col("l_quantity").cast("bigint") % 5).alias("qty_mod5"),
    )


_ORACLE_FN_ARRAY = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       (floor((CAST(embedding[1] AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) AS first_val,
       (floor((CAST(list_max(embedding) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) AS max_val,
       (floor((list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1000000.0 + 0.5) / 1000000.0) AS norm_sq
FROM embeddings
"""


@register("fn_array", _ORACLE_FN_ARRAY, tags=("functions", "array"))
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — array functions over the 64-dim ``embedding`` column:
    size, element access, max, and a fold (squared L2 norm).

    The fold (``aggregate``) is the same JVM-side expression the
    similarity ops (L3) build dot products from — element order is
    identical on both engines, so the double sums are bit-stable.
    """
    emb = load(spark, sf_dir, "embeddings")
    norm_sq = F.expr(
        "aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), "
        "cast(0 as double), (acc, x) -> acc + x)"
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        dround(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        dround(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        dround(norm_sq, 6).alias("norm_sq"),
    )


_ORACLE_FN_CONDITIONAL = """
SELECT event_id,
       COALESCE(json_extract_string(props, '$.missing_key'), 'absent') AS k_or_default,
       NULLIF(event_type, 'view') AS non_view_type,
       CASE WHEN value > 50 THEN 'big' WHEN value > 10 THEN 'mid' ELSE 'small' END AS value_band,
       (json_extract_string(props, '$.k') IS NULL) AS k_missing
FROM events
"""


@register("fn_conditional", _ORACLE_FN_CONDITIONAL, tags=("functions",))
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — null-handling / branching: coalesce, nullif, CASE, IS NULL."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    return e.select(
        "event_id",
        F.coalesce(
            F.get_json_object(F.col("props"), "$.missing_key"), F.lit("absent")
        ).alias("k_or_default"),
        F.nullif(F.col("event_type"), F.lit("view")).alias("non_view_type"),
        F.when(F.col("value") > 50, "big")
        .when(F.col("value") > 10, "mid")
        .otherwise("small")
        .alias("value_band"),
        k.isNull().alias("k_missing"),
    )


_ORACLE_FN_JSON = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       (floor((AVG(value)) * 1000000.0 + 0.5) / 1000000.0) AS avg_value
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY 1
"""


@register("fn_json", _ORACLE_FN_JSON, tags=("functions", "json"))
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — JSON extraction feeding an aggregation (bucket by the
    extracted value)."""
    e = load(spark, sf_dir, "events")
    k_int = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        e.filter(k_int.isNotNull())
        .groupBy((k_int % 5).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.avg("value"), 6).alias("avg_value"),
        )
    )


_ORACLE_FN_LEVENSHTEIN = """
SELECT n.n_name,
       r.r_name,
       CAST(levenshtein(n.n_name, r.r_name) AS INT) AS edit_dist
FROM nation n
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE levenshtein(n.n_name, r.r_name) <= 10
"""


@register("fn_levenshtein", _ORACLE_FN_LEVENSHTEIN, tags=("functions", "string"))
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance as a fuzzy-match predicate (the scalar behind
    typo-tolerant entity matching; pairs with distance ≤ threshold).

    Scale: levenshtein is O(len²) per pair — never run it on a
    cartesian space. Here it rides an equi-join; the blocking-key
    pattern (join on a cheap key, THEN edit-distance the survivors)
    is the production shape.
    """
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    dist = F.levenshtein("n_name", "r_name")
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .filter(dist <= 10)
        .select("n_name", "r_name", dist.cast("int").alias("edit_dist"))
    )


# Patterns kept to the RE2 ∩ java.util.regex common subset (character
# classes, quantifiers, anchors, one capture group) — Spark compiles
# Java regex, DuckDB compiles RE2; lookaround/backrefs would diverge.
_ORACLE_FN_REGEX = """
SELECT doc_id,
       source,
       CAST(NULLIF(regexp_extract(source, 'src([0-9]+)', 1), '') AS INT)
           AS src_num,
       CAST(regexp_matches(source, 'src1[0-9]$') AS INT) AS is_teen_src,
       CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS n_vowel_runs,
       regexp_replace(substr(text, 1, 40), '[aeiou]', '*', 'g') AS masked_prefix
FROM documents
"""


@register("fn_regex", _ORACLE_FN_REGEX, tags=("functions", "regex"))
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — regular-expression family: capture-group extract, boolean
    match, match-all count, and global replace (the scalar toolkit
    behind log parsing and PII masking passes).

    Scale: all four are narrow per-row projections inside one
    whole-stage-codegen span — zero shuffle, and the regexes compile
    once per task, not per row.
    """
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "source",
        # regexp_extract returns '' (not NULL) on a non-matching row
        # in BOTH engines, and ANSI CAST('' AS INT) then kills the
        # job — NULLIF first, so unparseable sources yield NULL
        # (found by the adversarial NULL-sweep; fixture sources all
        # happen to match, real logs won't)
        F.nullif(
            F.regexp_extract("source", r"src([0-9]+)", 1), F.lit("")
        ).cast("int").alias("src_num"),
        F.col("source").rlike(r"src1[0-9]$").cast("int").alias("is_teen_src"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[aeiou]+"), 0))
        .cast("bigint")
        .alias("n_vowel_runs"),
        F.regexp_replace(F.substring("text", 1, 40), r"[aeiou]", "*").alias(
            "masked_prefix"
        ),
    )


_ORACLE_FN_BITWISE = """
SELECT o_orderkey,
       o_orderkey & 255 AS and_mask,
       o_orderkey | 4096 AS or_mask,
       xor(o_orderkey, CAST(floor(o_custkey) AS BIGINT)) AS xor_cust,
       o_orderkey << 2 AS shl2,
       o_orderkey >> 3 AS shr3,
       CAST(bit_count(o_orderkey) AS INT) AS popcount
FROM orders
WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
  AND o_orderkey >= 0
"""


@register("fn_bitwise", _ORACLE_FN_BITWISE, tags=("functions",))
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family completion — bitwise AND/OR/XOR/shift/popcount over
    BIGINT keys. Not a toy: these are the primitives the engine's
    own hash-sharding keys ride on (the bucket masks in sim_ann_lsh,
    the packed node ids in operators/graph.py, shard selectors like
    ``key & (n-1)``), surfaced as a user-facing query family.

    Scale: pure narrow projection — whole-stage-codegen'd JVM
    expressions, zero shuffles. NULL keys are excluded by contract
    (a NULL operand propagates NULL through every bit op on both
    engines anyway; the filter keeps the key's intent explicit).

    Hash parity: all-int in, all-int out — BIGINT two's-complement
    semantics agree across engines for non-negative keys; shifts are
    within-range (orderkeys < 2^61). NEGATIVE keys are excluded BY
    CONTRACT on both sides: the engines genuinely disagree there —
    DuckDB raises Out of Range on `<< ` of a negative number while
    Spark's shiftleft wraps two's-complement (found by the
    negative-orderkey sweep row) — so the portable surface of this
    family is the non-negative domain, stated in the predicate
    instead of left to crash on one engine only. Production shard
    selectors apply these ops to HASHED (non-negative) values anyway.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey").isNotNull()
        & F.col("o_custkey").isNotNull()
        & (F.col("o_orderkey") >= 0)
    )
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("and_mask"),
        k.bitwiseOR(F.lit(4096)).alias("or_mask"),
        # floor→cast, not a bare cast: an ingest upstream may have
        # widened the key to DOUBLE (the adversarial fixture does),
        # and bare double→int casts TRUNCATE on Spark but ROUND on
        # DuckDB — floor first makes both exact on integral keys
        k.bitwiseXOR(F.floor(F.col("o_custkey")).cast("bigint"))
        .alias("xor_cust"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).cast("int").alias("popcount"),
    )


# URL construction rule — both engines mint the SAME url string from
# the row (the pii.py injection precedent), then Spark's parse_url
# must recover exactly the components the rule planted (the oracle
# predicts them from the rule; the parser never sees it).
_URL_SQL = (
    "'https://' || lower(source) || '.example.com/docs/' || "
    "CAST(doc_id AS STRING) || '?lang=' || lang || '&v=2'"
)

_ORACLE_FN_URL = f"""
SELECT doc_id,
       {_URL_SQL} AS url,
       lower(source) || '.example.com' AS host,
       '/docs/' || CAST(doc_id AS STRING) AS path,
       'lang=' || lang || '&v=2' AS query,
       lang AS lang_param
FROM documents
WHERE doc_id IS NOT NULL AND source IS NOT NULL AND lang IS NOT NULL
"""


@register("fn_url", _ORACLE_FN_URL, tags=("functions", "url"))
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-family, URL functions — HOST / PATH / QUERY / named query
    parameter via ``parse_url``: the primitives a web-crawl pipeline
    needs before host-level dedup, robots grouping, or per-domain
    quotas. The URL is minted from the row by a deterministic rule
    (same text on both engines); Spark PARSES it back with the real
    parser while the oracle PREDICTS the components from the rule —
    a parser that mishandles the scheme, the query separator, or
    parameter extraction breaks the hash.

    Scale: pure narrow projection, codegen'd JVM expressions, no
    shuffle. Rows with a NULL component are excluded by contract (a
    NULL anywhere makes the whole minted URL NULL on both engines,
    while the oracle's predicted components would not all be NULL —
    the filter keeps the contract honest instead of leaning on NULL
    propagation asymmetry).
    """
    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
        & F.col("source").isNotNull()
        & F.col("lang").isNotNull()
    )
    url = F.expr(_URL_SQL)
    return docs.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


# --- calendar/interval arithmetic ------------------------------------

_ORACLE_FN_INTERVAL = """
SELECT o_orderkey,
       CAST((o_orderdate + INTERVAL 3 MONTH) AS DATE)::VARCHAR
           AS plus_3_months,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE)::VARCHAR
           AS month_end,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(date_trunc('quarter', o_orderdate) AS DATE)::VARCHAR
           AS qtr_start,
       CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
FROM orders
"""


@register("fn_interval", _ORACLE_FN_INTERVAL, tags=("functions",))
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar/interval arithmetic beyond ``fn_date``'s extraction
    surface: month addition WITH end-of-month clamping (Jan 31 + 3 →
    Apr 30 — the billing-cycle semantics naive day arithmetic gets
    wrong), last-day-of-month, quarter number + quarter start, ISO
    week, and day-of-week.

    Cross-engine shims, probed empirically: Spark ``add_months`` and
    DuckDB ``+ INTERVAL n MONTH`` clamp identically (incl. leap
    years); ``weekofyear`` is ISO on both; ``dayofweek`` is
    Sunday=1 on Spark but Sunday=0 on DuckDB, so the oracle adds 1.
    DATE outputs serialize as ISO strings (the fn_date convention).

    Scale: stateless projection — whole-stage codegen, no shuffle.
    """
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).cast("string").alias("plus_3_months"),
        F.last_day(d).cast("string").alias("month_end"),
        F.quarter(d).cast("int").alias("qtr"),
        F.trunc(d.cast("date"), "quarter").cast("string").alias("qtr_start"),
        F.weekofyear(d).cast("int").alias("iso_week"),
        F.dayofweek(d).cast("int").alias("dow"),
    )
