"""UDF-surface demos agree with their pure-expression equivalents
(SURVEY.md §2.11: register one demonstration of each, tested — not in
``queries()``)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreducepy_spark import udf as U
from mapreducepy_spark.io import load


def test_scalar_pandas_udf_runs(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = docs.select("doc_id", U.quality_score_udf("text").alias("q")).toPandas()
    assert len(out) == docs.count()
    assert ((out["q"] >= 0) & (out["q"] <= 1)).all()


def test_grouped_agg_udaf_matches_expression(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    got = (
        li.groupBy("l_returnflag")
        .agg(U.geometric_mean("l_extendedprice").alias("gm"))
        .toPandas()
        .set_index("l_returnflag")["gm"]
        .to_dict()
    )
    want = (
        li.groupBy("l_returnflag")
        .agg(F.exp(F.avg(F.log("l_extendedprice"))).alias("gm"))
        .toPandas()
        .set_index("l_returnflag")["gm"]
        .to_dict()
    )
    assert set(got) == set(want)
    for k in got:
        assert math.isclose(got[k], want[k], rel_tol=1e-9)


def test_mapinpandas_mapper_matches_posexplode(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    got = U.explode_tokens(docs)
    want = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).filter(F.col("token") != "")
    assert got.count() == want.count()
    assert (
        got.groupBy("token").count().orderBy("token").collect()
        == want.groupBy("token").count().orderBy("token").collect()
    )


def test_applyinpandas_reducer_zscores(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    out = U.zscore_per_group(li).toPandas()
    assert len(out) == li.count()
    by_flag = out.groupby("l_returnflag")["price_z"]
    # z-scores: mean ≈ 0, sd ≈ 1 within every group
    assert (by_flag.mean().abs() < 1e-9).all()
    assert ((by_flag.std(ddof=1) - 1).abs() < 1e-9).all()


def test_udtf_ngrams_lateral_join(spark, sf_dir):
    """UDTF registered as a SQL table function; LATERAL join fans each
    doc into its bigrams. Row counts must match the expression-side
    formula max(0, n_tokens - 1) summed over docs."""
    import pyspark.sql.functions as F

    from mapreducepy_spark.io import load
    from mapreducepy_spark.udf import NGramsUDTF

    assert NGramsUDTF is not None
    spark.udtf.register("ngrams", NGramsUDTF)
    docs = load(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("docs_udtf")
    got = spark.sql(
        "SELECT d.doc_id, g.ngram, g.pos "
        "FROM docs_udtf d, LATERAL ngrams(d.text, 2) g"
    )
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    want = docs.select(
        F.sum(F.greatest(n_tokens - 1, F.lit(0))).alias("n")
    ).collect()[0]["n"]
    assert got.count() == want
    # spot-check one doc's first bigram is its first two tokens
    row = docs.select("doc_id", "text").first()
    first = [t for t in row["text"].split(" ") if t][:2]
    got_first = got.filter(
        (F.col("doc_id") == row["doc_id"]) & (F.col("pos") == 0)
    ).collect()
    if len(first) == 2:
        assert got_first[0]["ngram"] == " ".join(first)
