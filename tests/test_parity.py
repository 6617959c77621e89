"""Local mirror of the driver's t2 correctness gate: every registered
query runs on Spark AND DuckDB at the test scale factor; results must
match exactly after canonicalization (see ``parity_util``)."""

from __future__ import annotations

import pytest

from mapreducepy_spark.registry import load_catalog

from .parity_util import assert_frames_match

CATALOG = load_catalog()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_parity(name, spark, oracle, sf_dir):
    q = CATALOG[name]
    sdf = q.builder(spark, sf_dir)
    spark_pd = sdf.toPandas()
    if q.oracle is None:
        # rows-only check (approx ops) — must at least run and return rows
        assert len(spark_pd) > 0, f"{name}: rows-only query returned no rows"
        return
    duck_pd = oracle.execute(q.oracle).fetchdf()
    assert_frames_match(spark_pd, duck_pd, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_cc_driver_and_distributed_agree(spark, sf_dir):
    """The driver union-find fast path and the distributed min-label
    propagation must produce the identical fixpoint."""
    from mapreducepy_spark.llm import dedup as dd

    pairs = dd._candidate_pairs(spark, sf_dir).localCheckpoint()
    a = dd._cc_driver(spark, pairs).toPandas()
    b = dd._cc_distributed(spark, pairs).toPandas()
    from .parity_util import canon_frame

    assert canon_frame(a) == canon_frame(b)


def test_sampling_deterministic_per_seed(spark, sf_dir):
    """Fixed seed ⇒ identical sample across runs; the stratified
    sampler must respect per-stratum rate ordering."""
    from mapreducepy_spark.operators.sampling import sample_fraction, sample_stratified

    a = sample_fraction(spark, sf_dir).toPandas()
    b = sample_fraction(spark, sf_dir).toPandas()
    assert len(a) > 0
    assert a.equals(b)
    strat = sample_stratified(spark, sf_dir).toPandas().set_index("lang")["n_kept"]
    from mapreducepy_spark.io import load

    full = (
        load(spark, sf_dir, "documents").groupBy("lang").count().toPandas()
        .set_index("lang")["count"]
    )
    # en downsampled to ~30%, zh kept whole
    assert strat["en"] < 0.6 * full["en"]
    assert strat["zh"] == full["zh"]
