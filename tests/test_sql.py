"""SQL entry point: for every dialect-portable query, the oracle SQL
text run through ``spark.sql`` must equal the DataFrame builder —
one semantic definition, two APIs, zero drift."""

from __future__ import annotations

import pytest

from mapreducepy_spark import sql as engine_sql
from mapreducepy_spark.registry import load_catalog

from .parity_util import canon_frame

CATALOG = load_catalog()


@pytest.mark.parametrize("name", engine_sql.PORTABLE)
def test_sql_twin_matches_dataframe_builder(name, spark, sf_dir):
    got = engine_sql.run_sql(spark, sf_dir, name).toPandas()
    want = CATALOG[name].builder(spark, sf_dir).toPandas()
    assert canon_frame(got) == canon_frame(want), name


def test_non_portable_raises(spark, sf_dir):
    with pytest.raises(KeyError):
        engine_sql.run_sql(spark, sf_dir, "text_stats")


def test_key_order_covers_registry_exactly():
    """_KEY_ORDER is evidence policy (drives the driver's bounded
    correctness run) — a registered key missing from it silently lands
    at the tail, so keep the two sets identical and duplicate-free."""
    from mapreducepy_spark import registry

    assert len(registry._KEY_ORDER) == len(set(registry._KEY_ORDER))
    assert set(registry._KEY_ORDER) == set(CATALOG)
    assert list(CATALOG) == list(registry._KEY_ORDER)


def test_load_catalog_raises_on_unordered_key(monkeypatch):
    """load_catalog must fail LOUD when a registered key is missing
    from _KEY_ORDER (round-2 postmortem: silent alphabetical-tail
    fallback shipped five operators with zero oracle evidence)."""
    from mapreducepy_spark import registry

    ghost = registry.Query(name="zz_ghost", builder=lambda s, d: None, oracle=None)
    monkeypatch.setitem(registry.REGISTRY, "zz_ghost", ghost)
    with pytest.raises(RuntimeError, match="zz_ghost"):
        registry.load_catalog()


def test_load_catalog_raises_on_phantom_key(monkeypatch):
    """...and equally when _KEY_ORDER names a key nobody registered
    (typo guard for the rotation itself)."""
    from mapreducepy_spark import registry

    monkeypatch.setattr(
        registry, "_KEY_ORDER", registry._KEY_ORDER + ("zz_phantom",)
    )
    with pytest.raises(RuntimeError, match="zz_phantom"):
        registry.load_catalog()


def test_migration_doc_counts_match_code():
    """docs/migration.md states the PORTABLE and catalog key counts in
    prose; both have drifted silently before (ADVICE r7: '45' survived
    two catalog growths while PORTABLE reached 71). Derive both from
    code so the doc can't lie."""
    import pathlib

    from mapreducepy_spark import sql

    doc = (
        pathlib.Path(__file__).resolve().parent.parent
        / "docs"
        / "migration.md"
    ).read_text()
    assert f"{len(sql.PORTABLE)} of the catalog" in doc
    assert f"all {len(CATALOG)} registered" in doc
