"""Round-15-session third references: the r12 growth keys.

``text_redact`` gets an independent pure-Python recompute — the same
injection rule and detector patterns applied with the stdlib ``re``
module, per document, comparing span counts, lengths, AND the md5 of
the redacted bytes. Any drift in pattern text, chain order
(email→phone→IP), replace semantics (leftmost non-overlapping,
global), or encoding turns the fingerprint red — the mutation-audit
surface the standing recipe requires.

``dedup_incremental_indexed``'s third ref is structural (the stored
index must be VALUE-identical to the session band table) — the
triage algebra itself is shared code already third-referenced via
``dedup_incremental`` in test_round14_refs.py, so the new surface is
the index lifecycle, covered in tests/test_band_index.py.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd

from mapreducepy_spark.registry import load_catalog

CATALOG = load_catalog()


def _pq(sf_dir: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


# The injection rule and patterns, restated independently (NOT
# imported from the engine: a silent engine-side edit must diverge
# from this copy and fail here).
def _inject(doc_id: int, text: str) -> str:
    m = doc_id % 4
    if m == 0:
        return f"{text} contact user{doc_id}@example.com now"
    if m == 1:
        return f"{text} call +1-555-{1000 + doc_id % 9000} today"
    if m == 2:
        return f"{text} from 10.{doc_id % 256}.0.1 logged"
    return text


_PATTERNS = [
    (re.compile(r"[a-z0-9]+@[a-z0-9]+\.[a-z]+"), "<EMAIL>"),
    (re.compile(r"\+1-555-[0-9]{4}"), "<PHONE>"),
    (re.compile(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"), "<IP>"),
]


def test_text_redact_matches_python_re(spark, sf_dir):
    """Per-doc python-re recompute of spans, lengths, and the
    redacted-bytes md5 for EVERY document at the test SF."""
    docs = _pq(sf_dir, "documents")
    docs = docs[docs.doc_id.notna() & docs.text.notna()]
    exp = {}
    for r in docs.itertuples():
        t2 = _inject(int(r.doc_id), r.text)
        n_spans = 0
        red = t2
        for pat, repl in _PATTERNS:
            n_spans += len(pat.findall(t2))
            red = pat.sub(repl, red)
        exp[int(r.doc_id)] = (
            n_spans,
            len(t2),
            len(red),
            hashlib.md5(red.encode("utf-8")).hexdigest(),
        )
    got = CATALOG["text_redact"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(exp)
    n_redacted = 0
    for r in got.itertuples():
        e = exp[int(r.doc_id)]
        assert (
            int(r.n_spans),
            int(r.len_before),
            int(r.len_after),
            r.redact_fp,
        ) == e, r.doc_id
        n_redacted += int(r.n_spans) > 0
    # non-degeneracy: the rule plants PII in 3 of 4 residue classes,
    # and clean docs must flow through untouched
    assert n_redacted > 0
    assert any(
        v[0] == 0 and v[1] == v[2] for v in exp.values()
    ), "no clean doc in fixture — identity arm untested"


def test_text_redact_span_counting_not_fooled_by_placeholders(spark):
    """Chain-order pin on a constructed row: counting happens on the
    ORIGINAL text (an inserted <EMAIL> placeholder must not be
    re-counted or re-matched by later passes), and a doc carrying
    ALL three PII kinds at once redacts every one. Built via a tiny
    in-memory frame so the boundary case exists regardless of
    fixture content."""
    import pyspark.sql.functions as F

    from mapreducepy_spark.llm.pii import (
        _RE_EMAIL,
        _RE_IP,
        _RE_PHONE,
    )

    spark_df = spark.createDataFrame(
        [("ab1@cd2.ef call +1-555-0000 from 1.2.3.4 x",)], ["text2"]
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text2"), _RE_EMAIL, "<EMAIL>"),
            _RE_PHONE,
            "<PHONE>",
        ),
        _RE_IP,
        "<IP>",
    )
    row = spark_df.select(
        redacted.alias("red"),
        (
            F.regexp_count("text2", F.lit(_RE_EMAIL))
            + F.regexp_count("text2", F.lit(_RE_PHONE))
            + F.regexp_count("text2", F.lit(_RE_IP))
        ).alias("n"),
    ).first()
    assert row.red == "<EMAIL> call <PHONE> from <IP> x"
    assert row.n == 3


def test_with_global_prefix_matches_partitionless_window(spark):
    """The distributed two-level prefix must equal the naive
    partition-less window on a constructed frame that exercises ties
    in the leading key, NULL keys at both sort positions, descending
    order, and sums alongside counts."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from mapreducepy_spark.operators.prefix import with_global_prefix

    rows = [
        (1, 10, 3),
        (2, 10, 5),   # tie on the leading key
        (3, None, 7),  # NULL leading key
        (4, -2, 1),
        (5, 40, 2),
        (6, 40, 4),
        (7, 0, 6),
        (8, None, 8),
    ]
    df = spark.createDataFrame(rows, ["id", "k", "n"])
    for descending, nulls_last in ((False, False), (True, True)):
        korder = (
            F.col("k").desc() if descending else F.col("k").asc_nulls_first()
        )
        order = [korder, F.col("id").asc()]
        got = (
            with_global_prefix(
                df,
                "k",
                order,
                descending=descending,
                nulls_last=nulls_last,
                sums={"cum_before": "n"},
                count_as="rows_before",
                total_sums={"tot_n": "n"},
                total_count_as="tot_rows",
                shards=3,  # tiny: forces multi-row shards + ties
            )
            .orderBy(*order)
            .collect()
        )
        w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
        want = (
            df.select(
                "id",
                F.coalesce(F.sum("n").over(w), F.lit(0)).alias("cum_before"),
                F.coalesce(F.count(F.lit(1)).over(w), F.lit(0)).alias(
                    "rows_before"
                ),
            )
            .orderBy(*order)
            .collect()
        )
        assert [(r.id, r.cum_before, r.rows_before) for r in got] == [
            (r.id, r.cum_before, r.rows_before) for r in want
        ], (descending, nulls_last)
        assert all(r.tot_n == 36 and r.tot_rows == 8 for r in got)


def test_ntile_from_rank_matches_builtin(spark):
    """ntile_from_rank must reproduce F.ntile bit-for-bit across
    frame sizes around every remainder class, tiles > rows included."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from mapreducepy_spark.operators.prefix import ntile_from_rank

    for total in (1, 2, 3, 4, 5, 7, 8, 9, 100):
        for n in (2, 4, 7):
            df = spark.range(total).select(F.col("id"))
            w = Window.orderBy("id")
            got = df.select(
                "id",
                F.ntile(n).over(w).alias("builtin"),
                ntile_from_rank(
                    F.row_number().over(w), F.lit(total), n
                ).alias("formula"),
            ).collect()
            assert all(r.builtin == r.formula for r in got), (total, n)


def test_corpus_token_budget_matches_pandas_greedy(spark, sf_dir):
    """Independent pandas recompute of the greedy budget prefix:
    per-doc token/type counts (merging duplicate doc_id instances in
    the aggregate, fanning back out per instance — the engine's join
    semantics), the (n_types DESC, doc_id ASC) greedy order,
    cumulative tokens, floor(tot×0.4) cut, per-source census."""
    import math

    docs = _pq(sf_dir, "documents")
    per: dict[int, list[int]] = {}
    for r in docs.itertuples():
        if pd.isna(r.doc_id) or r.text is None:
            continue
        words = [w for w in r.text.split(" ") if w != ""]
        if not words:
            continue
        k = int(r.doc_id)
        e = per.setdefault(k, [0, set()])
        e[0] += len(words)
        e[1] = e[1] | set(words)
    rows = []
    for r in docs.itertuples():
        if pd.isna(r.doc_id):
            continue
        k = int(r.doc_id)
        if k in per:
            rows.append((r.source, k, per[k][0], len(per[k][1])))
    rows.sort(key=lambda t: (-t[3], t[1]))
    tot = sum(t[2] for t in rows)
    budget = math.floor(tot * 0.4)
    exp: dict = {}
    cum = 0
    for source, _k, n_tok, _n_ty in rows:
        sel = cum + n_tok <= budget
        e = exp.setdefault(source, [0, 0, 0])
        e[0] += 1
        if sel:
            e[1] += 1
            e[2] += n_tok
        cum += n_tok
    got = CATALOG["corpus_token_budget"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(exp)
    saw_partial = False
    for r in got.itertuples():
        e = exp[r.source]
        assert (
            int(r.n_docs),
            int(r.n_docs_selected),
            int(r.n_tokens_selected),
        ) == tuple(e), r.source
        assert abs(r.corpus_share - e[2] / tot) < 2e-6
        saw_partial |= 0 < e[1] < e[0]
    # non-degeneracy: the 40% budget must actually CUT somewhere —
    # at least one source keeps some but not all of its docs
    assert saw_partial, "budget cut nothing — fixture degenerate"


def test_with_global_prefix_degenerate_frames(spark):
    """Edge contract: empty input → empty output (the bounds row is
    all-NULL but no row consults it); single-row and all-NULL-key
    frames produce zero prefixes and correct totals."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    from mapreducepy_spark.operators.prefix import with_global_prefix

    schema = StructType(
        [StructField("k", LongType()), StructField("n", LongType())]
    )
    empty = spark.createDataFrame([], schema)
    out = with_global_prefix(
        empty,
        "k",
        [F.col("k").asc_nulls_first()],
        sums={"cb": "n"},
        count_as="rb",
        total_sums={"tn": "n"},
        total_count_as="tr",
    )
    assert out.count() == 0

    one = spark.createDataFrame([(7, 3)], schema)
    r = with_global_prefix(
        one,
        "k",
        [F.col("k").asc_nulls_first()],
        sums={"cb": "n"},
        count_as="rb",
        total_sums={"tn": "n"},
        total_count_as="tr",
    ).collect()[0]
    assert (r.cb, r.rb, r.tn, r.tr) == (0, 0, 3, 1)

    nulls = spark.createDataFrame([(None, 2), (None, 5)], schema)
    rows = (
        with_global_prefix(
            nulls,
            "k",
            [F.col("k").asc_nulls_first(), F.col("n").asc()],
            sums={"cb": "n"},
            count_as="rb",
            total_count_as="tr",
        )
        .orderBy("n")
        .collect()
    )
    assert [(r.cb, r.rb, r.tr) for r in rows] == [(0, 0, 2), (2, 1, 2)]


def test_with_global_prefix_rejects_contradictory_flags(spark):
    """The r12-review foot-gun guard: a descending flag that
    disagrees with the leading order expression raises instead of
    silently corrupting prefixes."""
    import pytest as _pytest

    import pyspark.sql.functions as F

    from mapreducepy_spark.operators.prefix import with_global_prefix

    df = spark.createDataFrame([(1, 1)], ["k", "n"])
    with _pytest.raises(ValueError, match="contradicts"):
        with_global_prefix(
            df, "k", [F.col("k").desc()], count_as="rb"
        )  # descending not set
    with _pytest.raises(ValueError, match="contradicts"):
        with_global_prefix(
            df,
            "k",
            [F.col("k").asc_nulls_last()],
            count_as="rb",
        )  # nulls_last not set


# --- hypothesis property layer (pure-python mirrors, no Spark) -------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-1000, 1000)),  # shard key
            st.integers(0, 50),                              # summand
        ),
        min_size=1,
        max_size=300,
    ),
    shards=st.integers(1, 65),
    descending=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_two_level_prefix_algebra_property(rows, shards, descending):
    """THE theorem with_global_prefix rides, pure-python mirror: for
    ANY multiset of (key, n) rows (NULL keys included), any shard
    count, either direction — value-range shard id + shard-local
    prefix + exclusive shard-total offsets == the sequential prefix
    over the global order. Verifies monotone shard ids along the
    order as a lemma (ties colocate by construction)."""
    idx_rows = list(enumerate(rows))  # idx = the deterministic tie-break
    nonnull = [k for _, (k, _) in idx_rows if k is not None]
    vmin, vmax = (min(nonnull), max(nonnull)) if nonnull else (0, 0)
    span = vmax - vmin + 1

    def pid(k):
        if k is None:
            return -1
        return int((k - vmin) * shards // span)

    def ord_pid(p):
        if descending:  # nulls last under DESC
            return 1 << 40 if p == -1 else -p
        return p  # nulls first under ASC: -1 already sorts first

    def sort_key(item):
        i, (k, _) = item
        if k is None:
            kk = (0, 0) if not descending else (2, 0)
        else:
            kk = (1, -k if descending else k)
        return (kk, i)

    glob = sorted(idx_rows, key=sort_key)
    # lemma: shard ord is monotone non-decreasing along the order
    ords = [ord_pid(pid(k)) for _, (k, _) in glob]
    assert all(a <= b for a, b in zip(ords, ords[1:]))
    # naive sequential prefix
    naive = {}
    cum = 0
    for i, (_k, n) in glob:
        naive[i] = cum
        cum += n
    # two-level: local prefix within shard (same global order) +
    # exclusive sum of lower-ord shard totals
    ptot = {}
    loc = {}
    lcum = {}
    for i, (k, n) in glob:
        p = ord_pid(pid(k))
        loc[i] = lcum.get(p, 0)
        lcum[p] = lcum.get(p, 0) + n
        ptot[p] = ptot.get(p, 0) + n
    for i, (k, n) in idx_rows:
        p = ord_pid(pid(k))
        offset = sum(t for q, t in ptot.items() if q < p)
        assert offset + loc[i] == naive[i], (i, k, n)


@given(total=st.integers(1, 500), n=st.integers(1, 32))
@settings(max_examples=200, deadline=None)
def test_ntile_formula_property(total, n):
    """ntile_from_rank's integer algebra vs the SQL-standard
    definition (first total%n tiles get total//n+1 rows), pure
    python, every rank of every frame size."""
    base, rem = divmod(total, n)
    big = (base + 1) * rem
    expect = []
    for tile in range(1, min(n, total) + 1):
        size = base + 1 if tile <= rem else base
        expect.extend([tile] * size)
    got = []
    for rn in range(1, total + 1):
        if base == 0:
            got.append(rn)
        elif rn <= big:
            got.append((rn - 1) // (base + 1) + 1)
        else:
            got.append(rem + (rn - big - 1) // base + 1)
    assert got == expect


def test_sim_ann_adc_agreement_matches_numpy(spark, sf_dir):
    """Independent numpy int64 recompute of the whole IVF+PQ+ADC
    chain: µ-unit quantization, first-16 centroids, exact cell
    argmin, per-subspace codeword argmin, reconstruction, in-cell
    exact and ADC nearest neighbors with (distance, id) tie-breaks —
    every output row compared field-for-field."""
    import numpy as np

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb[emb.vec_id.notna()]
    rows = {}
    for r in emb.itertuples():
        v = np.asarray(r.embedding, dtype=np.float64)
        if v.shape[0] != 64:
            continue
        qv = np.floor(v * 1_000_000.0 + 0.5).astype(np.int64)
        k = int(r.vec_id)
        # duplicate identity collapse: lexicographic MIN of qv
        if k not in rows or tuple(qv) < tuple(rows[k]):
            rows[k] = qv
    ids = sorted(rows)
    cent = {k: rows[k] for k in ids if k < 16}
    assert cent, "no centroids in fixture"

    def d2(a, b):
        d = a - b
        return int((d * d).sum())

    cell = {
        k: min(cent, key=lambda c: (d2(rows[k], cent[c]), c)) for k in ids
    }
    cb = {
        (cw, s): rows[cw][s * 8 : s * 8 + 8]
        for cw in cent
        for s in range(8)
    }
    recon = {}
    for k in ids:
        parts = []
        for s in range(8):
            v = rows[k][s * 8 : s * 8 + 8]
            best = min(cent, key=lambda cw: (d2(v, cb[(cw, s)]), cw))
            parts.append(cb[(best, s)])
        recon[k] = np.concatenate(parts)
    import hashlib

    exp = {}
    for q in ids:
        if hashlib.md5(str(q).encode()).hexdigest()[:2] < "e0":
            continue
        peers = [n for n in ids if n != q and cell[n] == cell[q]]
        if not peers:
            continue
        ne = min(peers, key=lambda n: (d2(rows[q], rows[n]), n))
        na = min(peers, key=lambda n: (d2(rows[q], recon[n]), n))
        exp[q] = (
            cell[q],
            ne,
            na,
            d2(rows[q], rows[ne]),
            d2(rows[q], recon[na]),
            int(ne == na),
        )
    got = (
        CATALOG["sim_ann_adc_agreement"].builder(spark, sf_dir).toPandas()
    )
    assert len(got) == len(exp)
    for r in got.itertuples():
        e = exp[int(r.query_id)]
        assert (
            int(r.cell),
            int(r.nn_exact),
            int(r.nn_adc),
            int(r.d_exact_u2),
            int(r.d_adc_u2),
            int(r.agree),
        ) == e, r.query_id
    # non-degeneracy: the audit must see BOTH outcomes — PQ at K=16
    # is coarse enough to lose some NNs, near-dup pairs keep some
    vals = {v[5] for v in exp.values()}
    assert vals == {0, 1}, f"degenerate agreement census: {vals}"
