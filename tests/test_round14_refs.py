"""Round-14-session references: the Misra-Gries re-shard (VERDICT r10
#2) and the empty-sketch decrement-loss fix (ADVICE r10 high).

The engine's heavy-hitters kernel now shards by PHYSICAL partition
(``mapInPandas``) instead of materializing (lang, doc_id%8) groups —
legitimate only because the two driver-hashed flags are shard- and
order-independent theorems. These tests pin (a) the exact regression
ADVICE reproduced (a shard whose sketch ends EMPTY must still
contribute its decrement rounds to the undercount bound), (b)
bit-equality of the level-based ``_mg_update`` against the naive
textbook decrement loop on the same stream, (c) bounded lazy-heap
state (the O(tokens) heap growth ADVICE flagged), and (d) the
shard-independence property itself: ANY split of the same stream
merges to a summary satisfying both theorems.
"""

from __future__ import annotations

import os

import pandas as pd

from mapreducepy_spark.registry import load_catalog

CATALOG = load_catalog()


def _naive_mg(words, cap=16):
    """Textbook Misra-Gries: decrement ALL counters on a miss at
    capacity. Returns (counters, decrement_rounds)."""
    counters, dec = {}, 0
    for w in words:
        if w in counters:
            counters[w] += 1
        elif len(counters) < cap:
            counters[w] = 1
        else:
            dec += 1
            for k in list(counters):
                counters[k] -= 1
                if counters[k] == 0:
                    del counters[k]
    return counters, dec


def _stream(n=20_000, vocab=40, seed=0x5EED):
    """Deterministic zipf-ish token stream via an LCG (no RNG APIs):
    word i drawn with weight ~ 1/(i+1) through a cumulative table."""
    cum, tot = [], 0.0
    for i in range(vocab):
        tot += 1.0 / (i + 1)
        cum.append(tot)
    out, x = [], seed
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % 2**64
        u = (x >> 11) / 2**53 * tot
        lo = next(i for i, c in enumerate(cum) if u <= c)
        out.append(f"w{lo:02d}")
    return out


def test_mg_empty_sketch_shard_still_counts_decrements(spark, tmp_path):
    """ADVICE r10 high, reproduced verbatim: ONE doc with 17 distinct
    words. Capacity-16 MG ends with an EMPTY sketch (the 17th word's
    miss raises base to 1, killing all 16 level-1 entries) after ONE
    real decrement round. The r10 kernel emitted zero rows for that
    shard, dropping its dec from dec_total, so undercount(top word)
    = 1 > dec_total = 0 flipped err_ok FALSE on valid data. The
    sentinel row (NULL word, est 0, dec carried unconditionally)
    makes the bound a theorem again: err_ok TRUE, and the oracle
    (which pins TRUE literals) hash-agrees."""
    import duckdb

    pd.DataFrame(
        [(0, " ".join(f"u{i:02d}" for i in range(17)), "en", "web", 100)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    q = CATALOG["text_heavy_hitters_bound"]
    spd = q.builder(spark, str(tmp_path)).toPandas()
    assert len(spd) == 3
    assert spd.err_ok.all(), "empty-sketch shard dropped its dec again"
    assert spd.survival_ok.all()

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    from .parity_util import canon_frame

    assert canon_frame(spd) == canon_frame(con.execute(q.oracle).fetchdf())


def test_mg_update_bit_equal_naive_and_bounded_heap():
    """The level-based kernel is bit-identical to the textbook loop on
    the same stream — surviving (word, count) pairs AND the decrement
    round count — while its lazy heap stays O(capacity): 20k tokens
    push ~20k entries without compaction, so the post-run bound only
    holds if the ADVICE-flagged rebuild actually fires."""
    from mapreducepy_spark.llm.text import (
        _MG_CAP,
        _MG_HEAP_SLACK,
        _mg_update,
    )

    words = _stream()
    levels, heap, base = {}, [], 0
    base = _mg_update(levels, heap, base, words)
    got = {w: lvl - base for w, lvl in levels.items()}

    ref_counters, ref_dec = _naive_mg(words, _MG_CAP)
    assert got == ref_counters
    assert base == ref_dec
    assert base > 0, "stream must exercise the decrement path"
    assert len(heap) <= _MG_HEAP_SLACK * _MG_CAP, (
        f"lazy heap grew to {len(heap)} — compaction not firing"
    )


def test_mg_merge_theorems_hold_for_any_sharding():
    """The property the re-shard rests on: split the SAME stream into
    k shards (k = 1, 2, 5, 8 — contiguous chunks, i.e. an arbitrary
    physical partitioning), run one sketch per shard, merge by
    summing survivors and decrement rounds. For EVERY word: 0 <=
    exact - est_m <= dec_total; and every word with count·(cap+1) >
    n survives the merge. Holds for all k or the mapInPandas shape
    is unsound."""
    from collections import Counter

    from mapreducepy_spark.llm.text import _MG_CAP, _mg_update

    words = _stream(n=12_000, vocab=35, seed=0xBEEF)
    exact = Counter(words)
    n_total = len(words)
    for k in (1, 2, 5, 8):
        chunk = (n_total + k - 1) // k
        merged, dec_total = Counter(), 0
        for s in range(k):
            levels, heap, base = {}, [], 0
            base = _mg_update(
                levels, heap, base, words[s * chunk : (s + 1) * chunk]
            )
            dec_total += base
            for w, lvl in levels.items():
                merged[w] += lvl - base
        for w, c in exact.items():
            assert 0 <= c - merged.get(w, 0) <= dec_total, (k, w)
            if c * (_MG_CAP + 1) > n_total:
                assert merged.get(w, 0) > 0, (k, w)


def test_heavy_hitters_output_invariant_to_input_partitioning(
    spark, tmp_path
):
    """End-to-end shard-independence: the SAME corpus written as 1
    file vs 7 files (different physical partitionings, different
    per-task streams) produces the IDENTICAL driver-hashed frame —
    exact counts, ranks, and theorem flags."""
    rows = []
    for d in range(70):
        toks = ["hot"] * 5 + [f"w{(d * 3 + j) % 29:02d}" for j in range(9)]
        rows.append((d, " ".join(toks), "en" if d % 3 else "fr", "web", 80))
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    one, many = tmp_path / "one", tmp_path / "many"
    os.makedirs(one)
    os.makedirs(many / "documents.parquet")
    df.to_parquet(one / "documents.parquet", index=False)
    for s in range(7):
        part = df[df.doc_id % 7 == s]
        part.to_parquet(
            many / "documents.parquet" / f"part-{s}.parquet", index=False
        )

    q = CATALOG["text_heavy_hitters_bound"]
    from .parity_util import canon_frame

    a = q.builder(spark, str(one)).toPandas()
    b = q.builder(spark, str(many)).toPandas()
    assert canon_frame(a) == canon_frame(b)
    assert a.err_ok.all() and a.survival_ok.all()


# --- round-11 growth keys: independent python recomputation ----------

import hashlib
from collections import defaultdict


def _pq(sf_dir: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _python_lsh_clusters(docs: pd.DataFrame) -> dict[int, int]:
    """doc_id -> cluster rep (min reachable doc_id) over the MinHash-
    LSH candidate graph, rebuilt in pure python (shingle -> 8
    rotated-md5 minhashes -> 4 band-of-2 signatures -> bucket pairs
    -> BFS components). Docs in no pair are absent (they represent
    themselves)."""
    mh: dict[int, list[str]] = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        if pd.isna(doc_id) or text is None:
            continue
        toks = str(text).split(" ")
        if len(toks) < 3:
            continue
        hs = [
            _md5(" ".join(toks[i : i + 3])) for i in range(len(toks) - 2)
        ]
        hs = list(set(hs))
        mh[int(doc_id)] = [
            min(h[4 * i :] + h[: 4 * i] for h in hs) for i in range(8)
        ]
    buckets: dict[tuple[int, str], list[int]] = defaultdict(list)
    for d, sig in mh.items():
        for b in range(4):
            buckets[(b, sig[2 * b] + sig[2 * b + 1])].append(d)
    adj: dict[int, set[int]] = defaultdict(set)
    for ids in buckets.values():
        for i in ids:
            for j in ids:
                if i != j:
                    adj[i].add(j)
    rep: dict[int, int] = {}
    for start in sorted(adj):
        if start in rep:
            continue
        comp, frontier = {start}, [start]
        while frontier:
            nxt = []
            for n in frontier:
                for m in adj[n]:
                    if m not in comp:
                        comp.add(m)
                        nxt.append(m)
            frontier = nxt
        r = min(comp)
        for n in comp:
            rep[n] = r
    return rep


def test_split_by_cluster_matches_python(spark, sf_dir):
    """Full python recomputation: LSH clusters by BFS, representative
    = coalesce(cluster rep, doc_id), split = md5 first-byte cuts on
    the REP (not the doc), aggregated per (split, lang). Also pins
    the leak-freedom consequence on the python side: near-dup mates
    always share a split."""
    docs = _pq(sf_dir, "documents")
    rep = _python_lsh_clusters(docs)

    def split_of(r) -> str:
        h2 = _md5(str(int(r)))[:2]
        return "train" if h2 < "cc" else ("val" if h2 < "e6" else "test")

    agg: dict[tuple[str, object], list] = {}
    groups: dict[tuple[str, object], set] = defaultdict(set)
    for doc_id, lang in zip(docs.doc_id, docs.lang):
        if pd.isna(doc_id):
            key = ("test", lang)  # NULL rep falls to the CASE's ELSE
            agg.setdefault(key, [0])[0] += 1
            continue
        r = rep.get(int(doc_id), int(doc_id))
        key = (split_of(r), lang)
        agg.setdefault(key, [0])[0] += 1
        groups[key].add(r)
    got = CATALOG["split_by_cluster"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(agg)
    for row in got.itertuples():
        key = (row.split, row.lang)
        assert agg[key][0] == int(row.n_docs), key
        assert len(groups[key]) == int(row.n_groups), key
    # leak-freedom on the python graph: mates share a split
    for d, r in rep.items():
        assert split_of(r) == split_of(rep[r])


def test_compaction_plan_matches_pandas(spark, sf_dir):
    """Pandas recomputation of the cumulative next-fit packing: per
    source, sort (n_chars desc, doc_id asc), running sum BEFORE each
    file, bin = floor(cum/65536), aggregate. Also pins the packing
    quality the docstring claims: every bin except a directory's
    LAST holds at least the target (cumulative next-fit can overflow
    a bin by one file but never leaves a middle bin short)."""
    docs = _pq(sf_dir, "documents")
    got = (
        CATALOG["compaction_plan"].builder(spark, sf_dir).toPandas()
    )
    T = 65_536
    exp: dict[tuple[object, int], list[int]] = {}
    for src, g in docs.groupby("source", dropna=False):
        g = g.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True],
            na_position="last",
        )
        cum = 0
        for n in g.n_chars:
            b = int(cum // T)
            key = (src, b)
            e = exp.setdefault(key, [0, 0])
            e[0] += 1
            if pd.notna(n):
                e[1] += int(n)
                cum += int(n)
    assert len(got) == len(exp)
    for row in got.itertuples():
        src = None if pd.isna(row.source) else row.source
        e = exp[(src, int(row.bin_id))]
        assert e[0] == int(row.n_files), (src, row.bin_id)
        assert e[1] == int(row.bytes), (src, row.bin_id)
    # packing quality ON THIS CENSUS (fixture sizes are all well
    # under the target, so no overshoot-skip arises and every middle
    # bin is full here; the general theorem — cumulative bytes
    # through bin b reach (b+1)·target — is the hypothesis property
    # test below, which falsified the naive per-bin claim)
    for src, g in got.groupby("source", dropna=False):
        mid = g[g.bin_id < g.bin_id.max()]
        assert (mid.bytes >= T).all(), src


def test_events_views_unconverted_matches_bruteforce(spark, sf_dir):
    """Brute-force pandas anti-join: per view, scan the same user's
    clicks for one inside (view_ts, view_ts + 60 min]; keep the view
    iff none exists. NULL user_id / NULL ts views are kept (the
    predicate can't match them)."""
    e = _pq(sf_dir, "events")
    views = e[e.event_type == "view"]
    clicks = e[e.event_type == "click"]
    by_user: dict[object, list] = defaultdict(list)
    for u, ts in zip(clicks.user_id, clicks.ts):
        if pd.notna(u) and pd.notna(ts):
            by_user[int(u)].append(ts)
    h = pd.Timedelta(minutes=60)
    keep = set()
    for r in views.itertuples():
        if pd.isna(r.user_id) or pd.isna(r.ts):
            keep.add(int(r.event_id))
            continue
        if not any(
            r.ts < c <= r.ts + h for c in by_user.get(int(r.user_id), ())
        ):
            keep.add(int(r.event_id))
    got = (
        CATALOG["events_views_unconverted"].builder(spark, sf_dir).toPandas()
    )
    assert set(got.view_id.astype(int)) == keep
    assert len(got) == len(keep)  # view_id is unique among kept views


def test_compaction_plan_bin_boundary_is_exclusive_of_current_file(
    spark, tmp_path
):
    """Mutation audit (caught nothing at sf0.001 — single bin per
    source there): a constructed census that STRADDLES bin
    boundaries pins the exact packing rule, bin = floor(bytes BEFORE
    this file / target). Files of 40 KiB: cum_before runs 0 / 40 /
    80 / 120 / 160 KiB → bins 0,0,1,1,2 (the 64 KiB target). The
    off-by-one mutation (cum INCLUDING the current file → bins
    0,1,1,2,2) and a wrong target both flip this. A second source
    with one file exactly AT the target (65536 bytes) pins the
    boundary file into bin 0 (cum_before = 0), the next into bin 1."""
    import duckdb

    rows = []
    for i in range(5):
        rows.append((i, "x", "en", "srcA", 40_960))
    rows.append((10, "x", "en", "srcB", 65_536))
    rows.append((11, "x", "en", "srcB", 100))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet", index=False)

    got = (
        CATALOG["compaction_plan"]
        .builder(spark, str(tmp_path))
        .toPandas()
        .sort_values(["source", "bin_id"])
        .reset_index(drop=True)
    )
    a = got[got.source == "srcA"]
    assert list(zip(a.bin_id, a.n_files, a.bytes)) == [
        (0, 2, 81_920),
        (1, 2, 81_920),
        (2, 1, 40_960),
    ]
    b = got[got.source == "srcB"]
    # the 65536-byte file has cum_before 0 -> bin 0; the 100-byte
    # file has cum_before exactly 65536 -> floor(1.0) = bin 1
    assert list(zip(b.bin_id, b.n_files, b.bytes)) == [
        (0, 1, 65_536),
        (1, 1, 100),
    ]
    # oracle agreement on the same constructed census
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    from .parity_util import canon_frame

    dpd = con.execute(CATALOG["compaction_plan"].oracle).fetchdf()
    assert canon_frame(got) == canon_frame(dpd)


def test_events_views_unconverted_horizon_boundary_is_inclusive(
    spark, tmp_path
):
    """Mutation audit (caught nothing on the fixture — no click lands
    on the exact horizon): a click EXACTLY at view_ts + 60 min
    CONVERTS the view (<= bound), one microsecond later does not.
    Three users: u1's click at +60:00.000000 -> view converted; u2's
    at +60:00.000001 -> unconverted; u3's at view_ts itself (strict
    > bound) -> unconverted. Both engines must agree row-for-row."""
    import duckdb

    t0 = pd.Timestamp("2024-03-01 12:00:00")
    h = pd.Timedelta(minutes=60)
    us = pd.Timedelta(microseconds=1)
    rows = [
        (1, 1, "view", t0, 0.0),
        (2, 1, "click", t0 + h, 0.0),          # exactly at horizon
        (3, 2, "view", t0, 0.0),
        (4, 2, "click", t0 + h + us, 0.0),     # one us past
        (5, 3, "view", t0, 0.0),
        (6, 3, "click", t0, 0.0),              # not strictly after
    ]
    pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts", "value"]
    ).to_parquet(tmp_path / "events.parquet", index=False)

    got = (
        CATALOG["events_views_unconverted"]
        .builder(spark, str(tmp_path))
        .toPandas()
    )
    assert set(got.view_id.astype(int)) == {3, 5}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')"
    )
    from .parity_util import canon_frame

    dpd = con.execute(
        CATALOG["events_views_unconverted"].oracle
    ).fetchdf()
    assert canon_frame(got) == canon_frame(dpd)


def test_dedup_incremental_matches_python_bands(spark, sf_dir):
    """Independent python recomputation of the delta-probe triage:
    rebuild minhash signatures + band buckets in pure python, take
    the md5-tail delta (h2 >= 'e6'), classify every delta doc by its
    distinct band partners inside/outside the delta, and compare
    verdicts AND both partner counts row-for-row. Also asserts the
    sf0.01 fixture exercises at least two verdict classes (the test
    would be vacuous on an all-unique corpus)."""
    docs = _pq(sf_dir, "documents")
    mh: dict[int, list[str]] = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        if pd.isna(doc_id) or text is None:
            continue
        toks = str(text).split(" ")
        if len(toks) < 3:
            continue
        hs = list(
            {_md5(" ".join(toks[i : i + 3])) for i in range(len(toks) - 2)}
        )
        mh[int(doc_id)] = [
            min(h[4 * i :] + h[: 4 * i] for h in hs) for i in range(8)
        ]
    buckets: dict[tuple[int, str], set[int]] = defaultdict(set)
    for d, sig in mh.items():
        for b in range(4):
            buckets[(b, sig[2 * b] + sig[2 * b + 1])].add(d)
    delta = {
        int(d)
        for d in docs.doc_id.dropna().unique()
        if _md5(str(int(d)))[:2] >= "e6"
    }
    partners: dict[int, set[int]] = defaultdict(set)
    for ids in buckets.values():
        for i in ids:
            if i in delta:
                partners[i] |= ids - {i}
    got = (
        CATALOG["dedup_incremental"].builder(spark, sf_dir).toPandas()
    )
    assert set(got.doc_id.astype(int)) == delta
    for r in got.itertuples():
        p = partners.get(int(r.doc_id), set())
        n_c = len({x for x in p if x not in delta})
        n_d = len({x for x in p if x in delta})
        assert int(r.n_corpus_partners) == n_c, r.doc_id
        assert int(r.n_delta_partners) == n_d, r.doc_id
        want = (
            "dup_of_corpus"
            if n_c
            else ("dup_within_delta" if n_d else "unique")
        )
        assert r.verdict == want, r.doc_id
    assert got.verdict.nunique() >= 2


def test_range_partition_plan_matches_pandas(spark, sf_dir):
    """Pandas recompute of the histogram-rank planner: key counts,
    cumulative rows BEFORE each key (keys ascending), bucket =
    floor(cum * 16 / total); compare every (bucket, lo, hi, n_keys,
    n_rows) row. Then the two properties the card exists for: keys
    are ATOMIC (a key's rows never split across buckets — verified
    by reconstruction) and bucket ranges are contiguous and
    non-overlapping (bucket b's lo_key > bucket b-1's hi_key)."""
    li = _pq(sf_dir, "lineitem")
    h = (
        li.groupby("l_orderkey", dropna=False)
        .size()
        .reset_index(name="n")
        .sort_values("l_orderkey", na_position="first")
        .reset_index(drop=True)
    )
    tot = int(h.n.sum())
    cum = 0
    exp: dict[int, list] = {}
    for r in h.itertuples():
        b = int(cum * 16 // tot)
        e = exp.setdefault(b, [None, None, 0, 0])
        k = r.l_orderkey
        if pd.notna(k):
            k = int(k)
            e[0] = k if e[0] is None else min(e[0], k)
            e[1] = k if e[1] is None else max(e[1], k)
        e[2] += 1
        e[3] += int(r.n)
        cum += int(r.n)
    got = (
        CATALOG["range_partition_plan"]
        .builder(spark, sf_dir)
        .toPandas()
        .sort_values("bucket_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for r in got.itertuples():
        e = exp[int(r.bucket_id)]
        assert (e[0], e[1], e[2], e[3]) == (
            None if pd.isna(r.lo_key) else int(r.lo_key),
            None if pd.isna(r.hi_key) else int(r.hi_key),
            int(r.n_keys),
            int(r.n_rows),
        ), r.bucket_id
    # contiguous, non-overlapping ranges (atomic keys follow: a split
    # key would overlap two buckets' [lo, hi] spans)
    spans = got.dropna(subset=["lo_key"])
    prev_hi = None
    for r in spans.itertuples():
        assert r.lo_key <= r.hi_key
        if prev_hi is not None:
            assert r.lo_key > prev_hi, "bucket ranges overlap"
        prev_hi = r.hi_key
    # load balance: no bucket more than 2x the ideal share (the
    # fixture's max key multiplicity is 7 lines per order)
    assert int(got.n_rows.max()) <= 2 * (tot // 16 + 7)


def test_agg_delta_maintenance_matches_pandas_and_split_is_total(
    spark, sf_dir
):
    """Pandas recompute of the maintained aggregate (exact cents) AND
    the split-totality property the merge theorem rests on: base
    (date < cutoff) and delta (everything else, NULL dates included)
    partition the table, so merged == direct recompute. (The NULL
    arms themselves are pinned on a constructed fixture in
    test_agg_delta_maintenance_null_date_and_all_null_price_group —
    the sf fixture has no NULL dates or prices.)"""
    o = _pq(sf_dir, "orders")
    cut = pd.Timestamp("1999-01-01")

    def cents(s):
        import math

        return int(
            sum(math.floor(v * 100.0 + 0.5) for v in s if pd.notna(v))
        )

    got = (
        CATALOG["agg_delta_maintenance"].builder(spark, sf_dir).toPandas()
    )
    assert got.merge_ok.all()
    base = o[o.o_orderdate < cut]
    delta = o[~(o.o_orderdate < cut)]  # NaT lands here: ~(NaT<cut)=~False
    assert len(base) + len(delta) == len(o)  # the split is TOTAL
    assert len(base) > 0 and len(delta) > 0  # both sides populated
    for r in got.itertuples():
        b = base[base.o_orderpriority == r.o_orderpriority]
        d = delta[delta.o_orderpriority == r.o_orderpriority]
        assert int(r.n_orders) == len(b) + len(d), r.o_orderpriority
        assert int(r.revenue_cents) == cents(b.o_totalprice) + cents(
            d.o_totalprice
        ), r.o_orderpriority


# --- hypothesis property layer for the r11 kernels -------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    words=st.lists(
        st.integers(min_value=0, max_value=39).map(lambda i: f"w{i:02d}"),
        max_size=3000,
    ),
    k=st.integers(min_value=1, max_value=9),
)
@settings(max_examples=150, deadline=None)
def test_mg_theorems_hold_on_arbitrary_streams(words, k):
    """Property form of the shard-independence pin: on ARBITRARY
    token streams (any length, any skew, vocab up to 40 > capacity
    16) split into any k contiguous shards, the merged Misra-Gries
    summary satisfies both driver-hashed theorems — 0 <= exact -
    est <= dec_total for EVERY word, and count·(cap+1) > n implies
    survival — plus bit-equality with the naive decrement loop on
    the unsharded stream. Hypothesis explores the degenerate shapes
    the fixtures can't (empty stream, single repeated word,
    alternating evict/re-enter runs, shard boundaries mid-run)."""
    from collections import Counter

    from mapreducepy_spark.llm.text import _MG_CAP, _mg_update

    exact = Counter(words)
    n_total = len(words)
    chunk = max(1, (n_total + k - 1) // k)
    merged, dec_total = Counter(), 0
    for s in range(k):
        levels, heap, base = {}, [], 0
        base = _mg_update(
            levels, heap, base, words[s * chunk : (s + 1) * chunk]
        )
        dec_total += base
        for w, lvl in levels.items():
            merged[w] += lvl - base
    for w, c in exact.items():
        assert 0 <= c - merged.get(w, 0) <= dec_total, w
        if c * (_MG_CAP + 1) > n_total:
            assert merged.get(w, 0) > 0, w
    # single-shard path is bit-identical to the textbook loop
    levels, heap, base = {}, [], 0
    base = _mg_update(levels, heap, base, words)
    ref_counters, ref_dec = _naive_mg(words, _MG_CAP)
    assert {w: lvl - base for w, lvl in levels.items()} == ref_counters
    assert base == ref_dec


@given(
    sizes=st.lists(
        st.integers(min_value=0, max_value=200_000), max_size=200
    )
)
@settings(max_examples=150, deadline=None)
def test_compaction_packing_properties_on_arbitrary_censuses(sizes):
    """Property form of the bin-boundary pin, pure python mirror of
    the window algebra — asserting only the TRUE theorems (hypothesis
    falsified two first drafts, which is the point of this layer:
    bin ids can SKIP after a multi-target oversize file — sizes
    [0, 131072] packs to bins {0, 2} — and a middle bin CAN hold
    less than the target when the preceding bin overshot — sizes
    [1.9T, 0.2T, 0.05T] leaves bin 1 at 0.2T):

    (a) bin ids are monotone along the packing order and start at 0;
    (b) CUMULATIVE bytes through every non-last present bin b reach
        (b+1)·target — the invariant that actually bounds the read
        side: any underfilled middle bin is exactly compensated by
        an earlier oversize file's overshoot, so total work per bin
        prefix tracks the target grid;
    (c) no bin id exceeds total_bytes // target."""
    T = 65_536
    order = sorted(
        range(len(sizes)), key=lambda i: (-sizes[i], i)
    )
    cum, bins = 0, []
    for i in order:
        bins.append(cum // T)
        cum += sizes[i]
    if not bins:
        return
    assert bins[0] == 0
    assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))
    assert max(bins) <= sum(sizes) // T
    end_cum: dict[int, int] = {}
    run = 0
    for pos, i in enumerate(order):
        run += sizes[i]
        end_cum[bins[pos]] = run
    last = max(end_cum)
    for b, ec in end_cum.items():
        if b != last:
            assert ec >= (b + 1) * T, (b, ec)


@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=50),
        min_size=1,
        max_size=400,
    )
)
@settings(max_examples=150, deadline=None)
def test_range_partition_properties_on_arbitrary_histograms(counts):
    """Property form of the split-point pin, pure python mirror:
    bucket = floor(cum_before * 16 / total) over keys ascending
    yields (a) atomic keys, (b) monotone bucket ids with contiguous
    key ranges, (c) bucket ids inside [0, 16), and (d) every bucket's
    row load < ideal_share + max_key_multiplicity (the deterministic
    balance bound: a bucket stops accepting keys once its cum share
    is spent, so it can overshoot by at most one key's rows)."""
    B = 16
    tot = sum(counts)
    cum, assign = 0, []
    for n in counts:  # key i has n rows, keys ascending
        assign.append(int(cum * B // tot))
        cum += n
    assert all(0 <= b < B for b in assign)
    assert all(b2 >= b1 for b1, b2 in zip(assign, assign[1:]))
    loads: dict[int, int] = {}
    for b, n in zip(assign, counts):
        loads[b] = loads.get(b, 0) + n
    ideal = tot / B
    mx = max(counts)
    for b, load in loads.items():
        assert load < ideal + mx + 1, (b, load, ideal, mx)


def test_agg_delta_maintenance_null_date_and_all_null_price_group(
    spark, tmp_path, sf_dir
):
    """The two NULL arms of the maintenance merge, pinned on a
    constructed fixture (code review r11 — the second one was a LIVE
    bug): (a) a NULL-date late record lands in the DELTA (the
    NOT(coalesce) arm) and is counted; (b) a priority group whose
    EVERY price is NULL must report revenue_cents NULL — not 0 — and
    merge_ok TRUE, matching SQL SUM semantics (the pre-fix merge
    coalesced the all-NULL partial to 0 and the equality comparison
    went NULL, hash-diverging from the oracle)."""
    import duckdb

    o = _pq(sf_dir, "orders").head(200).copy()
    extra = pd.DataFrame(
        [
            # NULL date, priced: must land in the delta and be counted
            {
                "o_orderkey": 9_000_001,
                "o_custkey": 1,
                "o_orderstatus": "O",
                "o_totalprice": 123.45,
                "o_orderdate": pd.NaT,
                "o_orderpriority": "1-URGENT",
                "o_clerk": "x",
                "o_shippriority": 0,
                "o_comment": "late record",
            },
            # a whole priority group with only NULL prices, split
            # across base (1997 < cutoff) and delta (2000 >= cutoff)
            {
                "o_orderkey": 9_000_002,
                "o_custkey": 1,
                "o_orderstatus": "O",
                "o_totalprice": None,
                "o_orderdate": pd.Timestamp("1997-01-01"),
                "o_orderpriority": "9-NULLONLY",
                "o_clerk": "x",
                "o_shippriority": 0,
                "o_comment": "",
            },
            {
                "o_orderkey": 9_000_003,
                "o_custkey": 1,
                "o_orderstatus": "O",
                "o_totalprice": None,
                "o_orderdate": pd.Timestamp("2000-01-01"),
                "o_orderpriority": "9-NULLONLY",
                "o_clerk": "x",
                "o_shippriority": 0,
                "o_comment": "",
            },
        ]
    )
    o = pd.concat(
        [o, extra[o.columns.intersection(extra.columns)]],
        ignore_index=True,
    )
    # concat upcasts datetimes to ns; the engine contract is
    # timestamp[us] (a ns column reads as BIGINT under nanosAsLong)
    o["o_orderdate"] = o.o_orderdate.astype("datetime64[us]")
    o.to_parquet(tmp_path / "orders.parquet", index=False)

    got = (
        CATALOG["agg_delta_maintenance"]
        .builder(spark, str(tmp_path))
        .toPandas()
    )
    assert got.merge_ok.all(), got.to_string()
    urgent = got[got.o_orderpriority == "1-URGENT"].iloc[0]
    base_urgent = _pq(sf_dir, "orders").head(200)
    n_urgent = int(
        (base_urgent.o_orderpriority == "1-URGENT").sum()
    )
    assert int(urgent.n_orders) == n_urgent + 1  # the late record
    nullonly = got[got.o_orderpriority == "9-NULLONLY"].iloc[0]
    assert int(nullonly.n_orders) == 2
    assert pd.isna(nullonly.revenue_cents), "all-NULL sum must be NULL"
    # oracle hash agreement on the same constructed fixture
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet')"
    )
    from .parity_util import canon_frame

    dpd = con.execute(
        CATALOG["agg_delta_maintenance"].oracle
    ).fetchdf()
    assert canon_frame(got) == canon_frame(dpd)
