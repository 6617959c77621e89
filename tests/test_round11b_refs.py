"""Third-implementation references for kernel-heavy keys of the
r8-green block (the freshest driver evidence — these fill driver
windows after round 11). Same discipline as the sibling ref files;
the sessionization kernel is recomputed once in plain python and
feeds both session keys.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from mapreducepy_spark.registry import load_catalog

CATALOG = load_catalog()

_GAP_US = 30 * 60 * 1_000_000


def _pq(sf_dir: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _r(x: float, d: int) -> float:
    return math.floor(x * 10**d + 0.5) / 10**d


def _sessions(sf_dir: str):
    """Python sessionization: per user, events ordered (ts, event_id),
    new session when the gap exceeds 30 minutes; returns
    {(user_id, session_seq): [(ts_us, ts, value), ...]}."""
    ev = _pq(sf_dir, "events")
    us = ev.ts.values.astype("datetime64[us]").astype("int64")
    by_user = defaultdict(list)
    for uid, t, ts, eid, v in zip(
        ev.user_id, us, ev.ts, ev.event_id, ev.value
    ):
        by_user[int(uid)].append((int(t), int(eid), ts, float(v)))
    out: dict[tuple[int, int], list] = {}
    for uid, rows in by_user.items():
        rows.sort(key=lambda r_: (r_[0], r_[1]))
        seq = 0
        prev = None
        for t, _, ts, v in rows:
            if prev is None or t - prev > _GAP_US:
                seq += 1
            prev = t
            out.setdefault((uid, seq), []).append((t, ts, v))
    return out


def test_win_session_matches_python(spark, sf_dir):
    sess = _sessions(sf_dir)
    got = CATALOG["win_session"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(sess)
    for r_ in got.itertuples():
        rows = sess[(int(r_.user_id), int(r_.session_seq))]
        assert int(r_.n_events) == len(rows)
        assert pd.Timestamp(r_.session_start) == min(ts for _, ts, _ in rows)
        assert pd.Timestamp(r_.session_end) == max(ts for _, ts, _ in rows)
        assert r_.session_value == pytest.approx(
            _r(sum(v for _, _, v in rows), 2), abs=0.02
        )


def test_events_session_stats_matches_python(spark, sf_dir):
    sess = _sessions(sf_dir)
    per_user: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for (uid, _), rows in sess.items():
        dur = max(t for t, _, _ in rows) - min(t for t, _, _ in rows)
        per_user[uid].append((len(rows), dur))
    got = (
        CATALOG["events_session_stats"].builder(spark, sf_dir).toPandas()
        .set_index("user_id")
    )
    assert set(got.index.astype(int)) == set(per_user)
    for uid, ss in per_user.items():
        row = got.loc[uid]
        n_sess = len(ss)
        n_ev = sum(n for n, _ in ss)
        tot_us = sum(d for _, d in ss)
        assert int(row.n_sessions) == n_sess
        assert int(row.n_events) == n_ev
        assert row.avg_session_events == pytest.approx(
            _r(n_ev / n_sess, 6), abs=2e-6
        )
        assert row.avg_session_sec == pytest.approx(
            _r(tot_us / n_sess / 1e6, 6), abs=2e-6
        )
        assert row.max_session_sec == pytest.approx(
            _r(max(d for _, d in ss) / 1e6, 6), abs=2e-6
        )
        assert row.total_active_sec == pytest.approx(
            _r(tot_us / 1e6, 6), abs=2e-6
        )


def test_events_paths_matches_python(spark, sf_dir):
    ev = _pq(sf_dir, "events")
    us = ev.ts.values.astype("datetime64[us]").astype("int64")
    by_user = defaultdict(list)
    for uid, t, eid, et in zip(ev.user_id, us, ev.event_id, ev.event_type):
        by_user[int(uid)].append((int(t), int(eid), et))
    trans: Counter = Counter()
    for rows in by_user.values():
        rows.sort(key=lambda r_: (r_[0], r_[1]))
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            trans[(a, b)] += 1
    got = CATALOG["events_paths"].builder(spark, sf_dir).toPandas()
    assert {
        (r_.from_type, r_.to_type): int(r_.n_transitions)
        for r_ in got.itertuples()
    } == dict(trans)


def test_win_lead_lag_matches_python(spark, sf_dir):
    ev = _pq(sf_dir, "events")
    us = ev.ts.values.astype("datetime64[us]").astype("int64")
    by_user = defaultdict(list)
    for uid, t, eid in zip(ev.user_id, us, ev.event_id):
        by_user[int(uid)].append((int(t), int(eid)))
    exp = {}
    for rows in by_user.values():
        rows.sort()
        prev = None
        for t, eid in rows:
            exp[eid] = (
                (None, None) if prev is None
                else (prev[1], t - prev[0])
            )
            prev = (t, eid)
    got = CATALOG["win_lead_lag"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(exp)
    for r_ in got.itertuples():
        peid, gap = exp[int(r_.event_id)]
        if peid is None:
            assert pd.isna(r_.prev_event_id) and pd.isna(r_.gap_us)
        else:
            assert (int(r_.prev_event_id), int(r_.gap_us)) == (peid, gap)


def test_win_first_last_matches_python(spark, sf_dir):
    o = _pq(sf_dir, "orders")
    got = (
        CATALOG["win_first_last"].builder(spark, sf_dir).toPandas()
        .set_index("custkey")
    )
    grp = o.groupby("o_custkey")
    assert set(got.index.astype(int)) == {int(k) for k in grp.groups}
    for ck, g in grp:
        rows = sorted(zip(g.o_orderdate, g.o_orderkey))
        row = got.loc[int(ck)]
        assert int(row.first_ok) == rows[0][1]
        assert int(row.last_ok) == rows[-1][1]
        if len(rows) >= 2:
            assert int(row.second_ok) == rows[1][1]
        else:
            assert pd.isna(row.second_ok)
        assert pd.Timestamp(row.first_date) == rows[0][0]
        assert pd.Timestamp(row.last_date) == rows[-1][0]
        assert int(row.n_orders) == len(rows)


def test_sample_split_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    cells: Counter = Counter()
    for doc_id, lang in zip(docs.doc_id, docs.lang):
        h2 = _md5(str(int(doc_id)))[:2]
        split = "train" if h2 < "cc" else ("val" if h2 < "e6" else "test")
        cells[(split, lang)] += 1
    got = CATALOG["sample_split"].builder(spark, sf_dir).toPandas()
    assert {
        (r_.split, r_.lang): int(r_.n_docs) for r_ in got.itertuples()
    } == dict(cells)


def _sql_mod(a: int, m: int) -> int:
    """SQL modulo (dividend sign) — both engines' % semantics."""
    r_ = abs(a) % m
    return -r_ if a < 0 else r_


_RE_EMAIL = re.compile(r"[a-z0-9]+@[a-z0-9]+\.[a-z]+")
_RE_PHONE = re.compile(r"\+1-555-[0-9]{4}")
_RE_IP = re.compile(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}")


def test_text_pii_census_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    per_src: dict[str, list[int]] = defaultdict(lambda: [0] * 6)
    for r_ in docs.itertuples():
        if r_.text is None or pd.isna(r_.doc_id):
            continue
        d = int(r_.doc_id)
        m = _sql_mod(d, 4)
        t = r_.text
        if m == 0:
            t = f"{t} contact user{d}@example.com now"
        elif m == 1:
            t = f"{t} call +1-555-{1000 + _sql_mod(d, 9000)} today"
        elif m == 2:
            t = f"{t} from 10.{_sql_mod(d, 256)}.0.1 logged"
        ne = len(_RE_EMAIL.findall(t))
        np_ = len(_RE_PHONE.findall(t))
        ni = len(_RE_IP.findall(t))
        red = _RE_IP.sub(
            "<IP>", _RE_PHONE.sub("<PHONE>", _RE_EMAIL.sub("<EMAIL>", t))
        )
        e = per_src[r_.source]
        e[0] += 1
        e[1] += 1 if ne + np_ + ni > 0 else 0
        e[2] += ne
        e[3] += np_
        e[4] += ni
        e[5] += len(t) - len(red)
    got = CATALOG["text_pii_census"].builder(spark, sf_dir).toPandas()
    assert {
        r_.source: [
            int(r_.n_docs), int(r_.n_docs_with_pii), int(r_.n_emails),
            int(r_.n_phones), int(r_.n_ips), int(r_.chars_delta),
        ]
        for r_ in got.itertuples()
    } == dict(per_src)


def test_multimodal_payload_dedup_matches_python(spark, sf_dir):
    docs = _pq(sf_dir, "documents")
    groups: dict[str, list[int]] = defaultdict(list)
    for text in docs.text:
        if text is None:
            continue
        groups[_md5(text)].append(len(text.encode("utf-8")))
    n_payloads = sum(len(v) for v in groups.values())
    n_distinct = len(groups)
    n_dup_groups = sum(1 for v in groups.values() if len(v) > 1)
    n_redundant = n_payloads - n_distinct
    reclaimable = sum((len(v) - 1) * min(v) for v in groups.values())
    got = CATALOG["multimodal_payload_dedup"].builder(spark, sf_dir).toPandas()
    assert len(got) == 1
    r_ = got.iloc[0]
    assert (
        int(r_.n_payloads), int(r_.n_distinct), int(r_.n_dup_groups),
        int(r_.n_redundant), int(r_.bytes_reclaimable),
    ) == (n_payloads, n_distinct, n_dup_groups, n_redundant, reclaimable)


def test_events_ohlc_matches_python(spark, sf_dir):
    """OHLC bars with the struct tie-break recomputed in python. The
    base fixture carries no NULL ids/values, so the tie key reduces
    to (ts, event_id, value) — the NULL legs of the struct ordering
    are pinned by the adversarial events sweep."""
    ev = _pq(sf_dir, "events")
    ev = ev[ev.ts.notna()]
    us = ev.ts.values.astype("datetime64[us]").astype("int64")
    bars: dict[tuple, list] = defaultdict(list)
    bar = ev.ts.dt.floor("30min")
    for b, et, t, eid, v in zip(bar, ev.event_type, us, ev.event_id, ev.value):
        bars[(pd.Timestamp(b), et)].append((int(t), int(eid), float(v)))
    got = CATALOG["events_ohlc"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(bars)
    for r_ in got.itertuples():
        rows = bars[(pd.Timestamp(r_.bar_start), r_.event_type)]
        assert int(r_.n_events) == len(rows)
        assert float(r_.open_value) == min(rows)[2]
        assert float(r_.close_value) == max(rows)[2]
        assert float(r_.high_value) == max(v for _, _, v in rows)
        assert float(r_.low_value) == min(v for _, _, v in rows)
        cents = sum(math.floor(v * 100.0 + 0.5) for _, _, v in rows)
        assert float(r_.sum_value) == cents / 100.0


def test_agg_minmax_by_matches_python(spark, sf_dir):
    ev = _pq(sf_dir, "events")
    us = ev.ts.values.astype("datetime64[us]").astype("int64")
    groups: dict[str, list[tuple[int, int]]] = defaultdict(list)
    counts: Counter = Counter()
    for et, t, eid, tsna in zip(ev.event_type, us, ev.event_id, ev.ts.isna()):
        counts[et] += 1
        if not tsna:
            groups[et].append((int(t), int(eid)))
    got = CATALOG["agg_minmax_by"].builder(spark, sf_dir).toPandas()
    assert len(got) == len(counts)
    for r_ in got.itertuples():
        rows = groups[r_.event_type]
        assert int(r_.first_event_id) == min(rows)[1]
        assert int(r_.last_event_id) == max(rows)[1]
        assert int(r_.n_events) == counts[r_.event_type]
