"""The bench artifact's line-capture contract (VERDICT r13 #1/#2).

The driver preserves only a bounded slice of bench stdout and parses
it line-wise, so every line the driver must reconstruct has to stay
under ~2 KB serialized. These tests pin that bound for the chunked
``per_query_part`` emission and prove the chunks are lossless — a
reader merging the parts recovers exactly the legacy line's per-key
map plus the max/cold companions.

No Spark session needed: the helpers are pure functions.
"""

from __future__ import annotations

import json
import random
import string

import bench


def _fake_catalog(n: int, seed: int = 7):
    rng = random.Random(seed)
    timings, spreads, colds = {}, {}, {}
    for i in range(n):
        name = (
            "".join(rng.choices(string.ascii_lowercase + "_", k=rng.randint(8, 40)))
            + f"_{i}"
        )
        lo = round(rng.uniform(0.05, 9.999), 3)
        hi = round(lo + rng.uniform(0, 12.0), 3)
        timings[name] = lo
        spreads[name] = (lo, hi)
        colds[name] = hi
    return timings, spreads, colds


def test_parts_are_bounded_and_lossless():
    # 500 keys with long names — well past the 232-key catalog that
    # overflowed the driver's capture in r13
    timings, spreads, colds = _fake_catalog(500)
    parts = bench.per_query_parts(timings, spreads, colds, sf_val=0.1)
    assert parts, "non-empty catalog must produce at least one part"
    merged_q, merged_x, merged_c = {}, {}, {}
    for i, p in enumerate(parts, start=1):
        line = json.dumps(p)
        assert len(line) < 2000, f"part {i} serializes to {len(line)} B"
        assert p["metric"] == "per_query_part"
        assert p["part"] == i and p["of"] == len(parts)
        assert set(p["queries"]) == set(p["qmax"]) == set(p["qcold"])
        assert not (set(p["queries"]) & set(merged_q)), "no key overlap"
        merged_q.update(p["queries"])
        merged_x.update(p["qmax"])
        merged_c.update(p["qcold"])
    assert merged_q == timings
    assert merged_x == {k: v[1] for k, v in spreads.items()}
    assert merged_c == colds


def test_single_small_catalog_is_one_part():
    timings, spreads, colds = _fake_catalog(3)
    parts = bench.per_query_parts(timings, spreads, colds, sf_val=0.01)
    assert len(parts) == 1
    assert parts[0]["part"] == 1 and parts[0]["of"] == 1


def test_known_cost_whys_leave_final_line_room():
    # The final summary line must stay parseable even if every
    # annotated key trips at once: with every why truncated to 160
    # chars the serialized over_budget_known map plus the fixed
    # fields has to fit the same ~2 KB capture bound.  This guards
    # against someone growing _KNOWN_COSTS without noticing the
    # line-size budget.
    worst = {
        k: {
            "sec": 9.999,
            "max": 99.999,
            "ceiling": ceiling,
            "why": why[:160] + ("…" if len(why) > 160 else ""),
        }
        for k, (ceiling, why) in list(bench._KNOWN_COSTS.items())[:6]
    }
    line = json.dumps(
        {
            "metric": "total_runtime_all_queries",
            "value": 999.999,
            "value_cold": 999.999,
            "unit": "sec",
            "sf": 0.1,
            "n_queries": 500,
            "runs_per_query": 3,
            "per_query_parts": 40,
            "over_budget": {},
            "over_budget_known": worst,
            "loadavg_before": [99.99, 99.99, 99.99],
            "loadavg_after": [99.99, 99.99, 99.99],
        }
    )
    assert len(line) < 2000, f"final line would be {len(line)} B"


def test_fill_log_records_and_windows():
    from mapreducepy_spark import session_cache

    before = len(session_cache.fill_log())
    session_cache.note_fill("unit_test_artifact", 1.23456)
    log = session_cache.fill_log()
    assert len(log) == before + 1
    assert log[-1] == {"tag": "unit_test_artifact", "sec": 1.235}
