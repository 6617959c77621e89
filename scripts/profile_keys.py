"""Optimization-round profiling harness (guide §1).

Times catalog keys isolated through the noop sink (min-of-N with the
full run list printed), optionally dumps ``explain("formatted")`` to a
file per key, and counts the Spark jobs/stages each query schedules —
the stage count is the per-key fixed overhead proxy at toy scale and
the shuffle-count proxy at 100 TB.

Usage:
    python scripts/profile_keys.py [--runs N] [--explain-dir DIR]
                                   [--sf-dir DIR] [key ...]
Defaults: 5 runs, no explain dump, $SPARK_GRAFT_SF_DIR or
/root/testdata/sf0.1, all catalog keys (sorted, bench order).
Prints one line per key:  <key> min=<s> runs=[...] jobs=<n> stages=<n>
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreducepy_spark.registry import load_catalog
from mapreducepy_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="", help="filename suffix for explain dumps")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    spark = get_spark(app_name="profile-keys")
    spark.sparkContext.setLogLevel("ERROR")
    cat = load_catalog()
    keys = args.keys or sorted(cat)

    # same warm-up as bench.py so numbers are comparable
    from mapreducepy_spark.io import load

    load(spark, args.sf_dir, "lineitem").count()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)

    tracker = spark.sparkContext.statusTracker()
    total = 0.0
    for name in keys:
        q = cat.get(name)
        if q is None:
            print(f"{name} ERROR unknown key", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        runs: list[float] = []
        jobs_before = len(tracker.getJobIdsForGroup(None) or [])
        for i in range(args.runs):
            if i == 1:
                jobs_before = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = q.builder(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
            if i == 1:
                jobs_run1 = len(tracker.getJobIdsForGroup(None) or []) - jobs_before
        jobs = jobs_run1 if args.runs > 1 else -1
        if args.explain_dir:
            df = q.builder(spark, args.sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(txt)
        spark.sparkContext.setJobDescription(None)
        total += min(runs)
        print(
            f"{name} min={min(runs):.3f} runs=[{', '.join(f'{r:.2f}' for r in runs)}]"
            f" jobs_run2={jobs}",
            flush=True,
        )
    print(f"profile_keys: {len(keys)} keys, sum-of-min {total:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
