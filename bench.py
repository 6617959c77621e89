"""Per-round benchmark: run the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line.

Timing methodology: each query is fully executed through the ``noop``
sink (materializes every row JVM-side, no driver collect, no disk) —
measures plan execution, which is what scales. Each query runs
``_RUNS`` times (3) and reports the min: the steady-state number
(first runs absorb codegen/scan-cache/Python-worker warm-up
unevenly, and this box shows heavy run-to-run contention noise —
measured same-code totals swing 44–90 s — so the min over three is
the honest steady-state read; the JSON records the run count). JVM
+ Python-worker startup are warmed once up front and never billed.
"""

from __future__ import annotations

import json
import os
import sys
import time

_RUNS = 3

from mapreducepy_spark.registry import load_catalog
from mapreducepy_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(app_name="mapreducepy-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = load_catalog()

    # warm-up: touch the biggest table so JVM/IO startup isn't billed,
    # and run one trivial Arrow batch so Python-worker startup isn't
    # billed to the first pandas-UDF query
    from mapreducepy_spark.io import load

    load(spark, sf_dir, "lineitem").count()
    spark.range(32).mapInPandas(lambda it: it, "id long").count()

    timings: dict[str, float] = {}
    for name in sorted(catalog):
        q = catalog[name]
        best = float("inf")
        for _ in range(_RUNS):
            t0 = time.perf_counter()
            df = q.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_runtime_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "runs_per_query": _RUNS,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
