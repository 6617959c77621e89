"""Stage a MULTI-FILE copy of a scale-factor fixture directory
(VERDICT r13 work order #6).

At sf0.1 every fixture table is ONE parquet file with ONE row group,
so every scan is a single task and scan parallelism — the thing that
matters at 100 TB — is structurally unmeasured by the bench (guide
§6: input split count drives map-side parallelism). This script
rewrites each table as ``n_files`` parquet part-files under
``dst_dir/<table>.parquet/`` (a directory source — ``io.load`` and
DuckDB's globbing both read it), so the same catalog keys can be
profiled with real multi-task scans at two core counts:

    python scripts/make_multifile_fixture.py /root/testdata/sf0.1 \
        /tmp/sf0.1x16 16
    SPARK_GRAFT_CPUS=32 python scripts/profile_keys.py \
        --sf-dir /tmp/sf0.1x16 <keys...>
    SPARK_GRAFT_CPUS=8  python scripts/profile_keys.py \
        --sf-dir /tmp/sf0.1x16 <keys...>

Row order changes (round-robin repartition) — every declared query is
row-order independent (deterministic aggregates/windows with total
tie-breaks), so results are identical; parity_sf.py can verify
against the same directory since DuckDB reads the part-file glob.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreducepy_spark.io import TABLES
from mapreducepy_spark.session import get_spark


def main() -> int:
    if len(sys.argv) != 4:
        print(__doc__)
        return 2
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    spark = get_spark(app_name="make-multifile-fixture")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        path = f"{src}/{t}.parquet"
        if not os.path.exists(path):
            print(f"{t}: missing in {src}, skipped")
            continue
        df = spark.read.parquet(path)
        df.repartition(n).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"{t}: {df.count()} rows -> {n} files", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
