"""Session-portability gate: every registered query must pass its
oracle under a SparkSession the engine did NOT configure.

Round-1 regression this guards: the driver's harness builds a vanilla
session, so configs applied in ``session.get_spark`` (nanosAsLong,
inferTimestampNTZ, UTC tz) silently vanish — 13 queries crashed there
while 149 engine-session tests stayed green. ``io.load`` now pins the
required runtime SQLConfs itself; this test proves it from a clean
JVM (a subprocess, because builder configs live in the shared
SparkConf of this test session's JVM and would contaminate an
in-process ``newSession()``).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "vanilla_parity.py")


def test_all_queries_pass_under_vanilla_session(sf_dir):
    proc = subprocess.run(
        [sys.executable, SCRIPT, sf_dir],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    # last stdout line is the JSON report (Spark may log above it)
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON report; stdout={proc.stdout!r} stderr={proc.stderr[-2000:]}"
    report = json.loads(lines[-1])
    assert report["ok"], (
        f"{len(report['failures'])} of {report['n']} queries failed under a "
        f"vanilla session:\n"
        + "\n".join(f"--- {k}\n{v}" for k, v in report["failures"].items())
    )
    assert proc.returncode == 0
