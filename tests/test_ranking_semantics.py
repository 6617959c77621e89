"""Three-way semantics pin for the ranking-function family.

``ntile`` / ``percent_rank`` / ``cume_dist`` feed win_ntile,
win_dist, and the RFM quartile grid. Their per-key refs exercise the
fixture's geometries only; THIS pin sweeps group sizes 1..40 and
bucket counts 1..7 on a generated table and requires Spark, DuckDB,
and the plain-python formulas to agree row-for-row — the bucket
arithmetic (first n%b buckets one row larger), the (rank-1)/(n-1)
percent-rank convention with its n=1 zero case, and cume_dist as
rows<=current/n. A Spark or DuckDB version bump that changes any of
these semantics fails here, naming the primitive, instead of as an
opaque hash mismatch in a downstream key.
"""

from __future__ import annotations

import duckdb
import pytest


def _py_ntile(n: int, b: int, pos: int) -> int:
    base, extra = divmod(n, b)
    cut = extra * (base + 1)
    if pos <= cut:
        return (pos - 1) // (base + 1) + 1
    return extra + (pos - cut - 1) // base + 1


_GEOMETRIES = [(n, b) for n in (1, 2, 3, 5, 8, 13, 40) for b in (1, 2, 4, 7)]


def test_ranking_functions_three_way(spark):
    rows = []
    for gid, (n, b) in enumerate(_GEOMETRIES):
        rows.extend((gid, pos, b) for pos in range(1, n + 1))
    df = spark.createDataFrame(rows, "gid int, pos int, b int")
    df.createOrReplaceTempView("ranks_pin")
    sql_by_bucket = {
        b: f"""
            SELECT gid, pos,
                   NTILE({b}) OVER w AS nt,
                   PERCENT_RANK() OVER w AS pr,
                   CUME_DIST() OVER w AS cd
            FROM ranks_pin WHERE b = {b}
            WINDOW w AS (PARTITION BY gid ORDER BY pos ASC)
        """
        for b in sorted({b for _, b in _GEOMETRIES})
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ranks_pin (gid INT, pos INT, b INT)"
    )
    con.executemany("INSERT INTO ranks_pin VALUES (?, ?, ?)", rows)
    sizes = {
        gid: n for gid, (n, _) in enumerate(_GEOMETRIES)
    }
    for b, sql in sql_by_bucket.items():
        spark_rows = {
            (r.gid, r.pos): (r.nt, r.pr, r.cd)
            for r in spark.sql(sql).collect()
        }
        duck_rows = {
            (gid, pos): (nt, pr, cd)
            for gid, pos, nt, pr, cd in con.execute(sql).fetchall()
        }
        assert set(spark_rows) == set(duck_rows)
        for (gid, pos), (nt, pr, cd) in spark_rows.items():
            n = sizes[gid]
            exp_nt = _py_ntile(n, b, pos)
            exp_pr = 0.0 if n == 1 else (pos - 1) / (n - 1)
            exp_cd = pos / n
            assert nt == exp_nt, (gid, pos, b)
            assert pr == pytest.approx(exp_pr, abs=1e-12), (gid, pos, b)
            assert cd == pytest.approx(exp_cd, abs=1e-12), (gid, pos, b)
            dnt, dpr, dcd = duck_rows[(gid, pos)]
            assert dnt == exp_nt, (gid, pos, b)
            assert dpr == pytest.approx(exp_pr, abs=1e-12)
            assert dcd == pytest.approx(exp_cd, abs=1e-12)
