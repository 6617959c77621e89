"""Skew mitigation: salted joins.

AQE's skew-join split (``spark.sql.adaptive.skewJoin``) handles
skewed SORT-MERGE joins by splitting oversized partitions at runtime,
and is the first line of defense (on by default in the engine's
session). Salting is the explicit fallback for the cases AQE can't
fix — a single hot key whose rows must still meet every row of the
other side (AQE can split the partition, but the hot key's build side
must then be replicated; for shuffled-hash joins and aggregations
AQE's splitter doesn't apply at all).

Mechanics: the skewed (big) side gets a per-ROW salt in [0, n); the
small side is exploded n× with every salt value. Joining on
(key, salt) spreads one hot key over n tasks at the cost of
replicating the small side n× — worth it exactly when the small side
is orders of magnitude smaller, which is the skew scenario.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

# Join modes where exploding the small side n_salts× cannot change the
# result: every preserved row comes from the big side (or from a
# matched pair, which exists for exactly one salt value per big row).
# right/full (and right_semi/right_anti) would emit each UNMATCHED
# small-side row once per salt value — n_salts duplicates vs the
# unsalted join — so they are rejected, not silently wrong.
_SALTABLE_HOW = frozenset({"inner", "left", "left_outer", "leftouter",
                           "left_semi", "leftsemi", "left_anti", "leftanti",
                           "semi", "anti", "cross"})


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` with ``big``'s rows salted across
    ``n_salts`` sub-keys. ``on`` is the equi-condition as a Column
    (e.g. ``big.k == small.k``); the salt equality is added to it.

    The salt is a deterministic per-row hash of the big side's whole
    row (NOT of the join key — same-key rows must scatter, which is
    the entire point). For the supported ``how`` modes (big-side
    preserving: inner / left / left_semi / left_anti) the result
    equals the unsalted join exactly; the salt columns never escape.
    right / full / right_semi / right_anti would duplicate unmatched
    small-side rows once per salt and raise ``ValueError`` instead.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALTABLE_HOW}:
        raise ValueError(
            f"salted_join supports big-side-preserving modes only "
            f"(inner/left/left_semi/left_anti/cross), not how={how!r}: "
            f"the exploded small side would emit each unmatched small "
            f"row {n_salts}x."
        )
    big_s = big.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    small_s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = big_s.join(small_s, on & (big_s[_SALT] == small_s[_SALT]), how)
    return joined.drop(_SALT)
