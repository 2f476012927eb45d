"""Explicit skew-defusing salted join (north rule: "partitioning / shuffle /
skew handled explicitly").

The pipeline's built-in skew strategy is structural (hub-star identity
edges, broadcast dictionary joins) plus AQE's runtime skew-join splitting.
This utility covers the remaining case: a large⋈medium equi-join whose key
distribution is hot (one entity mentioned in millions of turns) where the
medium side is too big to broadcast.

``salted_join(big, small, key, n_salt)``: the big side gets a random-free
deterministic salt ``pmod(xxhash64(whole row), n_salt)``; the small side is
exploded n_salt ways. The join key becomes (key, salt) — a single hot key
spreads over n_salt reducers at the cost of replicating the small side
n_salt times (the classic trade; choose n_salt ≈ skew factor / target
partition size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


#: join types whose output is correct under n_salt-way small-side replication
#: (the big side is preserved / probed; the small side only matches). 'right'/
#: 'full' would duplicate unmatched small-side rows n_salt times.
_SAFE_HOW = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"}


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salt: int = 16, how: str = "inner"
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the hot-key load spread over
    ``n_salt`` reducers. Deterministic (salt is a hash of the big row, not
    rand()) so output is invariant to partitioning and resumable.

    Only big-side-preserving join types are allowed — small-side-preserving
    semantics ('right'/'full') would emit each unmatched small-side row once
    per salt replica."""
    if how not in _SAFE_HOW:
        raise ValueError(
            f"salted_join: how={how!r} not supported — the small side is replicated "
            f"{n_salt}x; use one of {sorted(_SAFE_HOW)}"
        )
    big_s = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt)).cast("int")
    )
    small_s = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return big_s.join(small_s, [key, SALT_COL], how).drop(SALT_COL)
