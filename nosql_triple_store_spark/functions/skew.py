"""Skew mitigation: salted joins (task brief: 'skewed keys hurt …
salting for skew').

AQE's skew-join splitting handles most cases at runtime (enabled in
session.py); explicit salting remains the tool when one join key is so
hot that even split sub-partitions overwhelm a task, or when AQE is
unavailable (streaming state joins). Mechanics: the big side gets a
deterministic salt in [0, n) appended to the key; the small side is
exploded n× (one copy per salt) so every (key, salt) pair still matches —
shuffle load for the hot key spreads across n reducers at the cost of
n× the small side's shuffle volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    The salt is a deterministic hash of the big side's full row (stable
    across runs/partitionings, so results stay hash-comparable — a
    rand()-based salt would also be correct but non-reproducible).
    Result equals big.join(small, on, how) exactly
    (tests/test_skew.py asserts this).
    """
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(f"column {_SALT} already exists")
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "left_anti", "leftsemi", "leftanti"):
        # right/full joins would emit the replicated small side's
        # unmatched copies n times — semantically wrong under salting
        raise ValueError(f"salted_join does not support how={how!r}")
    big_s = big.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)),
    )
    small_r = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("long"))
    return big_s.join(small_r, on=[*on, _SALT], how=how).drop(_SALT)
