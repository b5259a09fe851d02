"""Scale-safe per-group top-k.

The naive plan — ``row_number() OVER (PARTITION BY group ORDER BY ...)``
then ``<= k`` — materializes EVERY group as one window partition: with
few large groups (5 event types, 8 KNN probes) each window task holds
an O(n/groups) slice, which is the single-giant-partition anti-pattern
SCALE.md bans for raw rows. This helper runs the classic two-stage
tournament instead:

  stage 1: rank within (group, salt) — ``n_salt`` bounded slices per
           group, each task sees ~n/(groups*n_salt) rows;
  stage 2: rank the surviving ``k * n_salt`` rows per group — a window
           over a PARAMETER-bounded frame, never data-bounded.

Identical output to the naive plan for any deterministic total order
(the order columns must break ties fully — same contract as every
rank-based oracle in this repo).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SALT = 32


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    salt_on: str,
    n_salt: int = DEFAULT_SALT,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group under a total order, two-stage salted.

    ``salt_on`` names a column whose hash spreads each group's rows
    across ``n_salt`` slices (any high-cardinality column works; the
    row's own key is the usual choice). The returned frame carries all
    input columns plus ``rank_col`` (1-based within group).
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(salt_on), F.lit(n_salt))
    )
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order_cols)
    local = salted.withColumn("__lr", F.row_number().over(w1)).filter(
        F.col("__lr") <= k
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        local.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
        .drop("__salt", "__lr")
    )
