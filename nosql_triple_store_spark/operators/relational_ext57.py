"""Fifty-seventh extension batch (round 5): skew under DATA, not just
unit fixtures — a deliberately Zipf-skewed join registered as a
workload, proving the engine's two skew answers (AQE skew-join
splitting, salting) on a hot key that actually dominates the shuffle.

Lineage: the reference's shard-routing layer assumes uniform subject
hashing (MasterServer range splits); a hot subject silently overloads
one shard with no recourse. Here the hot key is measurable
(q_meta_join_skew), split at runtime by AQE (tests/test_skew_data.py
asserts the skewed-partition reads in the adaptive plan), and fully
mitigable by salting (q_join_salted) — VERDICT r4 #7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..widths import fanout_width

# ~70% of lineitem rows land on hot key 0 (last order-key digit 0-6);
# the rest spread over the 30 residues {7..97 step 10, 8..98, 9..99}.
_HOT_KEY_SQL = (
    "CASE WHEN l_orderkey % 10 < 7 THEN 0 ELSE l_orderkey % 100 END"
)
_N_DIM = 100


def _skewed_sides(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    # AQE splits a skewed reduce partition at MAP-OUTPUT granularity:
    # the single-file fixture scan is ONE map task, which would leave
    # nothing to split (a 100 TB table has thousands of map tasks and
    # needs no such spread). The fan-out emulates the multi-mapper
    # shuffle the optimization actually operates on.
    li = load_table(spark, sf_dir, "lineitem").repartition(
        fanout_width(spark)
    )
    big = li.select(
        F.when(F.pmod("l_orderkey", F.lit(10)) < 7, F.lit(0))
        .otherwise(F.pmod("l_orderkey", F.lit(100)))
        .cast("long")
        .alias("hk"),
        "l_quantity",
        "l_extendedprice",
    )
    dim = spark.range(_N_DIM).select(
        F.col("id").alias("hk"),
        F.when(F.col("id") == 0, F.lit("hot"))
        .otherwise(F.lit("cold"))
        .alias("tier"),
    )
    return big, dim


@register(
    "q_join_skewed",
    oracle=f"""
WITH big AS (
  SELECT {_HOT_KEY_SQL} AS hk, l_quantity, l_extendedprice FROM lineitem),
dim AS (
  SELECT r AS hk, CASE WHEN r = 0 THEN 'hot' ELSE 'cold' END AS tier
  FROM (SELECT unnest(range({_N_DIM})) AS r))
SELECT b.hk, d.tier,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(b.l_quantity) AS BIGINT) AS qty,
       ROUND(SUM(b.l_extendedprice), 2) AS revenue
FROM big b JOIN dim d ON b.hk = d.hk
GROUP BY b.hk, d.tier
""",
)
def q_join_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Zipf-skewed join workload: ~70% of the fact rows carry ONE
    join key, the canonical shape that melts a uniform hash shuffle
    (one reducer gets 70% of the data). The dim side carries a merge
    hint so the join compiles to a sort-merge join — the strategy AQE's
    skew-join splitting applies to — rather than a broadcast that would
    sidestep the skew (a broadcast is of course the FIRST fix for a
    100-row dim; this query exists to prove the path where the dim is
    too big to broadcast). Under the engine session
    (spark.sql.adaptive.skewJoin.enabled=true) the hot partition is
    split into sub-reads at runtime; tests/test_skew_data.py lowers the
    split threshold to fixture scale and asserts the adaptive plan
    reads the hot partition as multiple skew-split chunks. Results are
    split-invariant (the oracle checks values, not placement).

    Scale: at 100 TB a 70%-hot key is ~70 TB into one task without
    mitigation. AQE splits it into advisory-sized chunks because the
    dim side can replicate per chunk; when even sub-partitions
    overwhelm (or AQE is off), functions/skew.salted_join spreads the
    key over n reducers (q_join_salted is that twin on real data).
    """
    big, dim = _skewed_sides(spark, sf_dir)
    j = big.join(dim.hint("merge"), "hk")
    return j.groupBy("hk", "tier").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").cast("long").alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


@register(
    "q_join_skewed_salted",
    oracle=f"""
WITH big AS (
  SELECT {_HOT_KEY_SQL} AS hk, l_quantity, l_extendedprice FROM lineitem),
dim AS (
  SELECT r AS hk, CASE WHEN r = 0 THEN 'hot' ELSE 'cold' END AS tier
  FROM (SELECT unnest(range({_N_DIM})) AS r))
SELECT b.hk, d.tier,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(b.l_quantity) AS BIGINT) AS qty,
       ROUND(SUM(b.l_extendedprice), 2) AS revenue
FROM big b JOIN dim d ON b.hk = d.hk
GROUP BY b.hk, d.tier
""",
)
def q_join_skewed_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same Zipf-skewed join resolved by SALTING instead of AQE:
    the hot key's rows scatter over 16 (key, salt) reducers and the
    100-row dim replicates 16x — identical results (same oracle as
    q_join_skewed), no runtime re-planning required. This is the
    mitigation that also works where AQE cannot reach (streaming state
    joins, non-SMJ strategies)."""
    from ..functions.skew import salted_join

    big, dim = _skewed_sides(spark, sf_dir)
    j = salted_join(big, dim, on=["hk"], n_salts=16)
    return j.groupBy("hk", "tier").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").cast("long").alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )
