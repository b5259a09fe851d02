"""Forty-third extension batch: privacy mechanisms — seeded
differential-privacy counts and an l-diversity census.

Lineage: extends q_privacy_kanon into the release-side toolkit: the
Laplace mechanism actually perturbs published aggregates (here with
REPRODUCIBLE seeded noise — inverse-CDF over the engine's affine hash
— because a data-release pipeline must be able to re-emit the exact
artifact it signed; rotating the seed per release is the production
knob), and l-diversity grades quasi-identifier groups by how many
distinct sensitive values they carry (k-anonymity alone fails when a
uniform group leaks the attribute).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE

_HASH_SQL = (
    "CAST(((({key}) % 2147483648) * 2654435761 + 12345) % 4294967296"
    " AS BIGINT)"
)
# stable integer key for a (short) string group label
_STRKEY_SQL = "(ascii({col}) * 31 + length({col}))"


@register(
    "q_privacy_dp_count",
    oracle=f"""
{E_CTE},
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1),
u AS (
  SELECT event_type, n,
         ({_HASH_SQL.format(key=_STRKEY_SQL.format(col='event_type'))}
          % 1000000 + 0.5) / 1000000.0 AS uu
  FROM g)
SELECT event_type,
       ROUND(n + CASE WHEN uu < 0.5 THEN LN(2 * uu)
                      ELSE -LN(2 * (1 - uu)) END, 3) + 0
         AS noisy_count,
       1.0 AS epsilon
FROM u
""",
)
def q_privacy_dp_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=1 Laplace-mechanism counts per event type: each published
    count is perturbed by Laplace(1/ε) noise drawn via inverse CDF
    from a SEEDED uniform (the affine hash of the group label), so the
    release is bit-reproducible — rerunning the pipeline re-signs the
    identical artifact, and rotating the hash seed is the per-release
    randomness. True counts never appear in the output (sensitivity 1:
    one user's event moves a count by at most 1, the textbook
    counting-query calibration).

    Scale: one hash aggregation plus a constant-cost noise expression
    per group — the mechanism adds zero distributed work. ln() is the
    only float call; both engines' libm agree far below the 3-dp
    release grain.
    """
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    key = _STRKEY_SQL.format(col="event_type")
    u = g.withColumn(
        "uu",
        (
            F.expr(_HASH_SQL.format(key=key)) % 1_000_000
            + F.lit(0.5)
        )
        / 1_000_000.0,
    )
    return u.select(
        "event_type",
        (
            F.round(
                F.col("n")
                + F.when(
                    F.col("uu") < 0.5, F.log(2 * F.col("uu"))
                ).otherwise(-F.log(2 * (1 - F.col("uu")))),
                3,
            )
            + F.lit(0.0)
        ).alias("noisy_count"),
        F.lit(1.0).alias("epsilon"),
    )


@register(
    "q_privacy_l_diversity",
    oracle="""
WITH g AS (
  SELECT c_nationkey AS nat,
         CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_band,
         CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM customer GROUP BY 1, 2)
SELECT l,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows
FROM g GROUP BY l
""",
)
def q_privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity census: for quasi-identifier groups (nation,
    balance band), count DISTINCT values of the sensitive attribute
    (market segment) per group, then histogram groups by that l —
    the release gate that catches what k-anonymity misses (a group of
    k=50 rows all in one segment still leaks the segment). Groups at
    l=1 are the disclosure risk; the publisher generalizes or
    suppresses them.

    Scale: COUNT(DISTINCT) per group plans as two stacked hash
    aggregations (exact, partial-aggregable on the first level); the
    histogram input is bounded by the QI domain.
    """
    cust = load_table(spark, sf_dir, "customer")
    g = cust.groupBy(
        F.col("c_nationkey").alias("nat"),
        F.floor(F.col("c_acctbal") / 2000).alias("bal_band"),
    ).agg(
        F.countDistinct("c_mktsegment").alias("l"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return g.groupBy("l").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n_rows").alias("n_rows"),
    )
