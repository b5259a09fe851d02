"""Forty-fourth extension batch: spatial grid join and power-of-two
histogram.

Lineage: opens the engine's SPATIAL family — proximity self-join via
integer grid cells, the geohash-bucketing recipe every geo pipeline
uses to avoid the all-pairs distance matrix — and adds the log2
(power-of-two) histogram, the heavy-tail magnitude census whose
bucket function is EXACT integer arithmetic (binary length of the
cents value), never floor(log2(float)) with its boundary ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_HASH_SQL = (
    "CAST(((({key}) % 2147483648) * 2654435761 + 12345) % 4294967296"
    " AS BIGINT)"
)
_RADIUS = 0.25  # planar degrees; cell width = radius (see docstring)
# the synthetic region's side grows with sqrt(n) so per-DEGREE density
# — and with it each point's candidate count — stays CONSTANT as rows
# scale (the real-geo invariant: more points cover more area). The
# fixed 10x10 domain measured quadratic at the r7 sf1 sweep: 150k
# points in the same 100 deg^2 = 100x the candidate pairs of sf0.1.
_TARGET_DEG2_DENSITY = 150
# the two affine hashes of u land points on a LATTICE (affine maps of
# the same input are linearly dependent mod 2^32: at side=32 only
# 288/1024 cells were occupied, hot cells pairing quadratically —
# 117M result rows at sf1). Reducing each hash by its own large prime
# BEFORE the grid modulus breaks the affinity; measured occupancy is
# every cell within ~10% of the ideal density at both side=10 and 32.
_LAT_PRIME = 999983
_LON_PRIME = 999979


@register(
    "q_join_spatial_grid",
    oracle=f"""
WITH c AS (SELECT DISTINCT c_custkey AS u FROM customer),
side AS (
  SELECT GREATEST(
           10,
           CAST(CEIL(SQRT(COUNT(*) / {_TARGET_DEG2_DENSITY}.0)) AS BIGINT)
         ) AS s
  FROM c),
pts AS (
  SELECT u,
         (({_HASH_SQL.format(key='u')} % {_LAT_PRIME}) % (100 * s))
           / 100.0 AS lat,
         (({_HASH_SQL.format(key='u * 2 + 1')} % {_LON_PRIME}) % (100 * s))
           / 100.0 AS lon
  FROM c, side),
cells AS (
  SELECT u, lat, lon,
         CAST(FLOOR(lat / {_RADIUS}) AS BIGINT) AS cx,
         CAST(FLOOR(lon / {_RADIUS}) AS BIGINT) AS cy
  FROM pts),
pairs AS (
  SELECT a.u AS u1, b.u AS u2,
         (a.lat - b.lat) * (a.lat - b.lat)
           + (a.lon - b.lon) * (a.lon - b.lon) AS d2
  FROM cells a
  JOIN cells b
    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
   AND b.u > a.u
  WHERE (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon)
        <= {_RADIUS} * {_RADIUS})
SELECT u1, u2, d2 FROM pairs
""",
)
def q_join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial proximity self-join on a radius-width grid: each
    customer gets a deterministic location (prime-decorrelated hash →
    exact decimal coordinates) in a region whose side grows with
    sqrt(n) at constant density, points land in cells of width
    _RADIUS, and candidate pairs come from each cell joined against
    its 3x3 neighborhood — the geohash-bucketing recipe that turns an
    O(n²) distance matrix into O(n · local-density). The exact planar
    distance predicate (squared — no sqrt, so the comparison is a pure
    product-sum both engines evaluate bit-identically) filters
    candidates; d2 is emitted raw (identical IEEE expression, no
    rounding needed; lat/0.25 is lat*4, exponent-exact, so the cell
    floor matches bit-for-bit too). Geodesic (haversine) distance is a
    drop-in predicate swap; the GRID mechanics — the scale part —
    don't change.

    Scale: the join key is (cell_x, cell_y) — an equi-join after a
    tiny 9-cell neighbor explode, shuffled by cell. Skewed cells
    (urban density) are the familiar hot-key problem; the dedup.py
    df-cap / salting guards apply per cell. The synthetic region's
    side grows with sqrt(n) (one bounded count() layout scalar) so
    per-cell density is constant — the r7 sf1 sweep measured the
    fixed-domain version quadratic (735 s at 150k points); with
    constant density, candidates AND result rows are O(n).
    """
    import math

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("u")
    ).distinct()
    # bounded layout scalar (like the ETL split-point sample): region
    # side in cells, sized so per-cell density is constant in n
    side = max(
        10, math.ceil(math.sqrt(cust.count() / float(_TARGET_DEG2_DENSITY)))
    )
    mod = 100 * side
    pts = cust.select(
        "u",
        (
            F.expr(_HASH_SQL.format(key="u")) % _LAT_PRIME % mod / 100.0
        ).alias("lat"),
        (
            F.expr(_HASH_SQL.format(key="u * 2 + 1")) % _LON_PRIME % mod
            / 100.0
        ).alias("lon"),
    )
    cells = pts.select(
        "u",
        "lat",
        "lon",
        F.floor(F.col("lat") / _RADIUS).alias("cx"),
        F.floor(F.col("lon") / _RADIUS).alias("cy"),
    )
    probe = cells.select(
        F.col("u").alias("pu"),
        F.col("lat").alias("plat"),
        F.col("lon").alias("plon"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("qx"),
                        (F.col("cy") + dy).alias("qy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("q"),
    ).select("pu", "plat", "plon", "q.qx", "q.qy")
    d2 = (F.col("lat") - F.col("plat")) * (
        F.col("lat") - F.col("plat")
    ) + (F.col("lon") - F.col("plon")) * (F.col("lon") - F.col("plon"))
    return (
        cells.join(
            probe,
            (F.col("cx") == F.col("qx"))
            & (F.col("cy") == F.col("qy"))
            & (F.col("u") > F.col("pu")),
        )
        .filter(d2 <= _RADIUS * _RADIUS)
        .select(
            F.col("pu").alias("u1"),
            F.col("u").alias("u2"),
            d2.alias("d2"),
        )
    )


@register(
    "q_agg_log2_histogram",
    oracle="""
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
b AS (
  SELECT length(format('{:b}', cents)) AS bucket FROM c)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(1 AS BIGINT) << (bucket - 1) AS BIGINT) AS lo_cents,
       CAST((CAST(1 AS BIGINT) << bucket) - 1 AS BIGINT) AS hi_cents
FROM b GROUP BY bucket
""",
)
def q_agg_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-two magnitude histogram of order totals: bucket =
    bit-length of the integer cents value (bucket b holds values in
    [2^(b-1), 2^b)), the log-spaced census heavy-tail monitoring uses.
    The bucket function is EXACT — binary string length of an integer
    — never floor(log2(double)), whose last-ulp behavior at exact
    powers of two differs between libms; that is the same
    integer-not-float discipline as q_agg_benford's digit extraction.

    Scale: one scan, one codegen'd expression, one 30-ish-group hash
    aggregation — partial-aggregable everywhere.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    b = orders.select(F.length(F.bin(cents)).cast("long").alias("bucket"))
    return (
        b.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            "n",
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT)"
                " - 1) AS BIGINT)"
            ).alias("lo_cents"),
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))"
                " - 1 AS BIGINT)"
            ).alias("hi_cents"),
        )
    )