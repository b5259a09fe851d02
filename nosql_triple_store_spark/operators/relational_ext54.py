"""Fifty-fourth extension batch: metric driver decomposition and
column-level encryption.

Lineage: "revenue moved -3% — was it traffic or spend-per-event, and
in which segment?" is the metric-tree decomposition every analytics
team builds over its warehouse; the volume/rate/interaction split is
the exact algebra behind those dashboards. Column encryption is the
governance sibling of q_text_pii_mask: masking destroys, encryption
round-trips for authorized readers — Spark ships aes_encrypt/
aes_decrypt as built-ins and the engine should exercise them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .triple import E_CTE

_SPLIT = "2024-01-16"


@register(
    "q_events_driver_decomposition",
    oracle=f"""
{E_CTE},
halves AS (
  SELECT event_type,
         CASE WHEN CAST(ts AS DATE) < DATE '{_SPLIT}' THEN 0 ELSE 1 END
           AS half,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(value) AS rev
  FROM e GROUP BY 1, 2),
w AS (
  SELECT a.event_type,
         a.n AS n0, b.n AS n1, a.rev AS rev0, b.rev AS rev1,
         a.rev / a.n AS r0, b.rev / b.n AS r1
  FROM halves a JOIN halves b
    ON a.event_type = b.event_type AND a.half = 0 AND b.half = 1)
SELECT event_type,
       ROUND(rev1 - rev0, 2) + 0 AS delta_rev,
       ROUND((n1 - n0) * r0, 2) + 0 AS volume_effect,
       ROUND(n0 * (r1 - r0), 2) + 0 AS rate_effect,
       ROUND((n1 - n0) * (r1 - r0), 2) + 0 AS interaction_effect
FROM w
""",
)
def q_events_driver_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric driver decomposition per event type between the two
    month halves: Δrevenue splits EXACTLY into volume (count change at
    the old rate), rate (per-event value change at the old count), and
    interaction — Δrev ≡ volume + rate + interaction by algebra, which
    the test asserts to the rounding grain. The answer to 'what moved
    the metric' that a bare WoW delta (q_events_wow_change) can't
    give. Identical expression trees in both engines; 2-dp grain.

    Scale: one (type, half) census — partial-aggregable — then a
    |types|-row self-join; nothing touches raw rows twice.
    """
    ev = load_table(spark, sf_dir, "events")
    half = F.when(
        F.col("ts").cast("date") < F.lit(_SPLIT).cast("date"), 0
    ).otherwise(1)
    halves = ev.groupBy("event_type", half.alias("half")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("rev")
    )
    a = halves.filter(F.col("half") == 0).select(
        "event_type",
        F.col("n").alias("n0"),
        F.col("rev").alias("rev0"),
        (F.col("rev") / F.col("n")).alias("r0"),
    )
    b = halves.filter(F.col("half") == 1).select(
        F.col("event_type").alias("et1"),
        F.col("n").alias("n1"),
        F.col("rev").alias("rev1"),
        (F.col("rev") / F.col("n")).alias("r1"),
    )
    w = a.join(b, a.event_type == b.et1)
    r2 = lambda c: (F.round(c, 2) + F.lit(0.0))  # noqa: E731
    return w.select(
        "event_type",
        r2(F.col("rev1") - F.col("rev0")).alias("delta_rev"),
        r2((F.col("n1") - F.col("n0")) * F.col("r0")).alias(
            "volume_effect"
        ),
        r2(F.col("n0") * (F.col("r1") - F.col("r0"))).alias("rate_effect"),
        r2(
            (F.col("n1") - F.col("n0")) * (F.col("r1") - F.col("r0"))
        ).alias("interaction_effect"),
    )


_AES_KEY = "0123456789abcdef"  # 16-byte demo key; prod: KMS-managed


@register(
    "q_privacy_column_encryption",
    oracle="""
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(length(c_name)) AS BIGINT) AS name_chars,
       CAST(COUNT(DISTINCT c_name) AS BIGINT) AS distinct_names
FROM customer GROUP BY 1
""",
)
def q_privacy_column_encryption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption round-trip: the PII column (customer
    name) is AES-GCM encrypted with Spark's built-in aes_encrypt —
    ciphertext is what an untrusted zone stores (GCM's random IV makes
    it non-deterministic BY DESIGN: equal plaintexts must not reveal
    equality) — then decrypted with the key and censused. The oracle
    runs the same census on the plaintext, proving the round trip is
    lossless; a wrong key or a truncated ciphertext breaks it. The
    governance complement to q_text_pii_mask: masking is one-way,
    encryption is policy-gated two-way.

    Scale: both codecs are codegen'd JVM expressions in the scan
    projection — no Python, no extra pass; key distribution (not
    compute) is the real production concern, hence the KMS note.
    """
    cust = load_table(spark, sf_dir, "customer")
    enc = cust.select(
        "c_mktsegment",
        F.expr(f"aes_encrypt(c_name, '{_AES_KEY}')").alias("cipher"),
    )
    dec = enc.select(
        "c_mktsegment",
        F.expr(
            f"CAST(aes_decrypt(cipher, '{_AES_KEY}') AS STRING)"
        ).alias("name"),
    )
    return dec.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("name")).alias("name_chars"),
        F.countDistinct("name").alias("distinct_names"),
    )
