"""Targeted checks for the thirteenth extension batch."""

from __future__ import annotations

import pyspark.sql.functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.relational_ext13 import (
    q_gap_fill,
    q_text_pii_mask,
)

from .conftest import SF_DIR


def test_documents_text_is_pure_ascii(spark):
    """q_multimodal_audio_chunks' oracle slices VARCHAR where the engine
    slices bytes — valid only while the fixture text is pure ASCII. If
    the fixture ever grows multibyte chars, this fails before the oracle
    silently diverges."""
    docs = load_table(spark, SF_DIR, "documents")
    bad = docs.filter(
        F.octet_length(F.encode("text", "UTF-8")) != F.length("text")
    ).count()
    assert bad == 0


def test_gap_fill_dense_and_monotone(spark):
    """Every user's spine is dense (one row per day of their span) and
    filled values only change on observed days."""
    out = q_gap_fill(spark, SF_DIR)
    per_user = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("span"),
        F.sum("observed").alias("n_obs"),
    )
    bad = per_user.filter(F.col("n") != F.col("span")).count()
    assert bad == 0
    # fills exist: at least one user has a gap (n > n_obs)
    assert per_user.filter(F.col("n") > F.col("n_obs")).count() > 0
    # no nulls after fill (spines start at first observed day)
    assert out.filter(F.col("v_filled").isNull()).count() == 0


def test_pii_mask_masks_everything(spark):
    """After masking, no email/phone pattern survives, and every doc had
    at least one of each (synthetic augmentation is non-vacuous)."""
    out = q_text_pii_mask(spark, SF_DIR)
    assert out.filter((F.col("n_emails") < 1) | (F.col("n_phones") < 1)).count() == 0
    # re-run the masking pipeline and grep the masked text directly
    docs = load_table(spark, SF_DIR, "documents")
    aug = docs.select(
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("raw")
    )
    from nosql_triple_store_spark.operators.relational_ext13 import (
        _EMAIL_RE,
        _PHONE_RE,
    )

    masked = aug.select(
        F.regexp_replace(
            F.regexp_replace("raw", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("masked")
    )
    leftovers = masked.filter(
        F.col("masked").rlike(_EMAIL_RE) | F.col("masked").rlike(_PHONE_RE)
    ).count()
    assert leftovers == 0
