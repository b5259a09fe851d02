"""Targeted checks for the twenty-first extension batch."""

from __future__ import annotations

import pyspark.sql.functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.relational_ext21 import (
    _LINE_DF_CAP,
    _MRL_K,
    q_events_survival,
    q_join_shuffle_hash,
    q_text_line_dedup,
    q_vector_matryoshka,
)

from .conftest import SF_DIR


def test_line_dedup_actually_drops_boilerplate(spark):
    """Some corpus lines must exceed the document-frequency cap (else
    the filter is vacuous), and cleaned docs lose those lines."""
    from nosql_triple_store_spark.functions.textfns import tokens_col

    docs = load_table(spark, SF_DIR, "documents")
    toks = docs.select("doc_id", tokens_col().alias("t"))
    lines = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), (F.size("t") / 3).cast("long") - 1),
                lambda i: F.concat_ws(" ", F.slice("t", i * 3 + 1, 3)),
            )
        ).alias("line"),
    )
    df = lines.groupBy("line").agg(F.countDistinct("doc_id").alias("n"))
    n_boiler = df.filter(F.col("n") > _LINE_DF_CAP).count()
    assert n_boiler > 0
    out = q_text_line_dedup(spark, SF_DIR)
    total_kept = out.agg(F.sum("n_lines_kept")).collect()[0][0]
    total_lines = lines.count()
    assert total_kept < total_lines


def test_shuffle_hash_join_in_plan(spark):
    plan = (
        q_join_shuffle_hash(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ShuffledHashJoin" in plan, plan[:2000]


def test_survival_monotone_from_one(spark):
    rows = sorted(
        q_events_survival(spark, SF_DIR).collect(), key=lambda r: r.day
    )
    assert rows[0].day == 0 and rows[0].survival == 1.0
    for a, b in zip(rows, rows[1:]):
        assert b.survival <= a.survival  # survival never increases


def test_matryoshka_recall_bounds(spark):
    rows = q_vector_matryoshka(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_overlap <= _MRL_K
        assert abs(r.recall_at_k - r.n_overlap / _MRL_K) < 1e-12
