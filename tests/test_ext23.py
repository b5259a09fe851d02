"""Targeted checks for the twenty-third extension batch."""

from __future__ import annotations

import pyspark.sql.functions as F

from nosql_triple_store_spark.operators.relational_ext23 import (
    q_graph_assortativity,
    q_join_full_outer,
    q_text_lm_crossentropy,
)

from .conftest import SF_DIR


def test_full_outer_all_categories_present(spark):
    cats = {r.category: r.n for r in q_join_full_outer(spark, SF_DIR).collect()}
    assert set(cats) == {"both", "buyer_only", "active_only"}, cats
    assert all(n > 0 for n in cats.values())


def test_assortativity_in_range(spark):
    r = q_graph_assortativity(spark, SF_DIR).collect()[0]
    assert -1.0 <= r.assortativity <= 1.0
    assert r.n_edge_ends > 0 and r.n_edge_ends % 2 == 0  # both orientations


def test_lm_crossentropy_bounds(spark):
    """H must lie between 0 and ln(V + max_count) — and be above ln of
    the best possible smoothed probability's reciprocal bound."""
    import math

    r = q_text_lm_crossentropy(spark, SF_DIR).collect()[0]
    assert r.n_eval_bigrams > 0 and r.vocab_size > 0
    assert 0.0 < r.cross_entropy < math.log(r.vocab_size) + 10
