"""Targeted checks for the eighteenth extension batch."""

from __future__ import annotations

import pyspark.sql.functions as F

from nosql_triple_store_spark.operators.relational_ext18 import (
    q_agg_boolean,
    q_window_nth_value,
)

from .conftest import SF_DIR


def test_boolean_aggregates_non_vacuous(spark):
    """bool_and / bool_or must come back true for some groups and false
    for others — otherwise the reductions are untested constants."""
    rows = q_agg_boolean(spark, SF_DIR).collect()
    assert {r.all_below_300 for r in rows} == {0, 1}
    assert {r.any_above_250 for r in rows} == {0, 1}
    for r in rows:
        assert 0 < r.n_high < r.n  # filtered count strictly between


def test_nth_value_nulls_for_single_order_customers(spark):
    """second_key is NULL exactly for customers with one order."""
    rows = q_window_nth_value(spark, SF_DIR).collect()
    for r in rows:
        if r.n_orders == 1:
            assert r.second_key is None
            assert r.first_key == r.last_key
        else:
            assert r.second_key is not None
            assert r.first_key != r.last_key or r.n_orders == 1
