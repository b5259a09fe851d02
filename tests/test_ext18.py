"""Targeted checks for the eighteenth extension batch."""

from __future__ import annotations

import pyspark.sql.functions as F

from nosql_triple_store_spark.operators.relational_ext18 import (
    q_agg_boolean,
    q_window_nth_value,
)

from .conftest import SF_DIR


def test_boolean_aggregates_non_vacuous(spark):
    """bool_and / bool_or must agree with a direct min/max recomputation
    per group (an independent formulation of the same reductions), and
    the filtered count must be strictly between 0 and n. At sf0.001 the
    fixture additionally exercises both truth values of all_below_300;
    larger SFs have every type exceeding 300, so the cross-check — not a
    fixed value-set — is the SF-independent assertion."""
    from pyspark.sql import functions as F

    rows = q_agg_boolean(spark, SF_DIR).collect()
    mm = {
        r["event_type"]: (r["vmin"], r["vmax"])
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type")
        .agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
        .collect()
    }
    assert len(rows) == len(mm)
    for r in rows:
        vmin, vmax = mm[r.event_type]
        assert r.all_below_300 == int(vmax < 300)
        assert r.any_above_250 == int(vmax > 250)
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
