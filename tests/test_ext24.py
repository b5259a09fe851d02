"""Targeted checks for the twenty-fourth extension batch."""

from __future__ import annotations

import pyspark.sql.functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.relational_ext24 import (
    q_join_division,
    q_window_rolling_distinct,
)

from .conftest import SF_DIR


def test_division_non_vacuous(spark):
    """Some but not all customers span every priority."""
    qualified = q_join_division(spark, SF_DIR).count()
    total = (
        load_table(spark, SF_DIR, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert 0 < qualified < total


def test_rolling_distinct_bounds(spark):
    """WAU is sandwiched between the day's DAU and min(total users,
    7-day user-day volume), and windows with history exceed DAU
    somewhere (the rolling part is real)."""
    ev = load_table(spark, SF_DIR, "events")
    dau = {
        r.day: r.n
        for r in ev.select(
            F.col("ts").cast("date").alias("day"), "user_id"
        )
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total_users = ev.select("user_id").distinct().count()
    rows = q_window_rolling_distinct(spark, SF_DIR).collect()
    assert {r.day for r in rows} == set(dau)
    exceeded = False
    for r in rows:
        assert dau[r.day] <= r.wau <= total_users
        if r.wau > dau[r.day]:
            exceeded = True
    assert exceeded
