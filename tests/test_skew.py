"""Salted join equivalence: salting must not change join semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.functions.skew import salted_join

from .conftest import SF_DIR


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_salted_join_equals_plain_inner(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    small = cust.withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(small, ["o_custkey"])
    salted = salted_join(orders, small, ["o_custkey"], n_salts=8)
    assert sorted(plain.columns) == sorted(salted.columns)
    assert _rows(plain.select(*sorted(plain.columns))) == _rows(
        salted.select(*sorted(plain.columns))
    )


def test_salted_join_left_outer(spark):
    events = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    cust = (
        load_table(spark, SF_DIR, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
        .filter(F.col("user_id") < 5)  # force unmatched left rows
    )
    plain = events.join(cust, ["user_id"], "left")
    salted = salted_join(events, cust, ["user_id"], n_salts=4, how="left")
    assert _rows(plain.select(*sorted(plain.columns))) == _rows(
        salted.select(*sorted(plain.columns))
    )


def test_salt_collision_guard(spark):
    df = load_table(spark, SF_DIR, "orders").withColumn("__salt", F.lit(1))
    with pytest.raises(ValueError):
        salted_join(df, df, ["o_orderkey"])
