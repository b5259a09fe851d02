"""Bucketed layout: the join and aggregation on the bucket key must plan
with ZERO exchanges once both sides are bucketed — the on-disk
pre-shuffle is the point of the layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_triple_store_spark.operators.bucketed import bucketed_tables

from .conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark):
    ot, lt = bucketed_tables(spark, SF_DIR)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table(ot)
        li = spark.table(lt)
        j = (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # bucket pruning sanity: result matches a plain-read join
        n_bucketed = j.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    from nosql_triple_store_spark.catalog import load_table

    o2 = load_table(spark, SF_DIR, "orders")
    l2 = load_table(spark, SF_DIR, "lineitem")
    n_plain = (
        o2.join(l2, o2.o_orderkey == l2.l_orderkey)
        .groupBy("o_orderkey")
        .count()
        .count()
    )
    assert n_bucketed == n_plain
