"""Targeted checks for the seventeenth extension batch."""

from __future__ import annotations

import pyspark.sql.functions as F

from nosql_triple_store_spark.operators.graph_ext3 import _copurchase_edges
from nosql_triple_store_spark.operators.relational_ext17 import (
    _edge_weight,
    q_agg_trend_forecast,
    q_graph_sssp,
)

from .conftest import SF_DIR


def test_sssp_relaxation_fixpoint(spark):
    """At the fixpoint no edge can improve any distance (Bellman-Ford
    optimality certificate), the source has distance 0, and all
    distances are positive elsewhere."""
    dist = q_graph_sssp(spark, SF_DIR)
    edges = _copurchase_edges(spark, SF_DIR)
    und = edges.select(
        F.col("pa").alias("src"), F.col("pb").alias("dst"),
        _edge_weight(F.col("pa"), F.col("pb")).alias("w"),
    ).unionByName(
        edges.select(
            F.col("pb").alias("src"), F.col("pa").alias("dst"),
            _edge_weight(F.col("pa"), F.col("pb")).alias("w"),
        )
    )
    d_src = dist.withColumnRenamed("node", "src").withColumnRenamed(
        "dist", "du"
    )
    d_dst = dist.withColumnRenamed("node", "dst").withColumnRenamed(
        "dist", "dv"
    )
    violations = (
        und.join(d_src, "src")
        .join(d_dst, "dst")
        .filter(F.col("dv") > F.col("du") + F.col("w"))
        .count()
    )
    assert violations == 0
    source = und.agg(F.min("src")).collect()[0][0]
    rows = {r.node: r.dist for r in dist.collect()}
    assert rows[source] == 0
    assert all(d > 0 for n, d in rows.items() if n != source)


def test_sssp_deterministic(spark):
    a = {(r.node, r.dist) for r in q_graph_sssp(spark, SF_DIR).collect()}
    b = {(r.node, r.dist) for r in q_graph_sssp(spark, SF_DIR).collect()}
    assert a == b


def test_trend_forecast_matches_builtin_regr(spark):
    """The exact-sums closed forms must agree with Spark's builtin
    regr_slope/regr_intercept on the same cents series."""
    from nosql_triple_store_spark.catalog import load_table
    from pyspark.sql import Window

    ev = load_table(spark, SF_DIR, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("vc"))
    idx = daily.withColumn(
        "d",
        F.datediff(
            "day", F.min("day").over(Window.partitionBy("event_type"))
        ).cast("double"),
    ).withColumn("vcd", F.col("vc").cast("double"))
    builtin = {
        r.event_type: r
        for r in idx.groupBy("event_type")
        .agg(
            F.regr_slope("vcd", "d").alias("sl"),
            F.regr_intercept("vcd", "d").alias("ic"),
            F.max("d").alias("dmax"),
        )
        .collect()
    }
    for r in q_agg_trend_forecast(spark, SF_DIR).collect():
        b = builtin[r.event_type]
        want_forecast = round((b.ic + b.sl * (b.dmax + 1)) / 100, 2)
        assert abs(r.slope_per_day - round(b.sl / 100, 2)) <= 0.01
        assert abs(r.forecast_next_day - want_forecast) <= 0.01


def test_sssp_frontier_join_is_size_adaptive(spark):
    """VERDICT r9 #1: the relaxation join must broadcast only while the
    frontier is small — above FRONTIER_BROADCAST_MAX the plan must flip
    to a non-broadcast join (a forced broadcast of an O(|V|) frontier
    is a driver-memory hazard on expander graphs)."""
    from nosql_triple_store_spark.operators.relational_ext17 import (
        FRONTIER_BROADCAST_MAX,
        _relax_candidates,
    )

    adj = (
        spark.range(8)
        .select(
            F.col("id").alias("src"),
            F.array(
                F.struct(
                    (F.col("id") + 1).alias("dst"), F.lit(1).cast("long").alias("w")
                )
            ).alias("nbrs"),
        )
    )
    frontier = spark.createDataFrame([(0, 0)], "node long, dist long")

    # disable auto-broadcast so any BroadcastHashJoin in the plan can
    # only come from the operator's own hint (the tiny test adjacency
    # would otherwise be auto-broadcast, masking the flip)
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        small = _relax_candidates(frontier, 10, adj)
        assert (
            "BroadcastHashJoin"
            in small._jdf.queryExecution().executedPlan().toString()
        )

        big = _relax_candidates(frontier, FRONTIER_BROADCAST_MAX + 1, adj)
        assert (
            "BroadcastHashJoin"
            not in big._jdf.queryExecution().executedPlan().toString()
        )
        # both strategies produce identical relaxation candidates
        assert sorted(map(tuple, small.collect())) == sorted(
            map(tuple, big.collect())
        )
    finally:
        spark.conf.set(key, old)
