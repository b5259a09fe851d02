"""Targeted checks for the twelfth extension batch: builtin statistical
aggregates vs the exact-sums closed forms, HLL sketch bounds and split
invariance, dynamic partition pruning plan shape, map_ops threshold
non-vacuity, and the protobuf gating of transformWithState."""

from __future__ import annotations

import pyspark.sql.functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.relational_ext12 import (
    _partitioned_orders,
    q_agg_corr_regr,
    q_agg_hll_partial,
    q_join_dpp,
    q_map_ops,
)
from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR


def test_corr_closed_form_matches_builtins(spark):
    """The registry query uses exact-sums closed forms (bit-identical
    cross-engine); Spark's builtin corr/regr_* must agree to fp noise —
    proving the closed forms compute the standard statistics."""
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("long").cast("double").alias("x"),
        F.round("l_extendedprice", 0).cast("long").cast("double").alias("y"),
    )
    builtin = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr("x", "y").alias("c"),
            F.regr_slope("y", "x").alias("sl"),
            F.regr_intercept("y", "x").alias("ic"),
            F.regr_r2("y", "x").alias("r2"),
        )
        .collect()
    }
    for r in q_agg_corr_regr(spark, SF_DIR).collect():
        b = builtin[r["l_returnflag"]]
        assert abs(r["corr_qp"] - b["c"]) < 1e-9
        assert abs(r["slope"] - b["sl"]) < 1e-6
        assert abs(r["intercept"] - b["ic"]) < 1e-3  # intercept ~1e4 scale
        assert abs(r["r2"] - b["r2"]) < 1e-9


def test_hll_estimate_bounds_and_split_invariance(spark):
    est = {
        r["event_type"]: r["approx_users"]
        for r in q_agg_hll_partial(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, e in est.items():
        # default lgConfigK=12 => relative error ~1.6%; 5% is flake-free
        assert abs(e - exact[t]) <= max(2, 0.05 * exact[t]), (t, e, exact[t])
    # split invariance: HLL merge is register-wise max, so a 64-way salt
    # (vs the query's 16) must give the IDENTICAL estimate
    events = load_table(spark, SF_DIR, "events")
    alt = (
        events.withColumn("shard", F.pmod(F.hash("user_id"), F.lit(64)))
        .groupBy("event_type", "shard")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_union_agg("sk").alias("m"))
        .select("event_type", F.hll_sketch_estimate("m").alias("approx_users"))
    )
    assert {(r["event_type"], r["approx_users"]) for r in alt.collect()} == set(
        est.items()
    )


def test_dpp_prunes_fact_partitions(spark):
    """The fact scan must carry a dynamicpruning partition filter AND
    actually read only the 2 matching partition directories."""
    plan = q_join_dpp(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    fact_path, _dim = _partitioned_orders(spark, SF_DIR)
    # input_file_name() must bind to a single source, so attach it to the
    # fact scan BEFORE the join; the surviving file set shows the decode
    # of partition-dir values and the matching-partitions-only output.
    read_dirs = (
        spark.read.parquet(fact_path)
        .withColumn("f", F.input_file_name())
        .join(
            F.broadcast(
                spark.read.parquet(_dim).filter(F.col("urgency") == "high")
            ),
            F.col("o_orderpriority") == F.col("pr"),
        )
        .select("f")
        .distinct()
        .collect()
    )
    import urllib.parse

    dirs = {
        urllib.parse.unquote(r["f"]).split("o_orderpriority=")[1].split("/")[0]
        for r in read_dirs
    }
    assert dirs == {"1-URGENT", "2-HIGH"}, dirs


def test_map_ops_threshold_non_vacuous(spark):
    """The n >= 14 map_filter must actually drop some entries and keep
    some — otherwise the higher-order filter is untested."""
    events = load_table(spark, SF_DIR, "events")
    cnt = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    total_pairs = cnt.count()
    kept = q_map_ops(spark, SF_DIR).count()
    assert 0 < kept < total_pairs, (kept, total_pairs)


def test_transform_state_gated_on_protobuf():
    """q_stream_transform_state registers iff google.protobuf imports, so
    the driver never sees a query that cannot run in this container."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        have_pb = True
    except ImportError:
        have_pb = False
    assert ("q_stream_transform_state" in all_specs()) == have_pb


def test_stream_lww_state_matches_batch_lww(spark):
    """The custom stateful register must equal the batch max_by dedup."""
    from nosql_triple_store_spark.streaming.transform_state import (
        q_stream_lww_state,
    )

    got = {
        (r.user_id, r.event_type, r.event_id)
        for r in q_stream_lww_state(spark, SF_DIR).collect()
    }
    events = load_table(spark, SF_DIR, "events")
    ordering = F.struct(F.col("ts"), F.col("event_id"))
    want = {
        (r.user_id, r.event_type, r.event_id)
        for r in events.groupBy("user_id", "event_type")
        .agg(F.max_by("event_id", ordering).alias("event_id"))
        .collect()
    }
    assert got == want
