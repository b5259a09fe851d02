"""Error bounds of the approximate operators vs their exact twins."""

from __future__ import annotations

from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_approx_percentile_close_to_exact(spark):
    exact = {
        r["l_returnflag"]: (r["median_qty"], r["p99_price"])
        for r in SPECS["q_agg_percentiles"].fn(spark, SF_DIR).collect()
    }
    approx = {
        r["l_returnflag"]: (r["median_qty_approx"], r["p99_price_approx"])
        for r in SPECS["q_agg_approx_percentile"].fn(spark, SF_DIR).collect()
    }
    assert exact.keys() == approx.keys()
    for k in exact:
        assert abs(exact[k][0] - approx[k][0]) <= 1.0, (k, exact[k], approx[k])
        assert abs(exact[k][1] - approx[k][1]) / exact[k][1] <= 0.02


def test_approx_distinct_close_to_exact(spark):
    from pyspark.sql import functions as F

    from nosql_triple_store_spark.catalog import load_table

    events = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in SPECS["q_agg_approx_distinct"].fn(spark, SF_DIR).collect()
    }
    for k in exact:
        assert abs(exact[k] - approx[k]) / max(exact[k], 1) <= 0.1
