"""Targeted checks for the sixteenth extension batch."""

from __future__ import annotations

import pyspark.sql.functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.relational_ext16 import (
    q_join_lateral_topk,
    q_scalar_try,
)

from .conftest import SF_DIR


def test_variant_schema_agg(spark):
    """schema_of_variant_agg sees the unified object shape across all
    props payloads."""
    ev = load_table(spark, SF_DIR, "events")
    sch = ev.select(
        F.schema_of_variant_agg(F.parse_json("props")).alias("s")
    ).collect()[0]["s"]
    assert sch == "OBJECT<k: BIGINT>", sch


def test_try_counts_non_vacuous(spark):
    """The error-safe paths must actually exercise both outcomes:
    some k=0 divisions and both valid and invalid synthesized dates."""
    r = q_scalar_try(spark, SF_DIR).collect()[0]
    assert r.n_div_by_zero > 0
    assert r.n_valid_dates > 0 and r.n_invalid_dates > 0
    assert r.n == r.n_valid_dates + r.n_invalid_dates


def test_lateral_decorrelated_single_plan(spark):
    """The lateral top-N must come back as ONE decorrelated plan (a
    join appears; no per-nation re-execution) and yield exactly 2 rows
    per nation with the right ordering."""
    df = q_join_lateral_topk(spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "join" in plan
    rows = df.collect()
    from collections import Counter

    per_nation = Counter(r.n_name for r in rows)
    n_nations_with_orders = len(per_nation)
    assert all(v == 2 for v in per_nation.values()), per_nation
    assert n_nations_with_orders > 0
    # within each nation the two rows are the true top-2
    ev = load_table(spark, SF_DIR, "orders").join(
        load_table(spark, SF_DIR, "customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).join(
        load_table(spark, SF_DIR, "nation"),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("n_name").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    want = {
        (r.n_name, r.o_orderkey)
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .collect()
    }
    got = {(r.n_name, r.o_orderkey) for r in rows}
    assert got == want
