"""Empty-input and degenerate-case behavior of the core operators —
the paths a verification driver or production pipeline can hit that
fixture-shaped tests never exercise."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.functions.lww import latest_by_key, lww_merge
from nosql_triple_store_spark.functions.skew import salted_join
from nosql_triple_store_spark.functions.textfns import shingles_col, tokens_col
from nosql_triple_store_spark.plans.bgp import Var, compile_bgp

from .conftest import SF_DIR


def test_lww_on_empty_input(spark):
    ev = load_table(spark, SF_DIR, "events").filter(F.lit(False))
    out = latest_by_key(
        ev, ["user_id", "event_type"], ["ts", "event_id"], ["event_id", "ts", "value"]
    )
    assert out.count() == 0
    assert out.columns == ["user_id", "event_type", "event_id", "ts", "value"]


def test_lww_merge_empty_delta(spark):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    merged = lww_merge(
        ev,
        [ev.filter(F.lit(False))],
        ["user_id", "event_type"],
        ["ts", "event_id"],
        ["event_id", "ts", "value"],
    )
    direct = latest_by_key(
        ev, ["user_id", "event_type"], ["ts", "event_id"], ["event_id", "ts", "value"]
    )
    assert merged.count() == direct.count()


def test_bgp_no_match_returns_empty_with_schema(spark):
    t = spark.createDataFrame(
        [("a", "knows", "b")], "s string, p string, o string"
    )
    res = compile_bgp(t, [(Var("x"), "likes", Var("y"))])
    assert res.columns == ["x", "y"]
    assert res.count() == 0


def test_bgp_same_var_twice_in_pattern(spark):
    """(?x, loves, ?x) must bind only self-loops."""
    t = spark.createDataFrame(
        [("a", "loves", "a"), ("a", "loves", "b"), ("b", "loves", "b")],
        "s string, p string, o string",
    )
    res = compile_bgp(t, [(Var("x"), "loves", Var("x"))])
    assert sorted(r["x"] for r in res.collect()) == ["a", "b"]


def test_salted_join_empty_small_side(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    empty = ev.filter(F.lit(False)).select(
        "user_id", F.lit("x").alias("tag")
    )
    assert salted_join(ev, empty, ["user_id"]).count() == 0
    assert (
        salted_join(ev, empty, ["user_id"], how="left").count() == ev.count()
    )


def test_shingles_short_docs(spark):
    df = spark.createDataFrame(
        [("one",), ("one two",), ("one two three",), ("",)], "text string"
    )
    out = df.select(F.size(shingles_col(tokens_col())).alias("n")).collect()
    # <3 tokens -> no shingles (NOT a descending sequence artifact)
    assert [r["n"] for r in out] == [0, 0, 1, 0]
