"""Tests for the forty-fifth batch: triad census brute-force
differential, trimmed-stat bounds, phash pair invariants."""

from __future__ import annotations

from collections import defaultdict

from nosql_triple_store_spark.operators.graph_ext7 import _digraph
from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_triad_types_match_bruteforce(spark):
    r = SPECS["q_graph_triad_types"].fn(spark, SF_DIR).first()
    edges = {(e.a, e.b) for e in _digraph(spark, SF_DIR).collect()}
    out = defaultdict(set)
    for a, b in edges:
        out[a].add(b)
    cyclic = 0
    transitive = 0
    for a, b in edges:
        for c in out[b]:
            if (c, a) in edges and a < b and a < c:
                cyclic += 1
            if a != c and (a, c) in edges:
                transitive += 1
    assert r.n_cyclic == cyclic
    assert r.n_transitive == transitive


def test_trimmed_stats_bounds(spark):
    r = SPECS["q_agg_trimmed_stats"].fn(spark, SF_DIR).first()
    assert r.p5 < r.p95
    # at most 10% of rows sit strictly outside the 5/95 band
    assert r.n_clamped <= r.n // 10 + 2
    assert r.p5 <= r.mean_trimmed <= r.p95
    assert r.p5 <= r.mean_winsor <= r.p95 + 1e-9


def test_phash_pairs_well_formed_and_deterministic(spark):
    rows = SPECS["q_multimodal_image_phash"].fn(spark, SF_DIR).collect()
    assert rows
    seen = set()
    n_same = 0
    for r in rows:
        assert r.d1 < r.d2
        assert 0 <= r.hamming <= 7
        assert (r.d1, r.d2) not in seen
        seen.add((r.d1, r.d2))
        n_same += bool(r.same_class)
    assert n_same >= len(rows) // 10  # near-dup classes are recovered
    again = {
        (r.d1, r.d2): r.hamming
        for r in SPECS["q_multimodal_image_phash"].fn(spark, SF_DIR).collect()
    }
    assert {(r.d1, r.d2): r.hamming for r in rows} == again


def test_csv_badrecords_counts(spark):
    from nosql_triple_store_spark.catalog import load_table

    r = SPECS["q_source_csv_badrecords"].fn(spark, SF_DIR).first()
    n_events = load_table(spark, SF_DIR, "events").count()
    assert r.n_good + r.n_corrupt == n_events
    assert r.n_corrupt >= 1
    assert r.good_cents > 0


def test_reach_curve_monotone_and_consistent(spark):
    from nosql_triple_store_spark.catalog import load_table

    rows = sorted(
        SPECS["q_events_reach_curve"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    n_users = (
        load_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    prev = 0
    for r in rows:
        assert r.cum_users == prev + r.new_users
        assert r.dau <= r.cum_users
        prev = r.cum_users
    assert prev == n_users


def test_feature_hashing_mass_conserved(spark):
    """Total hashed term frequency equals the corpus token count, and
    buckets stay in range."""
    from pyspark.sql import functions as F

    from nosql_triple_store_spark.catalog import load_table
    from nosql_triple_store_spark.functions.textfns import tokens_col

    rows = SPECS["q_text_feature_hashing"].fn(spark, SF_DIR)
    total_tf = rows.agg(F.sum("tf")).first()[0]
    n_tokens = (
        load_table(spark, SF_DIR, "documents")
        .select(F.size(tokens_col()).alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert total_tf == n_tokens
    bad = rows.filter((F.col("bucket") < 0) | (F.col("bucket") >= 64)).count()
    assert bad == 0
