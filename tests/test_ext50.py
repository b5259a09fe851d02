"""Tests for the fiftieth batch: anomaly-gate calibration, share mass
conservation, power-analysis monotonicity."""

from __future__ import annotations

from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_seasonal_anomaly_flag_rate(spark):
    """A 3-MAD gate on roughly-symmetric residuals should flag a small
    minority of days, never most of them."""
    rows = SPECS["q_events_anomaly_seasonal"].fn(spark, SF_DIR).collect()
    assert rows
    flagged = sum(1 for r in rows if r.is_anomaly)
    assert flagged <= len(rows) // 3


def test_share_of_parent_sums_to_one(spark):
    rows = SPECS["q_agg_share_of_parent"].fn(spark, SF_DIR).collect()
    by_region = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r)
        assert 0 <= r.share_of_region_ppm <= 1_000_000
    for region, rs in by_region.items():
        # floor division loses at most 1 ppm per nation
        total = sum(r.share_of_region_ppm for r in rs)
        assert 1_000_000 - len(rs) <= total <= 1_000_000
        region_share = {r.region_share_ppm for r in rs}
        assert len(region_share) == 1  # constant within region
    overall = sum(rs[0].region_share_ppm for rs in by_region.values())
    assert 1_000_000 - len(by_region) <= overall <= 1_000_000


def test_power_analysis_monotone_in_mde(spark):
    """Bigger detectable effects need fewer users: n_per_arm strictly
    decreases as MDE grows (delta^2 in the denominator)."""
    rows = sorted(
        SPECS["q_events_power_analysis"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.mde_ppm,
    )
    assert [r.mde_ppm for r in rows] == [50_000, 100_000, 200_000]
    assert rows[0].n_per_arm > rows[1].n_per_arm > rows[2].n_per_arm
    # quadrupling... doubling MDE quarters n (up to CEIL slack)
    assert abs(rows[0].n_per_arm - 4 * rows[1].n_per_arm) <= 4


def test_path_quantified_hops_consistent(spark):
    """min_hops=1 rows are exactly the direct location edges, and
    3-hop-only pairs exist (customer -> nation -> region is 2; nothing
    is 3 on this forest) or not — but every min_hops is in 1..3."""
    rows = SPECS["q_bgp_path_quantified"].fn(spark, SF_DIR).collect()
    assert rows
    from pyspark.sql import functions as F

    from nosql_triple_store_spark.plans.bgp import triples_view

    direct = {
        (r.s, r.o)
        for r in triples_view(spark, SF_DIR)
        .filter(F.col("p").isin("inNation", "inRegion"))
        .select("s", "o")
        .collect()
    }
    for r in rows:
        assert 1 <= r.min_hops <= 3
        assert ((r.s, r.o) in direct) == (r.min_hops == 1)


def test_group_quantile_sketch_error_bound(spark):
    """Each per-group estimate's true within-group rank sits near its
    target percentile (bottom-k sample of k=200 -> ~3.5 sigma = 12 pp
    at sf0.001 group sizes; the bound mirrors test_ext35's global
    version)."""
    from pyspark.sql import functions as F

    from nosql_triple_store_spark.catalog import load_table

    rows = SPECS["q_agg_group_quantile_sketch"].fn(spark, SF_DIR).collect()
    orders = (
        load_table(spark, SF_DIR, "orders")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    by_grp = {}
    for r in orders:
        by_grp.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    for r in rows:
        vals = sorted(by_grp[r.grp])
        rank = sum(1 for v in vals if v <= r.estimate) / len(vals)
        assert abs(rank - r.pct / 100) <= 0.15, (r.grp, r.pct, rank)


def test_alarm_debounce_implies_anomaly(spark):
    rows = sorted(
        SPECS["q_events_alarm_debounce"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    flags = {r.day: r.is_anomaly for r in rows}
    prev = None
    for r in rows:
        if r.alarm:
            assert r.is_anomaly and prev is not None and flags[prev]
        prev = r.day


def test_source_matrix_mass_matches_pair_stream(spark):
    """Matrix cell counts sum to the verified near-dup pair count."""
    from pyspark.sql import functions as F

    from nosql_triple_store_spark.operators.dedup import _shingle_stream
    from nosql_triple_store_spark.operators.dedup_pipeline import (
        _minhash_candidates,
        _verified_edges,
        band_index,
    )

    rows = SPECS["q_dedup_source_matrix"].fn(spark, SF_DIR).collect()
    sh = _shingle_stream(spark, SF_DIR)
    n_pairs = _verified_edges(
        sh, _minhash_candidates(sh, band_index(spark, SF_DIR))
    ).count()
    assert sum(r.n_pairs for r in rows) == n_pairs
    for r in rows:
        assert r.within_source == (r.source_a == r.source_b)
        assert r.source_a <= r.source_b


def test_arrow_census_equals_jvm_tokens(spark):
    from pyspark.sql import functions as F

    from nosql_triple_store_spark.catalog import load_table
    from nosql_triple_store_spark.functions.textfns import tokens_col

    arrow = {
        r.doc_id: r.n_tokens
        for r in SPECS["q_text_arrow_token_census"].fn(spark, SF_DIR).collect()
    }
    jvm = {
        r.doc_id: r.n
        for r in load_table(spark, SF_DIR, "documents")
        .select("doc_id", F.size(tokens_col()).alias("n"))
        .collect()
    }
    assert arrow == jvm


def test_observe_metrics_match_direct_agg(spark):
    from pyspark.sql import functions as F

    from nosql_triple_store_spark.catalog import load_table

    r = SPECS["q_meta_observe_metrics"].fn(spark, SF_DIR).first()
    li = load_table(spark, SF_DIR, "lineitem")
    direct = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("r"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("c"),
    ).first()
    assert (r.n_rows, r.n_returns, r.cents) == (direct.n, direct.r, direct.c)


def test_driver_decomposition_is_exact(spark):
    """delta_rev == volume + rate + interaction per type (the algebra
    is an identity; rounding grain 2 dp -> allow 0.03 slack)."""
    rows = SPECS["q_events_driver_decomposition"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        recomposed = r.volume_effect + r.rate_effect + r.interaction_effect
        assert abs(r.delta_rev - recomposed) <= 0.03, r


def test_column_encryption_ciphertext_hides_plaintext(spark):
    """Ciphertext differs from plaintext bytes and decrypts exactly;
    a wrong key must NOT decrypt."""
    from pyspark.sql import functions as F

    from nosql_triple_store_spark.catalog import load_table
    from nosql_triple_store_spark.operators.relational_ext54 import _AES_KEY

    cust = load_table(spark, SF_DIR, "customer").limit(20)
    enc = cust.select(
        "c_name",
        F.expr(f"aes_encrypt(c_name, '{_AES_KEY}')").alias("cipher"),
    )
    back = enc.select(
        "c_name",
        F.expr(f"CAST(aes_decrypt(cipher, '{_AES_KEY}') AS STRING)").alias(
            "back"
        ),
        F.expr(
            "CAST(try_aes_decrypt(cipher, 'ffffffffffffffff') AS STRING)"
        ).alias("wrong"),
    ).collect()
    for r in back:
        assert r.back == r.c_name
        assert r.wrong is None
