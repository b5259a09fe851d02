"""Tests for the thirty-seventh batch: Benford mass checks, drift
bounds, link-prediction score bounds, SCC partition property, and the
scene-cut boundary formula."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.graph_ext7 import _digraph
from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_benford_mass_and_expectation(spark):
    rows = SPECS["q_agg_benford"].fn(spark, SF_DIR).collect()
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert sum(r.n for r in rows) == n_orders
    assert {r.digit for r in rows} <= set(range(1, 10))
    exp = {r.digit: r.exp_ppm for r in rows}
    assert exp.get(1, 301030) == 301030
    for r in rows:
        assert 0 <= r.obs_ppm <= 1_000_000


def test_vector_drift_bounds(spark):
    r = SPECS["q_vector_drift"].fn(spark, SF_DIR).first()
    assert -1.0 <= r.cos_centroid <= 1.0
    assert r.norm_a >= 0 and r.norm_b >= 0 and r.l2_centroid >= 0
    emb_n = load_table(spark, SF_DIR, "embeddings").count()
    assert r.n_a + r.n_b == emb_n


def test_link_predict_scores_bounded_and_nonadjacent(spark):
    rows = SPECS["q_graph_link_predict"].fn(spark, SF_DIR).collect()
    edges = {
        (min(r.a, r.b), max(r.a, r.b))
        for r in _digraph(spark, SF_DIR).collect()
    }
    for r in rows:
        assert r.n_common >= 2
        # every RA term is 1e6 div deg(z) with deg(z) >= 2
        assert r.ra_ppm <= r.n_common * 500_000
        assert (r.lo, r.hi) not in edges


def test_scc_partitions_nodes(spark):
    rows = SPECS["q_graph_scc"].fn(spark, SF_DIR).collect()
    e = _digraph(spark, SF_DIR)
    n_nodes = (
        e.select(F.col("a").alias("n")).union(e.select("b")).distinct().count()
    )
    assert sum(r.n_nodes for r in rows) == n_nodes
    ids = [r.scc_id for r in rows]
    assert len(ids) == len(set(ids))
    for r in rows:
        assert r.scc_id <= r.max_node


def test_scene_cut_boundary_formula(spark):
    """Cuts land exactly where the fixture starts a new scene (every
    3rd frame) and nowhere else — the detector finds the truth, not
    just 'some' transitions."""
    rows = SPECS["q_multimodal_scene_cut"].fn(spark, SF_DIR).collect()
    for r in rows[:100]:
        n_frames = 6 + r.doc_id % 4
        expected_cuts = sum(
            1 for f in range(n_frames - 1) if (f + 1) // 3 > f // 3
        )
        assert r.n_transitions == n_frames - 1
        assert r.n_cuts == expected_cuts, (r.doc_id, r.n_cuts, expected_cuts)
        assert r.n_scenes == expected_cuts + 1
        assert r.max_mad_milli >= 60_000 > r.min_mad_milli


def test_av_align_segments_conserved(spark):
    """Every VAD speech segment lands in exactly one scene: per-doc
    aligned-segment mass equals the VAD segment count, and scene
    indices stay inside the decoded scene count."""
    al = SPECS["q_multimodal_av_align"].fn(spark, SF_DIR).collect()
    vad = {
        r.doc_id: r.n_segments
        for r in SPECS["q_multimodal_audio_vad"].fn(spark, SF_DIR).collect()
    }
    cuts = {
        r.doc_id: r.n_scenes
        for r in SPECS["q_multimodal_scene_cut"].fn(spark, SF_DIR).collect()
    }
    per_doc = {}
    for r in al:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_segments
        assert 0 <= r.scene_idx < cuts[r.doc_id]
    for doc_id, n in per_doc.items():
        assert n == vad[doc_id]
