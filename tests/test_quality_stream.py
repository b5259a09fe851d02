"""Streaming quality gate: stream-vs-batch equivalence and census
invariants (the oracle match itself runs in test_queries_vs_duckdb)."""

from __future__ import annotations

from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def test_gate_census_invariants(spark):
    rows = SPECS["q_stream_quality_gate"].fn(spark, SF_DIR).collect()
    waves = sorted(r["wave"] for r in rows)
    assert waves == [0, 1, 2, 3]
    for r in rows:
        assert 0 <= r["n_admitted"] <= r["n_seen"]
        if r["n_admitted"] == 0:
            assert r["avg_admitted_score"] is None
        else:
            assert r["avg_admitted_score"] is not None


def test_gate_is_deterministic_across_stream_runs(spark):
    """A second full stream run (fresh checkpoint + scratch) must
    reproduce the census exactly — the gate is a pure function of the
    frozen model and the arriving docs."""
    fn = SPECS["q_stream_quality_gate"].fn
    a = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, fn(spark, SF_DIR).collect()))
    assert a == b


def test_gate_matches_batch_scoring(spark):
    """Stream-static deployment ≡ batch scoring: the per-wave admitted
    counts recomputed from one batch nb_score pass over the full corpus
    equal the streamed census (Structured Streaming's contract)."""
    from pyspark.sql import functions as F

    from nosql_triple_store_spark.catalog import load_table
    from nosql_triple_store_spark.operators.text_ext10 import (
        nb_components,
        nb_score,
    )

    docs = load_table(spark, SF_DIR, "documents")
    model, totals, prior = nb_components(spark, SF_DIR)
    scored = nb_score(docs, model, totals, prior)
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    bs = (max_id + 4) // 4
    batch = {
        r["wave"]: (r["n_seen"], r["n_admitted"])
        for r in scored.groupBy(
            F.expr(f"doc_id div {bs}").alias("wave")
        )
        .agg(
            F.count(F.lit(1)).alias("n_seen"),
            F.sum((F.col("nb_score") >= 0).cast("long")).alias("n_admitted"),
        )
        .collect()
    }
    streamed = {
        r["wave"]: (r["n_seen"], r["n_admitted"])
        for r in SPECS["q_stream_quality_gate"].fn(spark, SF_DIR).collect()
    }
    assert streamed == batch


def test_gate_tokenless_docs_get_prior_decision(spark, tmp_path):
    """ADVICE r9: a doc whose text tokenizes to nothing must still
    appear in the census (scored at the prior alone), not vanish in
    the explode. Build a fixture where 3 odd docs have empty/space
    text and check n_seen still covers every doc and the census
    matches the SQL oracle recomputed by DuckDB on the same dir."""
    import duckdb

    from nosql_triple_store_spark.streaming import quality_stream as qs

    from .util import compare_to_duckdb

    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from pyspark.sql import functions as F

    blanked = docs.withColumn(
        "text",
        F.when(F.col("doc_id").isin(1, 3, 251), F.lit("  . ")).otherwise(
            F.col("text")
        ),
    )
    blanked.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    n_docs = docs.count()

    res = SPECS["q_stream_quality_gate"].fn(spark, sf)
    rows = res.collect()
    assert sum(r["n_seen"] for r in rows) == n_docs

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    compare_to_duckdb(res, con, SPECS["q_stream_quality_gate"].oracle)
    con.close()
