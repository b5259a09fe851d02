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
    """ADVICE r9 (+ ADVICE r10: the original fixture's "  . " text
    still tokenized to ["."], so the zero-token path never ran): a doc
    whose text tokenizes to NOTHING must still appear in the census,
    scored at the rounded prior alone, not vanish in the explode.
    Whitespace-only text genuinely yields zero tokens (tokens_col
    splits on spaces and drops empties). Asserts (a) nb_score itself
    DROPS the blanked docs — so census coverage can only come from the
    prior fallback, (b) n_seen still covers every doc, and (c) the
    census matches the SQL oracle recomputed by DuckDB on the same
    dir (which pins the prior-scored docs' admission values)."""
    import duckdb

    from pyspark.sql import functions as F

    from nosql_triple_store_spark.catalog import load_table
    from nosql_triple_store_spark.operators.text_ext10 import (
        nb_components,
        nb_score,
    )

    from .util import compare_to_duckdb

    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    blank_ids = (1, 3, 251)
    blanked = docs.withColumn(
        "text",
        F.when(F.col("doc_id").isin(*blank_ids), F.lit("   ")).otherwise(
            F.col("text")
        ),
    )
    blanked.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    n_docs = docs.count()

    # the batch scorer genuinely loses the zero-token docs to its
    # explode — the streamed census below can only cover them via the
    # prior-only fallback row
    model, totals, prior = nb_components(spark, sf)
    scored = nb_score(load_table(spark, sf, "documents"), model, totals, prior)
    assert (
        scored.filter(F.col("doc_id").isin(*blank_ids)).count() == 0
    )
    lp = round(prior.collect()[0]["lp"], 4)

    res = SPECS["q_stream_quality_gate"].fn(spark, sf)
    rows = res.collect()
    assert sum(r["n_seen"] for r in rows) == n_docs
    # doc 1 and 3 land in wave 0: if the prior admits (lp >= 0), the
    # fallback rows must be counted there — census arithmetic over the
    # known fixture pins the prior-only score's admission decision
    batch_scored = {
        r["doc_id"] for r in scored.select("doc_id").collect()
    }
    assert not set(blank_ids) & batch_scored
    if lp >= 0:
        w0 = next(r for r in rows if r["wave"] == 0)
        assert w0["n_admitted"] >= 2

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    compare_to_duckdb(res, con, SPECS["q_stream_quality_gate"].oracle)
    con.close()
