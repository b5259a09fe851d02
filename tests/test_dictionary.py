"""Dictionary encoding roundtrip + id-scheme properties."""

from __future__ import annotations

import pytest

from nosql_triple_store_spark.plans.bgp import triples_view
from nosql_triple_store_spark.sources.dictionary import (
    build_dictionary,
    decode_triples,
    encode_triples,
)

from .conftest import SF_DIR


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=repr)


def test_dense_roundtrip(spark):
    t = triples_view(spark, SF_DIR)
    d = build_dictionary(t, ids="dense")
    enc = encode_triples(t, d)
    assert enc.count() == t.count()
    assert dict(enc.dtypes) == {
        "s_id": "bigint", "p_id": "bigint", "o_id": "bigint"
    }
    dec = decode_triples(enc, d)
    assert _rows(dec) == _rows(t.select("s", "p", "o"))


def test_dense_ids_contiguous_and_sorted(spark):
    t = triples_view(spark, SF_DIR)
    d = build_dictionary(t, ids="dense").orderBy("term_id")
    rows = d.collect()
    assert [r["term_id"] for r in rows] == list(range(1, len(rows) + 1))
    terms = [r["term"] for r in rows]
    assert terms == sorted(terms)  # id order == term order (range-joinable)


def test_hash_roundtrip_no_collisions(spark):
    t = triples_view(spark, SF_DIR)
    d = build_dictionary(t, ids="hash")
    dec = decode_triples(encode_triples(t, d), d)
    assert _rows(dec) == _rows(t.select("s", "p", "o"))


def test_dense_rank_window_is_partitioned(spark):
    # scale-safety: the row_number over terms must be per-range-partition
    # (__pid); the only global-order window is over the P-row count agg
    t = triples_view(spark, SF_DIR)
    plan = (
        build_dictionary(t, ids="dense")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for ln in plan.splitlines():
        if "windowspecdefinition(" in ln and "term#" in ln:
            assert "__pid" in ln, f"raw-term window not partitioned: {ln}"


def test_unknown_scheme_rejected(spark):
    t = triples_view(spark, SF_DIR)
    with pytest.raises(ValueError):
        build_dictionary(t, ids="zorder")


def test_assign_dense_ids_edge_cases(spark):
    """n_parts > n_rows (empty range partitions), one row, and start
    offsets must all yield ids identical to a naive global sort."""
    from pyspark.sql import Row

    from nosql_triple_store_spark.sources.dictionary import assign_dense_ids

    vals = ["m", "a", "z", "q", "b"]
    df = spark.createDataFrame([Row(v=x) for x in vals])
    for n_parts, start in ((16, 0), (2, 1), (1, 100)):
        got = {
            r.v: r.id
            for r in assign_dense_ids(
                df, "v", id_col="id", start=start, n_parts=n_parts
            ).collect()
        }
        want = {v: i + start for i, v in enumerate(sorted(vals))}
        assert got == want, (n_parts, start)
    one = spark.createDataFrame([Row(v="only")])
    r = assign_dense_ids(one, "v", id_col="id", start=7).collect()
    assert [(x.v, x.id) for x in r] == [("only", 7)]
