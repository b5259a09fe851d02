"""Property-based tests (hypothesis): the LWW merge CRDT and the BGP
compiler checked against independent in-Python reference semantics on
generated data — beyond the fixture-shaped cases."""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401

from nosql_triple_store_spark.functions.lww import latest_by_key
from nosql_triple_store_spark.plans.bgp import Var, compile_bgp

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_row = st.tuples(
    st.integers(0, 5),  # key1
    st.sampled_from(["a", "b", "c"]),  # key2
    st.integers(0, 50),  # ts (int stands in for timestamp)
    st.integers(0, 10_000),  # unique-ish id (tiebreak)
    st.floats(-100, 100, allow_nan=False),
)


@given(rows=st.lists(_row, min_size=1, max_size=60), seed=st.integers(0, 999))
@settings(**_SETTINGS)
def test_lww_latest_matches_python_reference(spark, rows, seed):
    # de-dup the (ts, id) ordering key so argmax is unique
    rows = list({(r[2], r[3]): r for r in rows}.values())
    df = spark.createDataFrame(
        rows, "k1 int, k2 string, ts int, rid int, val double"
    )
    got = {
        (r["k1"], r["k2"]): (r["ts"], r["rid"], r["val"])
        for r in latest_by_key(
            df, ["k1", "k2"], ["ts", "rid"], ["ts", "rid", "val"]
        ).collect()
    }
    want: dict = {}
    for k1, k2, ts, rid, val in rows:
        cur = want.get((k1, k2))
        if cur is None or (ts, rid) > (cur[0], cur[1]):
            want[(k1, k2)] = (ts, rid, val)
    assert got == want

    # merge in shuffled split order must equal the global latest
    rnd = random.Random(seed)
    shuffled = rows[:]
    rnd.shuffle(shuffled)
    cut = len(shuffled) // 2
    d1 = spark.createDataFrame(
        shuffled[:cut] or [rows[0]], "k1 int, k2 string, ts int, rid int, val double"
    )
    d2 = spark.createDataFrame(
        shuffled[cut:] or [rows[0]], "k1 int, k2 string, ts int, rid int, val double"
    )
    merged = latest_by_key(
        d1.unionByName(d2), ["k1", "k2"], ["ts", "rid"], ["ts", "rid", "val"]
    )
    got2 = {
        (r["k1"], r["k2"]): (r["ts"], r["rid"], r["val"])
        for r in merged.collect()
    }
    # duplicated rows across splits are idempotent under LWW
    assert got2 == want


_triple = st.tuples(
    st.sampled_from(["s1", "s2", "s3", "s4"]),
    st.sampled_from(["p1", "p2"]),
    st.sampled_from(["o1", "o2", "s1", "s2"]),
)


@given(
    triples=st.lists(_triple, min_size=1, max_size=25, unique=True),
    const_p=st.sampled_from(["p1", "p2"]),
)
@settings(**_SETTINGS)
def test_bgp_two_pattern_matches_python_reference(spark, triples, const_p):
    """?x const_p ?y . ?y ?p ?z  must equal the nested-loop evaluation."""
    tdf = spark.createDataFrame(triples, "s string, p string, o string")
    res = compile_bgp(
        tdf,
        [(Var("x"), const_p, Var("y")), (Var("y"), Var("p"), Var("z"))],
    )
    got = sorted(
        (r["x"], r["y"], r["p"], r["z"]) for r in res.collect()
    )
    want = sorted(
        (s1, o1, p2, o2)
        for (s1, p1v, o1) in triples
        if p1v == const_p
        for (s2, p2, o2) in triples
        if s2 == o1
    )
    assert got == want
