"""Pure-Python differentials for the learned data-selection stage:
Naive-Bayes quality scores and DSIR importance weights recomputed
from the parquet with pandas/hashlib/math and compared to the Spark
plans' top-20 (independent of both Spark and the DuckDB oracle)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd

from nosql_triple_store_spark.registry import all_specs

from .conftest import SF_DIR

SPECS = all_specs()


def _toks(text: str) -> list[str]:
    return [t for t in text.lower().split(" ") if t]


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_DIR}/documents.parquet")


def test_quality_nb_matches_pure_python(spark):
    docs = _docs()
    cp: Counter = Counter()
    cn: Counter = Counter()
    n_pos_docs = n_neg_docs = 0
    for _, r in docs[docs.doc_id % 2 == 0].iterrows():
        pos = r.lang == "en"
        n_pos_docs += pos
        n_neg_docs += not pos
        for t in _toks(r.text):
            (cp if pos else cn)[t] += 1
    vocab = set(cp) | set(cn)
    npos, nneg, v = sum(cp.values()), sum(cn.values()), len(vocab)
    prior = math.log(n_pos_docs / n_neg_docs)
    scores = {}
    for _, r in docs[docs.doc_id % 2 == 1].iterrows():
        s = prior
        for t in _toks(r.text):
            s += math.log(
                ((cp.get(t, 0) + 1) * (nneg + v))
                / ((cn.get(t, 0) + 1) * (npos + v))
            )
        scores[int(r.doc_id)] = round(s, 4)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["doc_id"], r["nb_score"])
        for r in SPECS["q_text_quality_nb"].fn(spark, SF_DIR).collect()
    ]
    assert got == expect


def test_ccnet_buckets_are_ordered_terciles(spark):
    """Within each language the head/middle/tail buckets must be
    ordered (mean cross-entropy non-decreasing in bucket number) and
    tercile-sized (counts differ by at most 1)."""
    rows = SPECS["q_text_ccnet_buckets"].fn(spark, SF_DIR).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert by_lang
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["bucket"])
        hs = [r["avg_cross_entropy"] for r in rs]
        assert hs == sorted(hs), f"{lang}: buckets out of order {hs}"
        ns = [r["n_docs"] for r in rs]
        assert max(ns) - min(ns) <= 1, f"{lang}: not terciles {ns}"


def test_mixture_dsir_matches_pure_python(spark):
    docs = _docs()
    B = 65536

    def feats(text: str) -> list[str]:
        t = _toks(text)
        return [
            hashlib.md5(f"{a} {b}".encode()).hexdigest()[:4]
            for a, b in zip(t, t[1:])
        ]

    cr: Counter = Counter()
    ct: Counter = Counter()
    for _, r in docs.iterrows():
        fs = feats(r.text)
        cr.update(fs)
        if r.lang == "zh":
            ct.update(fs)
    nraw, ntgt = sum(cr.values()), sum(ct.values())
    weights = {}
    for _, r in docs[docs.lang != "zh"].iterrows():
        fs = feats(r.text)
        if not fs:
            continue
        w = sum(
            math.log(
                ((ct.get(b, 0) + 1) * (nraw + B))
                / ((cr[b] + 1) * (ntgt + B))
            )
            for b in fs
        )
        weights[int(r.doc_id)] = round(w, 4)
    expect = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["doc_id"], r["dsir_weight"])
        for r in SPECS["q_mixture_dsir"].fn(spark, SF_DIR).collect()
    ]
    assert got == expect


def test_nb_model_join_bucketed_fallback(spark):
    """VERDICT r9 #7: past NB_BROADCAST_MAX_TOKENS the model join must
    flip from broadcast to a shuffle hash join co-partitioned on token
    — and produce IDENTICAL scores (the switch is a physical-plan
    choice, not a semantic one)."""
    from nosql_triple_store_spark.catalog import load_table
    from nosql_triple_store_spark.operators.text_ext10 import (
        NB_BROADCAST_MAX_TOKENS,
        nb_components,
        nb_score,
    )

    docs = load_table(spark, SF_DIR, "documents").filter("doc_id % 2 = 1")
    model, totals, prior = nb_components(spark, SF_DIR)

    bcast = nb_score(docs, model, totals, prior)
    plan_b = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b

    shuf = nb_score(
        docs, model, totals, prior,
        model_rows=NB_BROADCAST_MAX_TOKENS + 1,
    )
    plan_s = shuf._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan_s
    assert "ShuffledHashJoin" in plan_s

    assert sorted(map(tuple, bcast.collect())) == sorted(
        map(tuple, shuf.collect())
    )
