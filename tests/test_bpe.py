"""Differential test for q_text_bpe_merges: the distributed BPE trainer
must produce the same merge table as an independent pure-Python BPE on
the same word-frequency table (same spec: weighted adjacent-pair
counts, max-count → lexicographic tie-break, left-to-right
non-overlapping merge)."""

from __future__ import annotations

from collections import Counter

from nosql_triple_store_spark.catalog import load_table
from nosql_triple_store_spark.operators.text_ext import (
    BPE_MERGES,
    bpe_fit,
    q_text_bpe_merges,
)

from .conftest import SF_DIR


def _python_bpe(word_freq: dict[str, int], k: int):
    vocab = {w: list(w) for w in word_freq}
    merges = []
    for r in range(k):
        counts: Counter = Counter()
        for w, syms in vocab.items():
            f = word_freq[w]
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] += f
        if not counts:
            break
        # max count, then lexicographic (a, b)
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, a, b, a + b, cnt))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_matches_python_reference(spark):
    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    freq: Counter = Counter()
    for r in docs:
        for w in r.text.lower().split(" "):
            if w:
                freq[w] += 1
    want = _python_bpe(dict(freq), BPE_MERGES)
    got = bpe_fit(spark, SF_DIR)
    assert got == want


def test_query_shape_and_determinism(spark):
    a = q_text_bpe_merges(spark, SF_DIR).collect()
    b = q_text_bpe_merges(spark, SF_DIR).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == BPE_MERGES
    rounds = [r.round for r in a]
    assert rounds == list(range(BPE_MERGES))
    for r in a:
        assert r.merged == r.left + r.right and r.pair_count > 0


def test_encode_matches_python_apply(spark):
    from nosql_triple_store_spark.operators.text_ext import q_text_bpe_encode

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("lang", "text")
        .collect()
    )
    freq: Counter = Counter()
    for r in docs:
        for w in r.text.lower().split(" "):
            if w:
                freq[w] += 1
    merges = _python_bpe(dict(freq), BPE_MERGES)
    rules = [(m[1], m[2]) for m in merges]

    def encode(w: str) -> int:
        syms = list(w)
        for a, b in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    want: dict[str, list[int]] = {}
    for r in docs:
        for w in r.text.lower().split(" "):
            if w:
                st = want.setdefault(r.lang, [0, 0, 0])
                st[0] += 1
                st[1] += len(w)
                st[2] += encode(w)

    got = {r.lang: r for r in q_text_bpe_encode(spark, SF_DIR).collect()}
    assert set(got) == set(want)
    for lang, (nw, nc, nt) in want.items():
        g = got[lang]
        assert (g.n_words, g.total_chars, g.total_bpe_tokens) == (nw, nc, nt)
        assert g.chars_per_token == round(nc / nt, 4)
