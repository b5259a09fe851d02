"""Derive an upward-scaled dataset from a driver SF dir (VERDICT r6 #1).

The driver ships sf0.001/0.01/0.1 only, and the r6 scaling curve
(sf0.01 -> sf0.1) is overhead-dominated at both points with the
``documents``/``embeddings`` row counts FIXED across SFs — so the
multimodal/text/dedup/vector families' *data* scaling was unmeasured.
This script replicates a source SF dir K-fold with key remapping so the
bench can run at an effective sf = K * source_sf:

- ``region``/``nation``: copied unchanged (fixed dimensions, as in
  TPC-H's own SF scaling — FK ranges stay 0..24 / 0..4).
- fact/dim tables (``customer supplier part orders lineitem events``):
  copy 0 is byte-identical to the source (so every literal key a query
  points at still exists); copies 1..K-1 offset each primary key by
  ``c * (max_key + 1)`` and offset FKs by the SAME per-table stride, so
  join fan-out per key is preserved exactly (the TPC-H property that
  orders/customer ratio is SF-invariant).
- ``documents``: row count scales K-fold (the r6 gap). Copies get a
  deterministic per-(copy, doc_id) word-order shuffle: unigram stats,
  token counts, and n_chars are preserved (text-analysis queries see
  the same per-doc distributions) while k-shingles change almost
  entirely — so near-dup structure scales ~linearly instead of every
  doc gaining K-1 exact clones (which would grow candidate pairs
  quadratically and measure a synthetic blowup, not the engine).
- ``embeddings``: row count scales K-fold; copies add seeded Gaussian
  noise (sigma=0.08) and re-normalize, keeping the label's cluster
  structure (IVF/recall stays meaningful) without exact-duplicate tie
  pathologies in KNN.

Everything is pyarrow/numpy — no Spark needed — and schemas are
preserved exactly (timestamp precision included). Output dir name must
contain the effective sf (bench.py parses ``sf([0-9.]+)`` from the
path).

Usage:
    python scripts/make_scaled_sf.py /root/testdata/sf0.1 /tmp/scaled/sf1 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# table -> columns remapped by that table's own stride (pk + the FKs
# that reference it, listed under the *referenced* table's stride)
STRIDE_KEYS = {
    # events.user_id REFERENCES the customer key space (q_join_asof
    # joins o_custkey = user_id), so it must stride with CUSTOMER —
    # striding it by its own max (1500 at sf0.1) made copies' events
    # point at copy-0 customers, silently emptying event-to-customer
    # joins for K > customer_stride/user_stride (ADVICE r7 #1)
    "customer": [
        ("customer", "c_custkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
    ],
    "supplier": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "part": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orders": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "events_id": [("events", "event_id")],
    "documents": [("documents", "doc_id")],
    "embeddings": [("embeddings", "vec_id")],
}


def _strides(tabs: dict[str, pa.Table]) -> dict[str, int]:
    def mx(t: str, c: str) -> int:
        return int(pa.compute.max(tabs[t][c]).as_py())

    return {
        "customer": mx("customer", "c_custkey") + 1,
        "supplier": mx("supplier", "s_suppkey") + 1,
        "part": mx("part", "p_partkey") + 1,
        "orders": mx("orders", "o_orderkey") + 1,
        "events_id": mx("events", "event_id") + 1,
        "documents": mx("documents", "doc_id") + 1,
        "embeddings": mx("embeddings", "vec_id") + 1,
    }


def _shuffle_texts(texts: list[str], doc_ids: np.ndarray, copy: int) -> list[str]:
    out = []
    for text, did in zip(texts, doc_ids):
        rng = np.random.default_rng((copy << 32) ^ int(did) ^ 0x5EED)
        words = text.split(" ")
        rng.shuffle(words)
        out.append(" ".join(words))
    return out


def _zipf_texts(texts: list[str], doc_ids: np.ndarray, copy: int) -> list[str]:
    """Open-vocabulary Zipfian resample (VERDICT r10 #2): the default
    word-shuffle keeps the SOURCE vocabulary, so K-fold replication
    saturates the ~30k-shingle space and every shingle's df grows with
    n — the adversarial regime for exact prefix filtering. This
    variant draws each copy-doc's tokens i.i.d. from an UNBOUNDED
    Zipf(s=1.2) rank distribution (word of rank r is "w<r>"): the head
    ranks repeat corpus-wide (boilerplate-like high-df shingles, which
    rarest-first prefix selection avoids) while the tail keeps minting
    new words forever, so the shingle vocabulary grows ~linearly with
    the corpus and df tails stay flat — the open-vocabulary regime a
    real crawl presents and the design point of the AllPairs/PPJoin
    ladder. Token count per doc is preserved (text-stat distributions
    stay comparable), and a deterministic ~10% of copy-docs are NEAR-
    DUPLICATES of their source doc (every 8th token replaced) so the
    dedup queries still have duplicate mass to find instead of an
    all-unique corpus that trivially short-circuits."""
    out = []
    for text, did in zip(texts, doc_ids):
        rng = np.random.default_rng((copy << 32) ^ int(did) ^ 0x21BF)
        words = text.split(" ")
        if rng.random() < 0.10:
            # near-dup of the source: ~12.5% token substitution keeps
            # Jaccard over 3-shingles in the verify-worthy band
            w = list(words)
            for i in range(0, len(w), 8):
                w[i] = f"w{rng.zipf(1.2)}"
            out.append(" ".join(w))
        else:
            ranks = rng.zipf(1.2, size=max(1, len(words)))
            out.append(" ".join(f"w{r}" for r in ranks))
    return out


def _perturb_embeddings(tab: pa.Table, copy: int) -> pa.Array:
    vecs = np.array(tab["embedding"].to_pylist(), dtype=np.float64)
    ids = tab["vec_id"].to_numpy()
    noise = np.empty_like(vecs)
    for i, vid in enumerate(ids):
        rng = np.random.default_rng((copy << 32) ^ int(vid) ^ 0xE1BED)
        noise[i] = rng.normal(0.0, 0.08, vecs.shape[1])
    v = vecs + noise
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.array(list(v.astype(np.float32)), type=tab.schema.field("embedding").type)


def _copy_of(
    name: str,
    tab: pa.Table,
    c: int,
    strides: dict[str, int],
    doc_mode: str = "shuffle",
) -> pa.Table:
    if c == 0 or name in ("region", "nation"):
        return tab
    cols = {col: tab[col] for col in tab.column_names}
    for skey, targets in STRIDE_KEYS.items():
        for tname, cname in targets:
            if tname == name:
                off = pa.compute.add(
                    tab[cname].combine_chunks(), c * strides[skey]
                )
                cols[cname] = off.cast(tab.schema.field(cname).type)
    if name == "documents":
        doc_ids = tab["doc_id"].to_numpy()
        texts_fn = _zipf_texts if doc_mode == "zipf" else _shuffle_texts
        new_texts = texts_fn(tab["text"].to_pylist(), doc_ids, c)
        cols["text"] = pa.array(new_texts, type=pa.string())
        cols["n_chars"] = pa.array(
            [len(t) for t in new_texts], type=tab.schema.field("n_chars").type
        )
    if name == "embeddings":
        cols["embedding"] = _perturb_embeddings(tab, c)
    return pa.Table.from_arrays(
        [cols[col] for col in tab.column_names], schema=tab.schema
    )


def main() -> None:
    # Usage: make_scaled_sf.py SRC OUT K [--documents=shuffle|zipf]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    doc_mode = "shuffle"
    for a in sys.argv[1:]:
        if a.startswith("--documents="):
            doc_mode = a.split("=", 1)[1]
    if doc_mode not in ("shuffle", "zipf"):
        raise SystemExit(f"unknown --documents mode: {doc_mode}")
    src, out, k = args[0], args[1], int(args[2])
    os.makedirs(out, exist_ok=True)
    tabs = {t: pq.read_table(os.path.join(src, f"{t}.parquet")) for t in TABLES}
    strides = _strides(tabs)
    for name, tab in tabs.items():
        if name in ("region", "nation"):
            scaled = tab
        else:
            scaled = pa.concat_tables(
                [_copy_of(name, tab, c, strides, doc_mode) for c in range(k)]
            )
        dest = os.path.join(out, f"{name}.parquet")
        # small row groups keep the single-file tables splittable into
        # many scan tasks (Spark assigns row groups to byte-range
        # splits; one huge group = one task no matter the conf)
        pq.write_table(
            scaled, dest, compression="snappy", row_group_size=131072
        )
        print(f"{name}: {tab.num_rows} -> {scaled.num_rows} rows -> {dest}")


if __name__ == "__main__":
    main()
