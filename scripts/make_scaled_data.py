"""Derived upward-scale fixtures (VERDICT r6 #1): replicate the driver
fixtures K-fold with key offsets so the scaling curve extends ABOVE
sf0.1 without synthesizing new distributions.

Design — the copies must scale the WORK, not corrupt the workload:

- Fact tables (customer/supplier/part/orders/lineitem/events,
  documents/embeddings) are replicated K times; copy k's keys get a
  disjoint offset, applied CONSISTENTLY across foreign keys, so every
  join's selectivity and every group's cardinality profile is the
  sf0.1 profile x K (the TPC-H scaling model).
- Dimension tables (region, nation) stay fixed, as TPC-H does at any
  SF — they remain broadcast-sized at every scale.
- documents.text: copy k > 0 gets a per-doc DETERMINISTIC word
  permutation. Token multisets (so length/quality/language metrics)
  are preserved, but word-3-gram shingles across copies share ~nothing
  — without this, every doc would be an exact duplicate of K-1 others
  and the near-dup candidate space would grow K^2-fold, benchmarking
  an adversarial corpus instead of a bigger one. n_chars is unchanged
  (single-spaced word soup: permutation preserves char count).
- embeddings.embedding: copy k gets a per-copy DIMENSION permutation —
  an orthogonal transform, so within-copy geometry (every distance and
  cosine) is exactly preserved while cross-copy vectors decorrelate;
  identical copies would otherwise collapse into the same LSH/IVF
  buckets and inflate candidate pairs K^2-fold.
- events keeps its time range: K x rows in the same window span models
  a higher event RATE, which is how a stream actually grows.

Timestamps/physical types are preserved by writing through the source
arrow schema. Output dir name must contain the effective sf (bench.py
parses `sf([0-9.]+)`).

Usage:
    python scripts/make_scaled_data.py /root/testdata/sf0.1 5 /tmp/scaled/sf0.5
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# fact-table key offsets: one stride per copy, disjoint from the
# source ranges (max source key at sf0.1 is o_orderkey ~1.5e5)
STRIDE = 10_000_000

DIM_TABLES = ("region", "nation")
KEY_COLS = {
    "customer": ("c_custkey",),
    "supplier": ("s_suppkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def _offset_copy(tbl: pa.Table, cols: tuple[str, ...], k: int) -> pa.Table:
    if k == 0:
        return tbl
    out = tbl
    for c in cols:
        i = out.schema.get_field_index(c)
        vals = out.column(c).to_numpy(zero_copy_only=False) + k * STRIDE
        out = out.set_column(
            i, out.schema.field(i), pa.array(vals, type=out.schema.field(i).type)
        )
    return out


def _permute_texts(tbl: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return tbl
    texts = tbl.column("text").to_pylist()
    doc_ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
    out_texts = []
    for did, txt in zip(doc_ids, texts):
        words = txt.split(" ")
        rng = np.random.default_rng((k * 1_000_003 + int(did)) & 0x7FFFFFFF)
        rng.shuffle(words)
        out_texts.append(" ".join(words))
    i = tbl.schema.get_field_index("text")
    return tbl.set_column(
        i, tbl.schema.field(i), pa.array(out_texts, type=pa.string())
    )


def _permute_dims(tbl: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return tbl
    col = tbl.column("embedding").combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.chunk(0)
    flat = col.values.to_numpy(zero_copy_only=False)
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    dim = int(widths[0])
    if not (widths == dim).all():
        raise ValueError("ragged embedding widths; expected fixed dim")
    mat = flat.reshape(-1, dim)
    perm = np.random.default_rng(97 + k).permutation(dim)
    new_flat = mat[:, perm].reshape(-1)
    i = tbl.schema.get_field_index("embedding")
    arr = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(new_flat, type=tbl.schema.field(i).type.value_type),
    )
    return tbl.set_column(i, tbl.schema.field(i), arr)


def make_scaled(src: str, k_copies: int, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in DIM_TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(tbl, os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: {tbl.num_rows} rows (dimension, unscaled)")
    for t, cols in KEY_COLS.items():
        src_tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        copies = []
        for k in range(k_copies):
            c = _offset_copy(src_tbl, cols, k)
            if t == "documents":
                c = _permute_texts(c, k)
            elif t == "embeddings":
                c = _permute_dims(c, k)
            copies.append(c)
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: {src_tbl.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    src, k, dst = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    make_scaled(src, k, dst)
