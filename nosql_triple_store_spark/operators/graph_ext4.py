"""Graph extension 4: label propagation communities; plus the zlib
compressibility quality signal for the text-pipeline family (kept here
with the other round-3 batch-28 additions).

- q_graph_label_propagation: synchronous LPA over the undirected
  hierarchy edges — each round every node adopts its neighborhood's
  most frequent label (ties → smallest label, so the algorithm is
  deterministic and convergent on this forest-like graph). The standard
  cheap community detector when modularity-grade quality isn't needed.
- q_text_compressibility: zlib-ratio per document — the Gopher-style
  boilerplate/repetition signal (highly compressible text is template
  or spam; incompressible is often binary junk or high-entropy noise).
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..catalog import load_table
from ..registry import register
from ..widths import fanout_width
from .graph import _edges
from ..materialize import materialize

_LPA_ROUNDS = 5


@register("q_graph_label_propagation", oracle=None)  # rows-only: iterative
def q_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (5 rounds, min-label tiebreak) over
    the undirected hierarchy graph; returns community sizes ordered by
    size desc. Deterministic: the round update is
    label(v) ← min over {most frequent label among N(v)}, computed with
    a count aggregate + a (count desc, label asc) row_number — no
    randomized vertex ordering, so repeated runs are identical.

    Scale: each round is one neighbor-join + two keyed aggregates, all
    partitioned by node id; lineage truncated per round via
    localCheckpoint exactly like q_graph_cc. Rounds are capped (LPA on
    near-forest graphs stabilizes in ~diameter rounds). The
    most-frequent-label pick is a max_by over (count, -label) — a
    partial-aggregable reduce, no per-node ranking window — and since
    the undirected edge list contains every node as a source, the
    round's aggregate already re-labels every node (no fix-up join)."""
    e = _edges(spark, sf_dir)
    und = e.select("src", "dst").unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).transform(materialize)  # loop invariant: joined every round (guide §2.4)
    nodes = und.select(F.col("src").alias("node_id")).distinct()
    labels = nodes.select(
        "node_id", F.col("node_id").alias("label")
    ).transform(materialize)
    for _ in range(_LPA_ROUNDS):
        neigh = (
            und.join(
                labels.select(
                    F.col("node_id").alias("dst"),
                    F.col("label").alias("nlabel"),
                ),
                "dst",
            )
            .groupBy("src", "nlabel")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            neigh.groupBy(F.col("src").alias("node_id"))
            .agg(
                F.max_by(
                    "nlabel",
                    F.struct(F.col("cnt"), (-F.col("nlabel")).alias("nl")),
                ).alias("label")
            )
            .transform(materialize)
        )
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("community_size"))
        .orderBy(F.desc("community_size"), "label")
    )


@F.pandas_udf(LongType())
def _zlib_len(texts: pd.Series) -> pd.Series:
    """Compressed byte length at zlib level 6 (Arrow-batched)."""
    return texts.map(
        lambda t: len(zlib.compress(t.encode("utf-8"), 6)) if t else 0
    )


@register("q_text_compressibility", oracle=None)  # rows-only: zlib output
def q_text_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compressibility: ratio = deflate(text)/raw
    bytes — low ratio flags template/boilerplate/repetitive documents,
    near-or-above-1 flags high-entropy junk; both tails get filtered in
    LLM corpus curation (Gopher uses the same family of signals). The
    compression call is the only Python step (vectorized pandas UDF);
    the ratio/bucketing stays JVM-side. Rows-only: DuckDB has no zlib —
    tests/test_ext28.py cross-checks lengths against direct Python zlib
    and pins the repeated-text < unique-text invariant."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.octet_length(F.encode("text", "UTF-8"))
    return (
        docs.repartition(fanout_width(spark))
        .select(
            "doc_id",
            raw.alias("raw_bytes"),
            _zlib_len("text").alias("zlib_bytes"),
        )
        .withColumn(
            "ratio",
            F.round(F.col("zlib_bytes") / F.col("raw_bytes"), 6),
        )
    )
