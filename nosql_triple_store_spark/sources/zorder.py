"""Z-order (Morton) multi-dimensional layout.

The reference's on-disk layout is a single-key range shard (readers.py
write_range_sharded); Z-ordering is the multi-dimensional generalization
every lakehouse engine ships (Delta OPTIMIZE ZORDER, Iceberg sort orders):
interleave the bits of two range keys so records close in BOTH dimensions
land in the same files, letting a rectangle predicate prune most of the
layout instead of scanning one full dimension stripe.

Design at 100 TB: the morton code is a pure bitwise Column expression
(whole-stage codegen, no Python); the layout writes partitioned by the
top `bucket_bits` of the code (directory-level partition pruning, visible
as PartitionFilters in the scan) and sorted by the full code within each
bucket (parquet row-group min/max stats prune within files). Rectangle →
bucket enumeration is driver-side over 2^bucket_bits buckets — constant
work, no data scan."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["morton_interleave", "write_zordered", "rectangle_buckets"]


def morton_interleave(x: Column, y: Column, bits: int) -> Column:
    """Interleave the low `bits` bits of two non-negative ints: x's bit i
    lands at position 2i, y's at 2i+1 (y owns the top bit). Pure bitwise
    expression — codegen'd, no shuffle, no Python."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x.cast("long"), i) % 2, 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y.cast("long"), i) % 2, 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    x: Column,
    y: Column,
    path: str,
    bits: int,
    bucket_bits: int,
) -> None:
    """Write `df` Z-ordered on (x, y): directory-partitioned by the top
    `bucket_bits` of the morton code, sorted by the full code within."""
    z = morton_interleave(x, y, bits)
    out = df.withColumn("__z", z).withColumn(
        "z_bucket", F.shiftright(F.col("__z"), 2 * bits - bucket_bits)
    )
    (
        out.repartition("z_bucket")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .partitionBy("z_bucket")
        .parquet(path)
    )


def _bucket_bounds(b: int, bits: int, bucket_bits: int) -> tuple[int, int, int, int]:
    """(xmin, xmax, ymin, ymax) covered by morton-prefix bucket `b`: the
    prefix fixes the top bucket_bits interleaved bits; remaining bits
    range freely."""
    xmin = ymin = 0
    xmax = (1 << bits) - 1
    ymax = (1 << bits) - 1
    for j in range(bucket_bits):
        pos = 2 * bits - 1 - j  # global bit position inside z
        bit = (b >> (bucket_bits - 1 - j)) & 1
        dim_bit = pos // 2  # bit index within its dimension
        if pos % 2 == 1:  # y owns odd positions
            if bit:
                ymin |= 1 << dim_bit
            else:
                ymax &= ~(1 << dim_bit)
        else:
            if bit:
                xmin |= 1 << dim_bit
            else:
                xmax &= ~(1 << dim_bit)
    return xmin, xmax, ymin, ymax


def rectangle_buckets(
    x_lo: int, x_hi: int, y_lo: int, y_hi: int, bits: int, bucket_bits: int
) -> list[int]:
    """Buckets whose Z-region intersects [x_lo,x_hi] x [y_lo,y_hi] —
    complete by construction (interval intersection test per bucket), so
    filtering to these buckets never drops a matching record."""
    hits = []
    for b in range(1 << bucket_bits):
        xmin, xmax, ymin, ymax = _bucket_bounds(b, bits, bucket_bits)
        if xmin <= x_hi and x_lo <= xmax and ymin <= y_hi and y_lo <= ymax:
            hits.append(b)
    return hits
