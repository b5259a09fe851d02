"""Z-order layout: morton bit math, bucket completeness, and the scan's
partition pruning (the point of the layout — a rectangle touches only
intersecting buckets)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_triple_store_spark.operators.layout import (
    BITS,
    BUCKET_BITS,
    X_HI,
    X_LO,
    Y_HI,
    Y_LO,
    build_layout,
)
from nosql_triple_store_spark.sources.zorder import (
    _bucket_bounds,
    morton_interleave,
    rectangle_buckets,
)

from .conftest import SF_DIR


def _morton_py(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_expression_matches_python(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", morton_interleave(F.col("x"), F.col("y"), 7)
    )
    for r in df.collect():
        assert r.z == _morton_py(r.x, r.y, 7), (r.x, r.y)


def test_bucket_bounds_partition_the_space():
    # every (x, y) point belongs to exactly one bucket's bounding box —
    # and that bucket is the one its morton prefix names
    for x in range(0, 100, 9):
        for y in range(0, 100, 11):
            b = _morton_py(x, y, BITS) >> (2 * BITS - BUCKET_BITS)
            xmin, xmax, ymin, ymax = _bucket_bounds(b, BITS, BUCKET_BITS)
            assert xmin <= x <= xmax and ymin <= y <= ymax


def test_rectangle_buckets_complete():
    # brute force: any point in the rectangle maps to a listed bucket
    hits = set(rectangle_buckets(X_LO, X_HI, Y_LO, Y_HI, BITS, BUCKET_BITS))
    for x in range(X_LO, X_HI + 1):
        for y in range(Y_LO, Y_HI + 1):
            assert _morton_py(x, y, BITS) >> (2 * BITS - BUCKET_BITS) in hits
    # and it actually prunes: strictly fewer than all buckets
    assert len(hits) < (1 << BUCKET_BITS)


def test_zorder_scan_prunes_partitions(spark):
    path = build_layout(spark, SF_DIR)
    buckets = rectangle_buckets(X_LO, X_HI, Y_LO, Y_HI, BITS, BUCKET_BITS)
    scan = spark.read.parquet(path).filter(F.col("z_bucket").isin(buckets))
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "z_bucket" in plan
    # pruned scan reads only files under the selected bucket dirs
    # (input_file_name() is evaluated at execution time, after pruning —
    # DataFrame.inputFiles() would list the whole unpruned relation)
    files = [
        r.f
        for r in scan.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files, "scan should read some files"
    assert all(
        any(f"z_bucket={b}/" in f for b in buckets) for f in files
    ), "scan read a file outside the selected buckets"
    all_files = [
        r.f
        for r in spark.read.parquet(path)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    ]
    assert len(files) < len(all_files), "bucket filter pruned nothing"


def test_rectangle_buckets_complete_randomized():
    """Property: for ANY rectangle, every covered point's bucket is
    listed (completeness is what guarantees the pruned scan can't drop
    rows). Deterministic seed; pure bit math, no Spark."""
    import random

    rng = random.Random(1234)
    hi = (1 << BITS) - 1
    for _ in range(200):
        x1, x2 = sorted(rng.randint(0, hi) for _ in range(2))
        y1, y2 = sorted(rng.randint(0, hi) for _ in range(2))
        hits = set(rectangle_buckets(x1, x2, y1, y2, BITS, BUCKET_BITS))
        # sample points inside the rectangle (corners + random interior)
        pts = {(x1, y1), (x1, y2), (x2, y1), (x2, y2)}
        for _ in range(30):
            pts.add((rng.randint(x1, x2), rng.randint(y1, y2)))
        for x, y in pts:
            b = _morton_py(x, y, BITS) >> (2 * BITS - BUCKET_BITS)
            assert b in hits, (x, y, x1, x2, y1, y2)
