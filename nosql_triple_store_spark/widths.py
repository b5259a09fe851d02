"""Plan-width policy: every explicit repartition() width in operators/
derives from the RUNNING cluster's parallelism instead of a literal
baked for the local[32] dev box (VERDICT r4 #3).

Basis is ``sparkContext.defaultParallelism`` — total scheduler slots
(cores in local mode, sum of executor cores on a cluster) — not
``spark.sql.shuffle.partitions``: the verification driver's vanilla
session keeps the 200-partition SQL default even on an 8-core box, and
these widths size *task fan-out for Python/Arrow kernels and wide
shuffle intermediates*, which must track machine slots, not the SQL
shuffle default.

The factors reproduce the values measured on local[32] (SCALE.md):
- fan-out for single-file scans feeding mapInPandas / explode kernels:
  cores/2 -> 16 on the 32-core box (enough tasks to saturate Arrow
  batch decode without shrinking batches below the amortization point);
- wedge/self-join intermediates: 3*cores -> 96 (wedge rows per task
  small enough to stop GC thrash; measured 48 s -> 10 s on triangles).

Both are floored so a 2-core CI box still gets a sane plan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def cluster_cores(spark: SparkSession) -> int:
    """Scheduler slots for the running session (local: thread count)."""
    return int(spark.sparkContext.defaultParallelism)


def fanout_width(spark: SparkSession) -> int:
    """Width for fanning a single-file scan out to Python/Arrow kernels
    or big exploders (measured local[32] optimum: 16 = cores/2)."""
    return max(8, cluster_cores(spark) // 2)


def wedge_width(spark: SparkSession) -> int:
    """Width for wide self-join (wedge) intermediates whose row count
    explodes quadratically per key (measured local[32] optimum: 96 =
    3*cores)."""
    return max(24, 3 * cluster_cores(spark))
