"""Register compaction: the reference's write path as a maintenance job.

The reference applies updates row-at-a-time through HTTP (R2) and
periodically reconciles replicas pairwise (R3/R9). Spark-natively the
register is a parquet table plus an append-only changelog; `compact`
folds a delta batch into a new table version with one LWW aggregate —
the plain-Spark emulation of Delta/Iceberg MERGE INTO (SURVEY §1.5).

Versioned directories (v000001, v000002, …) make every compaction
atomic-by-rename and leave history for debugging/time-travel reads;
`latest_version_path` resolves the current state. At 100 TB, partition
the version dirs by key range so a compaction shuffles only touched
ranges (delta keys prune via dynamic partition pruning).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from ..functions.lww import lww_merge
from ..session import ensure_runtime_confs

_VERSION_RE = re.compile(r"^v(\d{6})$")


def latest_version_path(base_dir: str) -> str | None:
    if not os.path.isdir(base_dir):
        return None
    versions = sorted(
        d for d in os.listdir(base_dir) if _VERSION_RE.match(d)
    )
    return os.path.join(base_dir, versions[-1]) if versions else None


def read_register(spark: SparkSession, base_dir: str) -> DataFrame:
    ensure_runtime_confs(spark)
    path = latest_version_path(base_dir)
    if path is None:
        raise FileNotFoundError(f"no register versions under {base_dir}")
    return spark.read.parquet(path)


def init_register(
    df: DataFrame, base_dir: str, keys: list[str], order: list[str]
) -> str:
    """Create v000001 from an initial snapshot (LWW-compacted)."""
    payload = [c for c in df.columns if c not in keys]
    state = lww_merge(df, [], keys, order, payload)
    out = os.path.join(base_dir, "v000001")
    state.write.mode("errorifexists").parquet(out)
    return out


def compact(
    spark: SparkSession,
    base_dir: str,
    delta: DataFrame,
    keys: list[str],
    order: list[str],
) -> str:
    """Fold a delta batch into the register: one union + one LWW
    aggregate + one write. Commutative/idempotent (functions/lww.py), so
    re-running a failed compaction with the same delta converges."""
    current_path = latest_version_path(base_dir)
    if current_path is None:
        return init_register(delta, base_dir, keys, order)
    current = spark.read.parquet(current_path)
    payload = [c for c in current.columns if c not in keys]
    merged = lww_merge(
        current, [delta.select(*current.columns)], keys, order, payload
    )
    version = int(_VERSION_RE.match(os.path.basename(current_path)).group(1))
    out = os.path.join(base_dir, f"v{version + 1:06d}")
    merged.write.mode("errorifexists").parquet(out)
    return out
