"""Last-writer-wins register semantics as distributed DataFrame operators.

The reference's core write/merge semantic (SURVEY §1.1, §2.A R2/R3): a map
keyed by (subject, predicate) whose value (object, timestamp) is an LWW
register; merge keeps the row with the newest timestamp
(reference: SQLite3DBConnector.py:134-180 `mergeSelf` — per-key lookup +
strict `>` timestamp compare; MongoDBConnector.py:116-165;
PostgreSQLDBConnector.py:141-187).

Spark-first design: instead of per-key lookups, LWW-latest is a single
``groupBy(keys).agg(max_by(payload, order))`` — an associative/commutative
aggregate, so Spark performs **map-side partial aggregation** before the
shuffle. At 100 TB this beats the window/row_number formulation (which must
shuffle *every* row to its key partition and sort) whenever keys repeat;
ties are broken deterministically by the caller-supplied tiebreak columns
(the reference leaves ties arbitrary — we must be hash-stable).

LWW merge of N delta sets = unionByName + the same aggregate: one shuffle,
order-independent (commutative), idempotent (re-merging a fixpoint is a
no-op) — the CRDT properties the reference relies on (report.pdf §5.3),
verified in tests/test_lww_properties.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    payload: Sequence[str],
) -> DataFrame:
    """Newest row per key: keys + payload columns, one row per key.

    ``order``: ordering columns, newest = max of the struct (first column is
    the timestamp; append unique tiebreakers for determinism).
    ``payload``: non-key columns to carry through.

    Physical plan: partial hash-agg -> shuffle by keys -> final hash-agg
    (max_by over a struct comparator); no global sort, no window buffer.
    """
    ordering = F.struct(*[F.col(c) for c in order])
    picked = F.max_by(F.struct(*[F.col(c) for c in payload]), ordering).alias("__r")
    out = df.groupBy(*[F.col(k) for k in keys]).agg(picked)
    return out.select(*keys, *[F.col(f"__r.{c}").alias(c) for c in payload])


def lww_merge(
    base: DataFrame,
    deltas: Sequence[DataFrame],
    keys: Sequence[str],
    order: Sequence[str],
    payload: Sequence[str],
) -> DataFrame:
    """Anti-entropy merge (reference R3/R8/R9) of base with delta batches.

    Commutative + associative + idempotent: any merge order and grouping
    yields the same register state, so no pairwise orchestration is needed
    (the reference's /merge_2_servers/ loop, MasterServer.py:384-432,
    collapses into one union + aggregate).
    """
    merged = base
    for d in deltas:
        merged = merged.unionByName(d)
    return latest_by_key(merged, keys, order, payload)
