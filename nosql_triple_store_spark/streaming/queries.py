"""Streaming queries over the events table via a parquet file stream.

The reference's write path is an HTTP-driven changelog merged by periodic
anti-entropy (SURVEY §3.2-3.3); Spark-natively that's a stream: files
arrive, stateful operators maintain the LWW register / window aggregates
continuously. Each query here runs the stream with Trigger.AvailableNow
against the fixture directory, drains to a memory sink, and returns the
final table — on bounded input the result equals the batch computation,
which is exactly what the DuckDB oracles check (same oracles as the batch
twins).

Scale notes: state lives in the executor state store keyed by the
aggregation key (RocksDB-backed in production configs); watermarks bound
state growth by evicting windows older than the allowed lateness. The
aggregations are the same partial-aggregable shapes as their batch twins,
so per-microbatch shuffle volume is the distinct-keys delta, not the raw
event count.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import register
from ..scratch import ckpt_tmp, scratch_tmp
from ..session import ensure_runtime_confs
from ..operators.eventtime import _SLIDING_ORACLE as _BATCH_SLIDING_ORACLE
from ..operators.triple import E_CTE

# Explicit schema: file streams require one. The fixture's ts column has
# shipped in two physical representations across driver generations —
# INT64 TIMESTAMP(NANOS) (surfacing as ns-long under nanosAsLong) and
# native TIMESTAMP(MICROS) ntz — so the DDL and the event-time conversion
# are derived from the actual file footer (one batch-read peek, cached),
# exactly like catalog.load_table adapts.
_EVENTS_DDL_NS = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
_EVENTS_DDL_TS = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)

_TS_IS_LONG: dict[str, bool] = {}


def _events_ts_is_long(spark: SparkSession, sf_dir: str) -> bool:
    if sf_dir not in _TS_IS_LONG:
        ensure_runtime_confs(spark)
        dt = dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes)
        _TS_IS_LONG[sf_dir] = dt.get("ts") == "bigint"
    return _TS_IS_LONG[sf_dir]


def _events_ddl(spark: SparkSession, sf_dir: str) -> str:
    return (
        _EVENTS_DDL_NS
        if _events_ts_is_long(spark, sf_dir)
        else _EVENTS_DDL_TS
    )


def _event_time_col(spark: SparkSession, sf_dir: str):
    """Event-time ts as tz-aware TIMESTAMP (required by watermarks); the
    UTC-pinned session makes the ntz->tz cast value-preserving."""
    if _events_ts_is_long(spark, sf_dir):
        return F.timestamp_micros(F.expr("ts div 1000"))
    return F.col("ts").cast("timestamp")


_STREAM_DIRS: dict[str, str] = {}


def _events_stream_dir(sf_dir: str) -> str:
    """File-stream sources require a *directory*; the fixture is a single
    read-only file, so expose it via a symlink in a temp dir (this is also
    how new micro-batch files would arrive in production: atomic moves
    into a watched directory)."""
    if sf_dir not in _STREAM_DIRS:
        d = scratch_tmp("events_stream_")
        os.symlink(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
        _STREAM_DIRS[sf_dir] = d
    return _STREAM_DIRS[sf_dir]


def _stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_runtime_confs(spark)
    raw = (
        spark.readStream.schema(_events_ddl(spark, sf_dir))
        .format("parquet")
        .load(_events_stream_dir(sf_dir))
    )
    # Event-time columns must be tz-aware TIMESTAMP for watermarks
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on ntz); the session is pinned
    # to UTC, and outputs are cast back to ntz after the sink so results
    # collect identically to the batch twins on any host timezone.
    return raw.withColumn("ts", _event_time_col(spark, sf_dir))


def _run_to_memory(
    stream_df: DataFrame, output_mode: str, state_width: int | None = None
) -> DataFrame:
    """Drain a bounded stream into a memory sink, return the final table.

    State-store partition count is baked from spark.sql.shuffle.partitions
    at query START — a vanilla session's default 200 costs ~25 s of
    per-micro-batch state-partition overhead on these fixtures, so pin a
    width matched to the QUERY for the stream's lifetime and restore
    after. Round-8 profiling (PLANS.md): the width trades state-store
    init (∝ partitions × state stores × batches) against kernel
    parallelism. Pass ``state_width=cluster_cores(spark)`` for single-batch
    applyInPandasWithState operators, whose per-key Python kernel is
    the cost and which halve with the extra parallelism
    (q_stream_lww_state at sf1: 27.6 → 11.8 s).
    """
    spark = stream_df.sparkSession
    name = f"mem_{uuid.uuid4().hex[:10]}"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    # Default width is env-parameterised (scale-dependent setting, guide
    # §2): state-store init cost is ∝ partitions × stores × batches, so
    # small bounded fixtures want few state partitions while a real
    # cluster sizes this to keys/executors. Round-12 per-query A/B at
    # sf0.1, 32 cores (isolated medians of 4): width 4 beats 8 and 16
    # on every built-in stateful member — e.g. tumbling 0.73/1.11/0.82,
    # stream-stream join 1.62/2.14/2.77, late_drop 1.00/1.25/1.50 at
    # 4/8/16 — because state-store init dominates on bounded drains.
    # Deployment guidance: this default sizes STATE PARTITIONS for a
    # fixture-scale drain; on a real cluster raise the env var toward
    # (active keys / executor memory budget) — stream-stream joins and
    # high-cardinality aggregations in particular need width that
    # spreads join state across executors, and Python-kernel stateful
    # operators (applyInPandasWithState) pass an explicit
    # ``state_width`` sized to cores instead (see
    # q_stream_stateful_counter / q_stream_lww_state).
    width = state_width or int(
        os.environ.get("SPARK_GRAFT_STREAM_STATE_WIDTH", "4")
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(width))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt_tmp("ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.table(name)


@register(
    "q_stream_tumbling",
    oracle=f"""
{E_CTE}
SELECT date_trunc('hour', ts) AS win_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM e GROUP BY 1, 2
""",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window counts with a 1-hour watermark — the
    same plan as batch q_tumbling_window lifted onto readStream. On the
    bounded fixture the final state equals the batch result (the oracle);
    the watermark becomes meaningful on unbounded input, bounding state."""
    ev = _stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.withColumn("win_start", F.col("win_start").cast("timestamp_ntz"))


@register("q_stream_sliding", oracle=_BATCH_SLIDING_ORACLE)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming 1h/15min sliding windows with watermark — each event
    expands into 4 window states; same oracle as batch q_sliding_window
    (bounded input ⇒ final state equals the batch result)."""
    ev = _stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.withColumn("win_start", F.col("win_start").cast("timestamp_ntz"))


_STREAM_LWW_ORACLE = f"""
{E_CTE},
ranked AS (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM e)
SELECT user_id, event_type, event_id, ts, value FROM ranked WHERE rn = 1
"""


@register("q_stream_lww", oracle=_STREAM_LWW_ORACLE)
def q_stream_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LWW register as a *continuously maintained* streaming state:
    max_by aggregation keyed (user_id, event_type) in complete mode —
    the reference's anti-entropy merge (R3) becomes a standing query.
    LWW's commutativity/idempotence is what makes arbitrary micro-batch
    boundaries safe: any arrival order converges to the same register."""
    ev = _stream_events(spark, sf_dir)
    ordering = F.struct(F.col("ts"), F.col("event_id"))
    payload = F.struct(F.col("event_id"), F.col("ts"), F.col("value"))
    agg = (
        ev.groupBy("user_id", "event_type")
        .agg(F.max_by(payload, ordering).alias("__r"))
        .select(
            "user_id",
            "event_type",
            F.col("__r.event_id").alias("event_id"),
            F.col("__r.ts").alias("ts"),
            F.col("__r.value").alias("value"),
        )
    )
    out = _run_to_memory(agg, "complete")
    return out.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


_STREAM_SESSION_ORACLE = f"""
{E_CTE},
t AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM e),
s AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM t),
g AS (
  SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_ts,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         ROUND(SUM(value), 2) AS total_value
  FROM s GROUP BY user_id, sess_id),
m AS (SELECT MAX(ts) AS mx FROM e)
SELECT user_id, session_start, n_events, total_value
FROM g, m
WHERE last_ts + INTERVAL 30 MINUTE <= mx - INTERVAL 30 MINUTE
"""


@register("q_stream_session", oracle=_STREAM_SESSION_ORACLE)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows in APPEND mode: a session is emitted
    only once the watermark (max event time − 30 min) passes its end
    (last_ts + 30 min gap) — so the stream's output is the batch result
    MINUS the still-open tail sessions. The oracle encodes exactly that
    truncation (last_ts ≤ max_ts − 60 min), making watermark semantics
    themselves oracle-checked, not just asserted. The final no-data
    micro-batch that availableNow commits is what advances the watermark
    and flushes the closed sessions."""
    ev = _stream_events(spark, sf_dir).withWatermark("ts", "30 minutes")
    agg = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )
    out = _run_to_memory(agg, "append")
    return out.withColumn(
        "session_start", F.col("session_start").cast("timestamp_ntz")
    )


_STREAM_JOIN_ORACLE = f"""
{E_CTE},
p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM e
      WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_id, user_id, ts AS c_ts FROM e
      WHERE event_type = 'click')
SELECT p.purchase_id, c.click_id, p.user_id
FROM p JOIN c
  ON p.user_id = c.user_id
 AND c.c_ts >= p.p_ts - INTERVAL 30 MINUTE
 AND c.c_ts <= p.p_ts
"""


@register("q_stream_stream_join", oracle=_STREAM_JOIN_ORACLE)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks in the preceding 30 minutes — the attribution join as
    two live streams. Both sides carry watermarks and the join condition
    carries the time bound, which is what lets Spark evict join state
    (purchases older than click-watermark − 30 min can never match
    again). Inner joins emit matches as both sides arrive, so on bounded
    input the result equals the batch interval join — the oracle."""
    ev = _stream_events(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 30 MINUTE"))
        & (clicks.c_ts <= purchases.p_ts),
        "inner",
    ).select("purchase_id", "click_id", "user_id")
    return _run_to_memory(joined, "append")


def _counter_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState kernel: running per-user event count +
    running value sum, persisted in the state store across micro-batches."""
    (user_id,) = key
    if state.exists:
        (n, total) = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
    )


@register(
    "q_stream_stateful_counter",
    oracle="SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
    "ROUND(SUM(value), 2) AS total_value FROM events GROUP BY user_id",
)
def q_stream_stateful_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, sum) state — the escape hatch for stateful semantics
    the built-in aggregates can't express (reference analog: the node's
    in-memory updateModifications dict, SQLite3DBConnector.py:83, held as
    managed, fault-tolerant state instead of a process-local python dict).
    On bounded input the final emission equals the batch group-by."""
    from ..widths import fanout_width

    ev = _stream_events(spark, sf_dir)
    out = ev.groupBy("user_id").applyInPandasWithState(
        _counter_fn,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # Python-kernel stateful operator: the per-group pandas dispatch is
    # the cost, so width follows the machine (widths.fanout_width =
    # cores/2), not the fixture-sized default. Round-12 A/B at sf0.1,
    # 32 cores: width 4 → 1.70 s, 8 → 1.42, 16 → 1.05, 32 → 1.54 —
    # cores/2 is the plateau, matching the module-wide fan-out policy.
    return _run_to_memory(out, "update", state_width=fanout_width(spark))


@register(
    "q_stream_dedup",
    oracle=f"""
{E_CTE}
SELECT DISTINCT user_id, event_type, date_trunc('hour', ts) AS hr
FROM e
""",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication with bounded state:
    dropDuplicatesWithinWatermark on (user_id, event_type, hour) — the
    streaming twin of exact dedup (q_dedup_exact) for a continuously
    arriving changelog. First-arrival rows are emitted immediately
    (append mode, no window end to wait for); the watermark lets the
    state store EVICT keys older than the lateness bound instead of
    holding every key ever seen — the difference between O(active keys)
    and O(all history) state at 100 TB. Output is projected to the dedup
    key, so which duplicate arrived first is immaterial — the result is
    exactly the batch DISTINCT the oracle computes."""
    ev = _stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    keyed = ev.select(
        "ts",
        "user_id",
        "event_type",
        F.date_trunc("hour", "ts").alias("hr"),
    )
    deduped = keyed.dropDuplicatesWithinWatermark(
        ["user_id", "event_type", "hr"]
    ).select("user_id", "event_type", "hr")
    out = _run_to_memory(deduped, "append")
    return out.withColumn("hr", F.col("hr").cast("timestamp_ntz"))


@register(
    "q_stream_compact",
    oracle=f"""
{E_CTE},
ranked AS (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM e)
SELECT user_id, event_type, event_id, ts, value
FROM ranked WHERE rn = 1
""",
)
def q_stream_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming write path END-TO-END: foreachBatch drives the
    versioned on-disk register (sources/compaction.py) — each
    micro-batch folds its delta into a new LWW-compacted parquet
    version, exactly how the production sink runs (Delta/Iceberg MERGE
    per micro-batch). The returned DataFrame is the register read back
    from disk after the stream drains; the oracle is the batch LWW
    state over all events. Idempotency note: compact() is
    commutative/idempotent per delta, so a micro-batch retry after a
    sink failure converges (the reference replays its changelog the
    same way, SURVEY §3.2)."""
    from ..sources.compaction import compact, read_register

    base = os.path.join(
        scratch_tmp("stream_register_"), "register"
    )
    keys, order = ["user_id", "event_type"], ["ts", "event_id"]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        compact(batch_df.sparkSession, base, batch_df, keys, order)

    ev = _stream_events(spark, sf_dir).select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        q = (
            ev.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt_tmp("ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    # return the lazy read over the final version: the register dir
    # outlives the query fn (scratch_tmp removes it only at process
    # exit, after any driver-side collect), so no localCheckpoint
    # double-materialization is needed — round 2 paid an extra full pass
    # (checkpoint compute+store, then reread) just to allow an eager
    # cleanup of a few MB of /tmp
    out = read_register(spark, base).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    return out.select("user_id", "event_type", "event_id", "ts", "value")


@register(
    "q_stream_static_join",
    oracle=f"""
{E_CTE}
SELECT c.c_mktsegment, e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(e.value), 2) AS total_value
FROM e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment, e.event_type
""",
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment — THE canonical streaming pattern: the
    event stream joins a static dimension (customer) micro-batch by
    micro-batch, then aggregates per (segment, type). The static side
    is planned as a broadcast into each micro-batch (no stream-side
    state for the join; only the downstream aggregate keeps state).
    On bounded input the final table equals the batch join+aggregate,
    which the oracle checks."""
    from ..catalog import load_table

    ev = _stream_events(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    agg = (
        ev.join(F.broadcast(cust), "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    return _run_to_memory(agg, "complete")


_LATE_SPLIT = "2024-01-10"
_LATE_DIRS: dict[str, str] = {}


def _late_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Three-file stream: A1 + A2 = events on/after the split date (two
    on-time batches), B = everything before the split, arriving LAST.
    Three files, not two, because of a measured Spark semantic: the
    late-event filter uses the watermark as of ONE COMMIT EARLIER than
    the running batch (state EVICTION uses the current watermark, late-
    row filtering the previous one — watermark propagation lags a
    batch). With only two files the late batch runs under the initial
    1970 watermark and nothing is dropped; with the bulk split across
    two leading batches, the late batch filters under ~max_ts - delay.
    File order is pinned by mtime (FileStreamSource processes oldest
    first)."""
    if sf_dir not in _LATE_DIRS:
        ensure_runtime_confs(spark)
        d = scratch_tmp("events_late_")
        raw = spark.read.schema(_events_ddl(spark, sf_dir)).parquet(
            f"{sf_dir}/events.parquet"
        )
        ts = _event_time_col(spark, sf_dir)
        split = F.lit(_LATE_SPLIT).cast("timestamp")
        mid = F.lit("2024-01-20").cast("timestamp")
        raw.filter((ts >= split) & (ts < mid)).coalesce(1).write.parquet(f"{d}/a1")
        raw.filter(ts >= mid).coalesce(1).write.parquet(f"{d}/a2")
        raw.filter(ts < split).coalesce(1).write.parquet(f"{d}/b")
        import glob as _glob

        out = scratch_tmp("events_late_stream_")
        for sub, mtime in (("a1", 1_000_000), ("a2", 2_000_000), ("b", 3_000_000)):
            (src,) = _glob.glob(f"{d}/{sub}/part-*.parquet")
            dst = f"{out}/{sub}.parquet"
            os.rename(src, dst)
            os.utime(dst, (mtime, mtime))
        _LATE_DIRS[sf_dir] = out
    return _LATE_DIRS[sf_dir]


@register(
    "q_stream_late_drop",
    oracle=f"""
{E_CTE}
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM e
WHERE ts >= TIMESTAMP '{_LATE_SPLIT}'
GROUP BY 1, 2
""",
)
def q_stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA DROP, oracle-encoded: two on-time micro-
    batches push the watermark to ~max event time; the final micro-
    batch carries ONLY pre-split events — every one lands in a day-
    window whose end precedes the (one-commit-lagged, see
    _late_stream_dir) late-event watermark, so the stateful aggregate
    DROPS them all. The oracle is the batch aggregate over on-time
    rows only — the drop itself is what the differential check
    verifies (q_stream_session checks append-mode emission timing;
    this checks state-side rejection). maxFilesPerTrigger=1 pins the
    three-batch schedule."""
    d = _late_stream_dir(spark, sf_dir)
    raw = (
        spark.readStream.schema(_events_ddl(spark, sf_dir))
        .option("maxFilesPerTrigger", 1)
        .format("parquet")
        .load(d)
    )
    ev = raw.withColumn("ts", _event_time_col(spark, sf_dir)).withWatermark(
        "ts", "1 hour"
    )
    agg = (
        ev.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("day"), "event_type", "n_events"
        )
    )
    out = _run_to_memory(agg, "update")
    return out.withColumn("day", F.col("day").cast("timestamp_ntz"))


# --- q_stream_incr_view ---------------------------------------------------

_INCR_FILES = 8
_INCR_DIRS: dict[str, str] = {}


def _events_multifile_dir(spark: SparkSession, sf_dir: str) -> str:
    """Events rewritten as 8 parquet files so maxFilesPerTrigger yields
    genuinely multiple micro-batches (the fixture is one file)."""
    if sf_dir not in _INCR_DIRS:
        from ..catalog import load_table
        from ..scratch import scratch_dir

        out = scratch_dir("incrsrc", sf_dir)
        (
            load_table(spark, sf_dir, "events")
            .select("event_id", "event_type", "value")
            .repartition(_INCR_FILES)
            .write.mode("overwrite")
            .parquet(out)
        )
        _INCR_DIRS[sf_dir] = out
    return _INCR_DIRS[sf_dir]


@register(
    "q_stream_incr_view",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY event_type
""",
)
def q_stream_incr_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MATERIALIZED-VIEW maintenance — the streaming
    lakehouse pattern q_stream_compact's LWW register doesn't cover:
    each micro-batch folds its ADDITIVE partial aggregate into a
    versioned on-disk view (old view ∪ batch partial → re-aggregate →
    new version), i.e. what Delta Live Tables / Materialize do for
    `SELECT event_type, count(*), sum(cents) GROUP BY event_type`.
    maxFilesPerTrigger=2 over an 8-file copy forces 4 real micro-batch
    merges, so the fold path is actually exercised; the oracle is the
    batch census, which the final view version must equal exactly
    (integer-cent sums — associativity is exact, so arrival order
    can't change the result).

    Scale: the view is aggregate-sized (|distinct keys|), so each merge
    shuffles the batch partial + a tiny table; the source is never
    re-scanned (contrast a full-refresh MV, which re-reads everything
    every trigger — the whole point of incremental maintenance)."""
    src = _events_multifile_dir(spark, sf_dir)
    base = scratch_tmp("incr_view_")

    def _versions() -> list[str]:
        return sorted(
            d
            for d in os.listdir(base)
            if d.startswith("v") and d[1:].isdigit()
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch contract: a failed micro-batch is RE-EXECUTED with
        # the same batch_id, so the sink must be idempotent by batch_id.
        # The version path derives from batch_id (not a closure counter);
        # a retry whose version dir already landed is a no-op, and the
        # write is staged + atomically renamed so a mid-write crash never
        # leaves a half-version that a retry would mistake for complete.
        vpath = f"{base}/v{batch_id:06d}"
        if os.path.isdir(vpath):
            return
        partial = batch_df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.round(F.col("value") * 100).cast("long")
            ).alias("cents"),
        )
        s = batch_df.sparkSession
        prior = _versions()
        if prior:
            cur = s.read.parquet(f"{base}/{prior[-1]}")
            partial = (
                cur.unionByName(partial)
                .groupBy("event_type")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("cents").alias("cents"),
                )
            )
        stage = f"{base}/_stage_v{batch_id:06d}"
        partial.coalesce(1).write.mode("overwrite").parquet(stage)
        os.rename(stage, vpath)

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            spark.readStream.schema(
                "event_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", "2")
            .parquet(src)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt_tmp("ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.read.parquet(f"{base}/{_versions()[-1]}")


@register(
    "q_stream_source_avro",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY o_orderstatus
""",
)
def q_stream_source_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ingest through the pure-Python Avro codec: the orders
    table is landed as Avro container files (sources/avro_py.py), then
    read back as a FILE STREAM — binaryFile streaming source feeding
    the same mapInPandas decoder the batch path uses — and aggregated
    to the batch answer (availableNow drain). Proves the custom-codec
    plumbing composes with Structured Streaming unchanged: a
    landing-zone directory of Avro files becomes an incremental
    pipeline by swapping read() for readStream(), which is exactly the
    Kafka-archive/landing-zone ingest shape at 100 TB (new files =
    new micro-batches; the decoder runs per-task on whole files)."""
    import os as _os

    from ..catalog import load_table
    from ..scratch import scratch_dir
    from ..sources.avro_py import write_avro_dir

    ensure_runtime_confs(spark)
    out = scratch_dir("avro_stream", sf_dir)
    from ..widths import cluster_cores

    # width the encode so write and binaryFile read parallelize past
    # the source's scan-partition count (see relational_ext9)
    src = load_table(spark, sf_dir, "orders").repartition(
        cluster_cores(spark)
    )
    if not _os.path.isdir(out) or not _os.listdir(out):
        write_avro_dir(src, out)
    # the streaming twin of read_avro_dir: binaryFile as a stream,
    # decoded by the SAME kernel the batch reader uses
    from pyspark.sql import types as T

    from ..sources.avro_py import decode_kernel

    files = (
        spark.readStream.format("binaryFile")
        .schema(
            T.StructType(
                [
                    T.StructField("path", T.StringType()),
                    T.StructField("modificationTime", T.TimestampType()),
                    T.StructField("length", T.LongType()),
                    T.StructField("content", T.BinaryType()),
                ]
            )
        )
        .load(_os.path.join(out, "*.avro"))
    )
    decoded = files.select("content").mapInPandas(
        decode_kernel(src.schema), schema=src.schema
    )
    agg = decoded.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )
    return _run_to_memory(agg, "complete")


@register(
    "q_stream_source_bson",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key
FROM orders GROUP BY o_orderstatus
""",
)
def q_stream_source_bson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ingest of mongodump exports: BSON files
    (sources/bson_py.py) read as a binaryFile stream and decoded by
    the same per-file kernel the batch path uses — the incremental
    migration shape off the reference's MongoDB backend (each new dump
    chunk in the landing directory becomes a micro-batch; availableNow
    drains to the batch answer). Sibling of q_stream_source_avro with
    the other interchange codec."""
    import os as _os

    from pyspark.sql import types as T

    from ..catalog import load_table
    from ..scratch import scratch_dir
    from ..sources.bson_py import decode_documents, write_bson_dir

    ensure_runtime_confs(spark)
    out = scratch_dir("bson_stream", sf_dir)
    cols = ["o_orderkey", "o_orderstatus"]
    from ..widths import cluster_cores

    src = (
        load_table(spark, sf_dir, "orders")
        .select(*cols)
        .repartition(cluster_cores(spark))
    )
    if not _os.path.isdir(out) or not _os.listdir(out):
        write_bson_dir(src, out)
    files = (
        spark.readStream.format("binaryFile")
        .schema(
            T.StructType(
                [
                    T.StructField("path", T.StringType()),
                    T.StructField("modificationTime", T.TimestampType()),
                    T.StructField("length", T.LongType()),
                    T.StructField("content", T.BinaryType()),
                ]
            )
        )
        .load(_os.path.join(out, "*.bson"))
    )

    def _read(it):
        import pandas as pd

        for pdf in it:
            for content in pdf["content"]:
                docs = decode_documents(bytes(content))
                yield pd.DataFrame(
                    {c: [d.get(c) for d in docs] for c in cols},
                    columns=cols,
                )

    decoded = files.select("content").mapInPandas(_read, schema=src.schema)
    agg = decoded.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_key"),
    )
    return _run_to_memory(agg, "complete")
