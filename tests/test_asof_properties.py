"""Property tests for the time-travel reader (VERDICT r4 #8):
read_register_asof must satisfy, for ANY changelog and ANY batching of
it into compactions:

- asof(T_latest) == current register state (read_register);
- monotonicity: for T1 <= T2, every key live at T1 is live at T2 and
  its winning (order) coordinate never moves backward;
- model equivalence: asof(T) equals a pure-Python LWW fold of the
  updates with ts <= T (independent implementation, not Spark).

Hypothesis drives random changelogs, random batch splits, and random
cut points; Spark work per example is bounded (tiny frames).
"""

from __future__ import annotations

import os

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import types as T

from nosql_triple_store_spark.sources.compaction import (
    compact,
    init_register,
    read_register,
    read_register_asof,
)

KEYS = ["k"]
ORDER = ["ts", "uid"]

_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("uid", T.LongType(), False),
        T.StructField("v", T.LongType(), False),
    ]
)

# an update: (key, event-ts, unique id, value)
_updates = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=0, max_value=10**6),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=1,
    max_size=24,
    unique_by=lambda u: u[2],  # uid is the tiebreak; keep it unique
)


def _model_state(updates, t):
    """Pure-Python LWW fold of updates with ts <= t."""
    state = {}
    for k, ts, uid, v in updates:
        if ts > t:
            continue
        cur = state.get(k)
        if cur is None or (ts, uid) > (cur[0], cur[1]):
            state[k] = (ts, uid, v)
    return {
        k: (ts, uid, v) for k, (ts, uid, v) in state.items()
    }


def _spark_state(df):
    return {
        r.k: (r.ts, r.uid, r.v)
        for r in df.select("k", "ts", "uid", "v").collect()
    }


@settings(max_examples=6, deadline=None)
@given(
    updates=_updates,
    nbatches=st.integers(min_value=1, max_value=3),
    cuts=st.lists(
        st.integers(min_value=-1, max_value=21), min_size=2, max_size=3
    ),
)
def test_asof_matches_model_and_is_monotone(
    spark, tmp_path_factory, updates, nbatches, cuts
):
    base = os.path.join(
        str(tmp_path_factory.mktemp("asof_prop")), "reg"
    )
    rows = [Row(k=k, ts=ts, uid=uid, v=v) for k, ts, uid, v in updates]
    # arbitrary batching must not affect any asof read
    batches = [rows[i::nbatches] for i in range(nbatches)]
    batches = [b for b in batches if b]
    init_register(
        spark.createDataFrame(batches[0], _SCHEMA), base, KEYS, ORDER
    )
    for b in batches[1:]:
        compact(spark, base, spark.createDataFrame(b, _SCHEMA), KEYS, ORDER)

    t_latest = max(u[1] for u in updates)
    # asof(latest) == current compacted state
    asof_latest = _spark_state(
        read_register_asof(spark, base, KEYS, ORDER, t_latest)
    )
    current = _spark_state(read_register(spark, base))
    assert asof_latest == current

    states = {}
    for t in sorted(set(cuts) | {t_latest}):
        got = _spark_state(read_register_asof(spark, base, KEYS, ORDER, t))
        assert got == _model_state(updates, t), f"asof({t}) != model"
        states[t] = got

    # monotonicity across increasing cuts
    ts_sorted = sorted(states)
    for t1, t2 in zip(ts_sorted, ts_sorted[1:]):
        s1, s2 = states[t1], states[t2]
        assert set(s1) <= set(s2), "a live key vanished going forward"
        for k in s1:
            assert (s1[k][0], s1[k][1]) <= (s2[k][0], s2[k][1]), (
                "winning (ts, uid) moved backward"
            )
