"""q_stream_transform_state (Spark 4 transformWithStateInPandas) needs
the google.protobuf runtime, which this container lacks. These tests pin
the skip-guard contract — the registry NEVER exposes a query that cannot
run in the current environment — and unit-test the stateful processor's
LWW semantics directly, so the logic is verified even where the runtime
can't execute it (its applyInPandasWithState twin q_stream_lww_state is
oracle-checked end-to-end)."""

from __future__ import annotations

import pandas as pd

from nosql_triple_store_spark.registry import all_specs
from nosql_triple_store_spark.streaming.transform_state import (
    _make_lww_processor,
    _protobuf_available,
)


def test_registration_tracks_protobuf_availability():
    registered = "q_stream_transform_state" in all_specs()
    assert registered == _protobuf_available()


def test_guard_is_import_probe(monkeypatch):
    """The guard must be a pure import probe: with a stub module visible
    it reports True, without it False — so on a protobuf-equipped
    cluster the query auto-registers with no code change."""
    import sys
    import types

    fake_descriptor = types.ModuleType("google.protobuf.descriptor")
    fake_protobuf = types.ModuleType("google.protobuf")
    fake_protobuf.descriptor = fake_descriptor
    fake_google = types.ModuleType("google")
    fake_google.protobuf = fake_protobuf
    monkeypatch.setitem(sys.modules, "google", fake_google)
    monkeypatch.setitem(sys.modules, "google.protobuf", fake_protobuf)
    monkeypatch.setitem(
        sys.modules, "google.protobuf.descriptor", fake_descriptor
    )
    assert _protobuf_available() is True


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def _run(proc, key, batches):
    outs = []
    for pdf in [batches]:
        outs.extend(proc.handleInputRows(key, iter(pdf), None))
    return outs


def test_processor_lww_semantics():
    proc = _make_lww_processor()
    proc._reg = _FakeValueState()
    key = (7, "click")
    b1 = pd.DataFrame(
        {"ts_us": [10, 30, 20], "event_id": [1, 2, 3], "value": [0.1, 0.2, 0.3]}
    )
    (out1,) = _run(proc, key, [b1])
    # max (ts, event_id) wins within a batch
    assert out1.iloc[0]["event_id"] == 2 and out1.iloc[0]["ts_us"] == 30

    # a later batch with an OLDER timestamp must not displace the state
    b2 = pd.DataFrame({"ts_us": [5], "event_id": [9], "value": [9.9]})
    (out2,) = _run(proc, key, [b2])
    assert out2.iloc[0]["event_id"] == 2 and out2.iloc[0]["ts_us"] == 30

    # ts tie → higher event_id wins (the LWW tiebreak everywhere else)
    b3 = pd.DataFrame({"ts_us": [30], "event_id": [8], "value": [1.0]})
    (out3,) = _run(proc, key, [b3])
    assert out3.iloc[0]["event_id"] == 8
