"""Hypothesis fuzz for the pure-Python interchange codecs: any scalar
row multiset must roundtrip bit-exactly through the BSON document
stream and the Avro binary record encoding — driver-free (no Spark),
so the fuzz runs hundreds of examples in seconds."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from nosql_triple_store_spark.sources.bson_py import (
    decode_documents,
    encode_document,
)

_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.lists(_scalars, min_size=1, max_size=6), min_size=1, max_size=8))
def test_bson_stream_roundtrip(rows):
    width = len(rows[0])
    rows = [r[:width] + [None] * (width - len(r)) for r in rows]
    keys = [f"k{i}" for i in range(width)]
    stream = b"".join(encode_document(keys, r) for r in rows)
    back = decode_documents(stream)
    assert len(back) == len(rows)
    for want, got in zip(rows, back):
        for k, v in zip(keys, want):
            g = got[k]
            if isinstance(v, float) and isinstance(g, float):
                assert math.isclose(v, g, rel_tol=0, abs_tol=0) or v == g
            else:
                assert g == v, (k, v, g)


def test_avro_zigzag_varint_roundtrip_fuzz():
    from nosql_triple_store_spark.sources.avro_py import _enc_long, _Reader

    import random

    rng = random.Random(42)
    vals = (
        [0, 1, -1, 2**62, -(2**62), 63, -64]
        + [rng.randint(-(2**62), 2**62) for _ in range(500)]
    )
    buf = b"".join(_enc_long(v) for v in vals)
    r = _Reader(buf)
    for v in vals:
        assert r.long() == v
    assert r.pos == len(buf)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
            st.text(max_size=30),
            st.booleans(),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_avro_record_body_roundtrip(rows):
    """Encode records through the same kinds-table the Spark writer
    uses, decode with the reader's primitive set."""
    import pandas as pd

    from nosql_triple_store_spark.sources.avro_py import (
        _encode_records,
        _Reader,
    )

    kinds = [
        ("i", "long", True),
        ("d", "double", True),
        ("s", "string", True),
        ("b", "boolean", True),
    ]
    pdf = pd.DataFrame(rows, columns=["i", "d", "s", "b"])
    body = _encode_records(pdf, kinds)
    r = _Reader(body)
    for i, d, s, b in rows:
        assert r.long() == 1 and r.long() == i
        assert r.long() == 1 and r.double() == d
        assert r.long() == 1 and r.str_() == s
        assert r.long() == 1 and (r.raw(1) == b"\x01") == b
    assert r.pos == len(body)
