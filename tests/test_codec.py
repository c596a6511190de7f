import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bitfunnel_spark.operators.codec import (
    decode_postings,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)


def test_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0
    assert decode_postings(b"").size == 0


def test_known_values():
    # 0 → one byte 0x00; 127 → 0x7f; 128 → 0x80 0x01 (little-endian 7-bit groups)
    assert varbyte_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varbyte_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varbyte_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
def test_varbyte_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(v)).tolist() == vals


@settings(max_examples=200, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_postings_roundtrip(ids):
    d = np.array(sorted(ids), dtype=np.uint64)
    assert decode_postings(encode_postings(d)).tolist() == sorted(ids)


def test_uint64_max():
    v = np.array([2**64 - 1, 1, 2**64 - 1], dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(v)).tolist() == v.tolist()
