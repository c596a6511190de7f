"""Vectorized delta + varbyte codec for posting blocks (pure NumPy).

The reference compresses by *construction* (shared bit rows, higher-rank
row compression — /root/reference/inc/BitFunnel/Index/Row.h:37-63); an exact
inverted index compresses posting lists instead: sorted doc_ids → gaps →
varbyte (7 data bits/byte, high bit = continuation). Both encode and decode
are vectorized NumPy — no per-element Python loops (the only loop is over
byte positions, ≤10 iterations).

Unit-testable off-Spark (SURVEY §7: keep kernels pure-NumPy).
"""

from __future__ import annotations

import numpy as np


def varbyte_encode_arr(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint64 array → (byte array, per-value byte counts).

    The per-value counts let a caller encode MANY logical sequences in one
    pass and then split the buffer at value boundaries (see
    segments._encode_group) — the per-block-encode-call formulation was the
    measured build bottleneck (~30 tiny NumPy calls per block).
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    nb = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for k in range(int(nb.max())):
        sel = nb > k
        idx = starts[sel] + k
        byte = (v[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nb[sel] - 1) > k
        out[idx] = byte.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out, nb


def varbyte_encode(values: np.ndarray) -> bytes:
    """uint64 array → varbyte bytes."""
    return varbyte_encode_arr(values)[0].tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """varbyte bytes → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.concatenate(([0], ends[:-1] + 1))
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(starts, ends - starts + 1)
    contrib = (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    return np.add.reduceat(contrib, starts)


def encode_postings(doc_ids: np.ndarray) -> bytes:
    """Sorted doc_ids → varbyte(first, gaps...)."""
    d = np.asarray(doc_ids, dtype=np.uint64)
    if d.size == 0:
        return b""
    gaps = np.empty_like(d)
    gaps[0] = d[0]
    np.subtract(d[1:], d[:-1], out=gaps[1:])
    return varbyte_encode(gaps)


def decode_postings(buf: bytes) -> np.ndarray:
    """varbyte(first, gaps...) → sorted doc_ids (uint64)."""
    gaps = varbyte_decode(buf)
    return np.cumsum(gaps, dtype=np.uint64)


def decode_doc_block(buf: bytes, enc: str, first_doc: int = 0) -> np.ndarray:
    """Decode one block's doc ids under its treatment encoding
    (operators/segments.py ENC_*): 'vb' delta+varbyte, 'raw' little-endian
    int64 absolutes, 'gap32' uint32 gaps relative to the block's first_doc."""
    if enc == "raw":
        return np.frombuffer(buf, dtype="<i8").astype(np.int64)
    if enc == "gap32":
        g = np.frombuffer(buf, dtype="<u4").astype(np.int64)
        return first_doc + np.cumsum(g)
    return decode_postings(buf).astype(np.int64)
