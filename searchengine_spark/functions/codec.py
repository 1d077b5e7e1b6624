"""Delta + varint posting-list codec, numpy-vectorized (no per-row Python).

The reference stores postings as plain relational rows
(``search_index(page_id, lemma_id, rank)`` —
/root/reference/src/main/java/searchengine/model/Index.java:14-40, i.e. an
uncompressed posting table). The target design (SURVEY §4.3.2 /
BASELINE.json north_star) replaces that with sorted posting blocks whose
doc-id gaps are delta-encoded and LEB128-varint-compressed.

Both encode and decode are fully vectorized:

- encode: per-value byte counts come from 9 integer comparisons (exact — no
  float log2), byte positions from a cumsum, and each of the ≤10 byte slots
  is filled with one masked shift over the whole array.
- decode: continuation bits locate value boundaries; 7-bit groups are shifted
  by their within-value index and combined with ``np.add.reduceat`` (disjoint
  bit ranges, so add == or).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_THRESHOLDS = [np.uint64(1) << np.uint64(7 * i) for i in range(1, 10)]


def varint_encode_array(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a 1-D array of non-negative integers.

    Returns ``(bytes_u8, value_offsets)`` where ``bytes_u8`` is the encoded
    stream as a uint8 array and ``value_offsets`` (int64, length n+1) gives
    each value's starting byte offset (last element = total length). The
    offsets let a caller slice the stream at arbitrary value boundaries —
    the block encoder encodes a whole (multi-block) chunk in ONE vectorized
    pass and splits per posting block afterwards, instead of running the
    encoder once per 128-entry block."""
    vals = np.ascontiguousarray(values, dtype=_U64)
    if vals.size == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    nbytes = np.ones(vals.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += vals >= t
    ends = np.cumsum(nbytes)
    offsets = np.concatenate(([0], ends))
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    for i in range(10):
        mask = nbytes > i
        if not mask.any():
            break
        chunk = (vals[mask] >> _U64(7 * i)) & _U64(0x7F)
        cont = (nbytes[mask] - 1 > i).astype(np.uint8) << 7
        out[offsets[:-1][mask] + i] = chunk.astype(np.uint8) | cont
    return out, offsets


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a 1-D array of non-negative integers to bytes."""
    return varint_encode_array(values)[0].tobytes()


def varint_decode(data: bytes) -> np.ndarray:
    """Inverse of :func:`varint_encode`; returns ``uint64`` array."""
    if not data:
        return np.empty(0, dtype=_U64)
    b = np.frombuffer(data, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    starts = np.concatenate(([0], np.flatnonzero(is_last)[:-1] + 1))
    # within-value byte index = position - start of its value
    value_id = np.cumsum(np.concatenate(([0], is_last[:-1].astype(np.int64))))
    shifts = (np.arange(b.size, dtype=np.int64) - starts[value_id]) * 7
    contrib = (b & 0x7F).astype(_U64) << shifts.astype(_U64)
    return np.add.reduceat(contrib, starts)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing ids → gaps (first element absolute)."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if ids.size == 0:
        return np.empty(0, dtype=np.int64)
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    """Inverse of :func:`delta_encode`."""
    return np.cumsum(np.ascontiguousarray(gaps, dtype=np.int64))


def encode_postings(doc_ids: np.ndarray) -> bytes:
    """Sorted doc ids → delta+varint bytes (one posting-block column)."""
    return varint_encode(delta_encode(doc_ids))


def decode_postings(data: bytes) -> np.ndarray:
    """Inverse of :func:`encode_postings`; returns ``int64`` doc ids."""
    return delta_decode(varint_decode(data).astype(np.int64))
