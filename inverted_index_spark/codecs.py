"""Posting-list compression codecs (delta + varint + FOR), pure numpy.

The reference keeps postings as uncompressed in-memory vectors
(/root/reference/src/postings.rs:19 — ``BTreeMap<usize, Vec<Position>>``);
compression is a north-rule requirement for the 10^12-turn design point,
not a parity one. Segment blobs store, per term:

  * doc_ids  — strictly increasing -> delta + varint (LEB128)
  * tfs      — small positive ints -> varint
  * positions (optional) — per-doc (begin, end, pos) triples ->
    frame-of-reference on begin + delta within the triple + varint

All encoders/decoders are vectorized numpy (no per-element Python in the
hot loop for sizes that matter): varint bytes are computed by splitting
each value into 7-bit groups with shifts and writing via flat fancy
indexing.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_MAX_VARINT_BYTES = 10  # 64-bit values


def _varint_parts(values: np.ndarray):
    """Vectorized LEB128 core -> (byte array, per-VALUE byte offsets)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, np.uint8), np.zeros(1, np.int64)
    # bytes needed per value: position of highest set bit / 7 (min 1)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = tmp >= (np.uint64(1) << np.uint64(shift))
        nbits[mask] += shift
        tmp[mask] >>= np.uint64(shift)
    nbytes = nbits // 7 + 1
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    # write 7-bit groups: group g of value i lands at offsets[i] + g
    max_groups = int(nbytes.max())
    for g in range(max_groups):
        sel = nbytes > g
        idx = offsets[:-1][sel] + g
        chunk = (v[sel] >> np.uint64(7 * g)) & np.uint64(0x7F)
        cont = np.where(nbytes[sel] > g + 1, 0x80, 0).astype(np.uint8)
        out[idx] = chunk.astype(np.uint8) | cont
    return out, offsets


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, fully vectorized.

    Each value emits ceil(bits/7) bytes; continuation bit 0x80 on all but
    the last byte of each value.
    """
    out, _ = _varint_parts(values)
    return out.tobytes()


def varint_encode_segmented(
    values: np.ndarray, seg_value_starts: np.ndarray
):
    """ONE varint encode over a flat array that holds many segments
    back-to-back -> (byte array, per-SEGMENT byte offsets, len nseg+1).

    The per-segment blobs are byte-identical to encoding each segment
    separately (LEB128 is context-free), so millions of tiny
    per-posting-list encodes collapse into a single vectorized pass —
    callers slice (or build arrow binary offsets from) the result.
    """
    out, val_off = _varint_parts(values)
    starts = np.asarray(seg_value_starts, dtype=np.int64)
    seg_off = np.empty(starts.size + 1, dtype=np.int64)
    seg_off[:-1] = val_off[starts]
    seg_off[-1] = val_off[-1]
    return out, seg_off


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode ``count`` LEB128 values from ``buf`` (vectorized)."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    is_last = (raw & 0x80) == 0  # terminal byte of each value
    ends = np.flatnonzero(is_last)[:count]
    starts = np.concatenate(([0], ends[:-1] + 1))
    values = np.zeros(count, dtype=np.uint64)
    max_len = int((ends - starts).max()) + 1
    for g in range(max_len):
        pos = starts + g
        sel = pos <= ends
        values[sel] |= (raw[pos[sel]].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(
            7 * g
        )
    return values


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """Strictly-increasing int array -> first value + gaps (uint64)."""
    v = np.asarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.uint64), dtype=np.uint64)


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Sorted doc ids -> delta + varint blob."""
    return varint_encode(delta_encode(doc_ids))


def decode_doc_ids(buf: bytes, count: int) -> np.ndarray:
    return delta_decode(varint_decode(buf, count)).astype(np.int64)


def encode_tfs(tfs: np.ndarray) -> bytes:
    return varint_encode(np.asarray(tfs, dtype=np.uint64))


def decode_tfs(buf: bytes, count: int) -> np.ndarray:
    return varint_decode(buf, count).astype(np.int32)


def encode_positions(
    begins: np.ndarray, ends: np.ndarray, poss: np.ndarray
) -> bytes:
    """One doc's sorted position triples -> FOR + delta + varint blob.

    Layout (all varint): n, base_begin, then per triple
    (begin_delta_from_prev_begin, end - begin, pos_delta_from_prev_pos).
    ``begin`` and ``pos`` are non-decreasing within a doc (analyzer emits
    in scan order; coalescing preserves order), so deltas are small and
    non-negative; width = end - begin is tiny. FOR base is the first
    begin.
    """
    b = np.asarray(begins, dtype=np.uint64)
    e = np.asarray(ends, dtype=np.uint64)
    p = np.asarray(poss, dtype=np.uint64)
    n = b.size
    head = np.array([n], dtype=np.uint64)
    if n == 0:
        return varint_encode(head)
    payload = np.empty(1 + 3 * n, dtype=np.uint64)
    payload[0] = n
    payload[1::3] = delta_encode(b)
    payload[2::3] = e - b
    payload[3::3] = delta_encode(p)
    return varint_encode(payload)


def decode_positions(buf: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    n = int(varint_decode(buf[:_MAX_VARINT_BYTES], 1)[0])
    vals = varint_decode(buf, 1 + 3 * n)[1:]
    begins = delta_decode(vals[0::3]).astype(np.int64)
    widths = vals[1::3].astype(np.int64)
    poss = delta_decode(vals[2::3]).astype(np.int64)
    return begins, begins + widths, poss


def _segmented_delta(values: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-segment delta encode a flat int64 array; ``starts`` marks the
    first index of each segment (values non-decreasing within one)."""
    v = np.asarray(values, dtype=np.int64)
    out = np.empty_like(v)
    if v.size == 0:
        return out.astype(np.uint64)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    out[starts] = v[starts]  # reset at segment boundaries
    return out.astype(np.uint64)


def encode_pos_block(
    counts: np.ndarray,
    begins: np.ndarray,
    ends: np.ndarray,
    poss: np.ndarray,
) -> bytes:
    """Positions of one (term, block) segment row -> varint blob.

    ``counts[i]`` = number of position triples of the row's i-th doc;
    ``begins/ends/poss`` are the triples flattened doc-after-doc (begin
    and pos non-decreasing within a doc). Planar layout, all varint:
    [per-doc delta'd begins] ++ [widths] ++ [per-doc delta'd poss].
    The doc boundaries come from ``counts`` (stored separately), so the
    blob itself carries no headers.
    """
    c = np.asarray(counts, dtype=np.int64)
    total = int(c.sum())
    if total == 0:
        return b""
    starts = np.concatenate(([0], np.cumsum(c)[:-1]))[c > 0]
    b = np.asarray(begins, dtype=np.int64)
    e = np.asarray(ends, dtype=np.int64)
    p = np.asarray(poss, dtype=np.int64)
    payload = np.concatenate(
        [
            _segmented_delta(b, starts),
            (e - b).astype(np.uint64),
            _segmented_delta(p, starts),
        ]
    )
    return varint_encode(payload)


def decode_pos_block(
    buf: bytes, counts: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of ``encode_pos_block`` -> flat (begins, ends, poss)."""
    c = np.asarray(counts, dtype=np.int64)
    total = int(c.sum())
    if total == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    starts = np.concatenate(([0], np.cumsum(c)[:-1]))[c > 0]
    vals = varint_decode(buf, 3 * total)
    bd = vals[:total].astype(np.int64)
    w = vals[total : 2 * total].astype(np.int64)
    pdl = vals[2 * total :].astype(np.int64)
    begins = _undelta(bd, starts)
    poss = _undelta(pdl, starts)
    return begins, begins + w, poss


def _undelta(deltas: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-segment cumsum: plain cumsum, then subtract each segment's
    incoming prefix so every segment restarts at its stored base."""
    cs = np.cumsum(deltas, dtype=np.int64)
    flags = np.zeros(deltas.size, dtype=bool)
    flags[starts] = True
    seg_of = np.cumsum(flags) - 1
    prior = np.zeros(starts.size, dtype=np.int64)
    prior[1:] = cs[starts[1:] - 1]
    return cs - prior[seg_of]
