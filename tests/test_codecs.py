"""Round-trip tests for the delta/varint/FOR posting codecs (SURVEY §5.5)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from inverted_index_spark.codecs import (
    decode_doc_ids,
    decode_positions,
    decode_tfs,
    delta_decode,
    delta_encode,
    encode_doc_ids,
    encode_positions,
    encode_tfs,
    varint_decode,
    varint_encode,
)


def test_varint_known_values():
    vals = np.array([0, 1, 127, 128, 300, 2**21, 2**63], dtype=np.uint64)
    buf = varint_encode(vals)
    # 0,1,127 -> 1 byte; 128,300 -> 2; 2^21 -> 4; 2^63 -> 10
    assert len(buf) == 3 * 1 + 2 * 2 + 4 + 10
    assert buf[:2] == b"\x00\x01"
    np.testing.assert_array_equal(varint_decode(buf, len(vals)), vals)


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_decode(b"", 0).size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    np.testing.assert_array_equal(varint_decode(varint_encode(arr), len(vals)), arr)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200, unique=True
    )
)
def test_doc_ids_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    np.testing.assert_array_equal(decode_doc_ids(encode_doc_ids(arr), len(ids)), arr)


def test_delta_roundtrip():
    arr = np.array([3, 4, 9, 9 + 2**33], dtype=np.uint64)
    np.testing.assert_array_equal(delta_decode(delta_encode(arr)), arr)


def test_tfs_roundtrip():
    tfs = np.array([1, 1, 7, 255, 100000], dtype=np.int32)
    np.testing.assert_array_equal(decode_tfs(encode_tfs(tfs), len(tfs)), tfs)


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=50), st.integers(min_value=0, max_value=9))
def test_positions_roundtrip(n, seed):
    rng = np.random.default_rng(seed)
    begins = np.sort(rng.integers(0, 10_000, size=n).astype(np.int64))
    widths = rng.integers(1, 40, size=n).astype(np.int64)
    poss = np.sort(rng.integers(0, 5_000, size=n).astype(np.int64))
    buf = encode_positions(begins, begins + widths, poss)
    b, e, p = decode_positions(buf)
    np.testing.assert_array_equal(b, begins)
    np.testing.assert_array_equal(e, begins + widths)
    np.testing.assert_array_equal(p, poss)


def test_compression_actually_compresses():
    # dense doc ids: gaps of ~2 -> ~1 byte each vs 8 raw
    ids = np.arange(0, 2_000_000, 2, dtype=np.int64)
    blob = encode_doc_ids(ids)
    assert len(blob) < ids.nbytes / 6


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=16), st.integers(min_value=0, max_value=9))
def test_pos_block_roundtrip(ndocs, seed):
    from inverted_index_spark.codecs import decode_pos_block, encode_pos_block

    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 8, size=ndocs).astype(np.int64)
    bs, es, ps = [], [], []
    for c in counts:
        b = np.sort(rng.integers(0, 1000, size=c).astype(np.int64))
        w = rng.integers(1, 15, size=c).astype(np.int64)
        p = np.sort(rng.integers(0, 200, size=c).astype(np.int64))
        bs.append(b)
        es.append(b + w)
        ps.append(p)
    B = np.concatenate(bs)
    E = np.concatenate(es)
    P = np.concatenate(ps)
    blob = encode_pos_block(counts, B, E, P)
    b2, e2, p2 = decode_pos_block(blob, counts)
    np.testing.assert_array_equal(B, b2)
    np.testing.assert_array_equal(E, e2)
    np.testing.assert_array_equal(P, p2)
