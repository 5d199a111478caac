"""Posting-block codec round-trip tests (analog of the reference's
randomized byte-bridge round-trip, TestIndexOutputOutputStream.java:59-101).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cuvs_lucene_spark.codec import (
    decode_gaps,
    decode_u32,
    encode_gaps,
    encode_u32,
    pack_u64,
    unpack_u64,
)


@given(st.lists(st.integers(min_value=0, max_value=2**60), max_size=300))
@settings(max_examples=200, deadline=None)
def test_pack_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    got = unpack_u64(pack_u64(arr))
    np.testing.assert_array_equal(got, arr)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=256, unique=True)
)
@settings(max_examples=200, deadline=None)
def test_gap_roundtrip(doc_ids):
    arr = np.sort(np.array(doc_ids, dtype=np.uint64))
    buf = encode_gaps(arr)
    got = decode_gaps(buf, int(arr[0]))
    np.testing.assert_array_equal(got, arr)


def test_constant_block_width_zero():
    arr = np.full(128, 7, dtype=np.uint64)
    buf = pack_u64(arr)
    assert buf[0] == 0 and len(buf) == 13  # header only
    np.testing.assert_array_equal(unpack_u64(buf), arr)


def test_single_posting_block():
    # single-doc term → single block (reference corner case: 1-vector segment,
    # Lucene99AcceleratedHNSWVectorsWriter.java:520-578)
    buf = encode_gaps(np.array([42], dtype=np.uint64))
    np.testing.assert_array_equal(decode_gaps(buf, 42), [42])


@given(st.lists(st.integers(min_value=1, max_value=10_000), max_size=128))
@settings(max_examples=100, deadline=None)
def test_u32_roundtrip(tfs):
    arr = np.array(tfs, dtype=np.int64)
    np.testing.assert_array_equal(decode_u32(encode_u32(arr)), arr)


def test_compression_beats_raw():
    # 128 sorted doc ids with small gaps should take far less than 8B each
    rng = np.random.default_rng(0)
    ids = np.cumsum(rng.integers(1, 50, 128)).astype(np.uint64)
    assert len(encode_gaps(ids)) < 128 * 2
