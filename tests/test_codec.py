"""Codec round-trip property tests (SURVEY §5b / FIXTURES F6)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from neosearch_spark.codec import (
    decode_postings,
    decode_tfs,
    encode_postings,
    encode_tfs,
    varint_encode_with_lengths,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_postings_roundtrip(ids):
    arr = np.unique(np.array(ids, dtype=np.int64))
    assert np.array_equal(arr, decode_postings(encode_postings(arr)))


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_tfs_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert np.array_equal(arr, decode_tfs(encode_tfs(arr)))


def test_empty():
    assert encode_postings(np.array([], dtype=np.int64)) == b""
    assert decode_postings(b"").size == 0


def test_varint_lengths():
    buf, lens = varint_encode_with_lengths(
        np.array([0, 1, 127, 128, 16383, 16384], dtype=np.uint64)
    )
    assert list(lens) == [1, 1, 1, 2, 2, 3]
    assert len(buf) == sum(lens)


def test_compression_beats_reference_fixed8():
    # the reference spends 8 bytes/docID (store/utils.go big-endian
    # uint64); delta+varint on a dense list must beat it comfortably
    ids = np.arange(0, 100_000, 7, dtype=np.int64)
    assert len(encode_postings(ids)) < ids.size * 2
