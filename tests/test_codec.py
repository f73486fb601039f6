"""Property tests for the posting-block codec (delta+varint round-trip)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_text_search_spark.functions.codec import (
    decode_doc_block,
    decode_tfs,
    encode_doc_block,
    encode_tfs,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    got = varint_decode(varint_encode(arr))
    assert got.tolist() == vals


@given(st.sets(st.integers(min_value=-2**62, max_value=2**62), min_size=1,
               max_size=200))
@settings(max_examples=200, deadline=None)
def test_doc_block_roundtrip(ids):
    d = np.array(sorted(ids), dtype=np.int64)
    first, last, buf = encode_doc_block(d)
    assert first == d[0] and last == d[-1]
    got = decode_doc_block(first, d.size, buf)
    np.testing.assert_array_equal(got, d)


@given(st.lists(st.integers(min_value=1, max_value=10_000), min_size=1,
                max_size=200))
@settings(max_examples=100, deadline=None)
def test_tfs_roundtrip(tfs):
    buf = encode_tfs(np.array(tfs))
    np.testing.assert_array_equal(decode_tfs(buf, len(tfs)), np.array(tfs))


def test_varint_compactness():
    # small deltas → ~1 byte each (the point of the codec)
    arr = np.arange(0, 1000, dtype=np.uint64)
    deltas = np.ones(999, dtype=np.uint64)
    assert len(varint_encode(deltas)) == 999
    assert len(varint_encode(arr)) < 2 * 1000
