"""Codec round-trip tests (delta/varint/block encode, SURVEY E7)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from synspark.codec import (
    BLOCK_DOCS, decode_block, decode_positions, encode_blocks,
    encode_positions, varint_decode, varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert varint_decode(varint_encode(arr)).tolist() == values


def test_varint_known_bytes():
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@given(st.lists(st.lists(st.integers(0, 10_000), min_size=1, max_size=20),
                min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_positions_roundtrip(doclists):
    doclists = [sorted(d) for d in doclists]
    concat = np.array([p for d in doclists for p in d], dtype=np.int64)
    tfs = np.array([len(d) for d in doclists], dtype=np.int64)
    buf = encode_positions(concat, tfs)
    assert decode_positions(buf, tfs).tolist() == concat.tolist()


@pytest.mark.parametrize("n", [1, 2, BLOCK_DOCS - 1, BLOCK_DOCS,
                               BLOCK_DOCS + 1, 5 * BLOCK_DOCS + 17])
def test_block_roundtrip(n):
    rng = np.random.RandomState(7)
    docs = np.unique(rng.randint(0, 10 * n + 10, size=n).astype(np.int64))
    tfs = rng.randint(1, 50, size=len(docs)).astype(np.int64)
    blocks = encode_blocks(docs, tfs)
    got_docs, got_tfs = [], []
    for blk in blocks:
        d, t = decode_block(blk["first_doc"], blk["doc_bytes"],
                            blk["tf_bytes"], blk["n_docs"])
        got_docs.extend(d.tolist())
        got_tfs.extend(t.tolist())
        assert blk["last_doc"] == d[-1]
        assert blk["max_tf"] == t.max()
    assert got_docs == docs.tolist()
    assert got_tfs == tfs.tolist()


def test_empty():
    assert varint_encode(np.zeros(0, dtype=np.uint64)) == b""
    assert len(varint_decode(b"")) == 0
    assert encode_blocks(np.zeros(0, dtype=np.int64),
                         np.zeros(0, dtype=np.int64)) == []
