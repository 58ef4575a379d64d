"""Varbyte + posting-block codec tests.

Known vectors hand-derived from the reference's varbyte spec
(IndexerInvertedCompressed.java:704-725): big-endian 7-bit groups,
0x80 flag on the LAST byte."""

import numpy as np
from hypothesis import given, settings, strategies as st

from websearchengine_spark.functions.codec import (
    decode_posting_blocks,
    encode_posting_blocks,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_known_vectors():
    # hand-derived from the spec: value < 128 -> single byte with 0x80 set
    assert varbyte_encode(np.array([0])) == bytes([0x80])
    assert varbyte_encode(np.array([1])) == bytes([0x81])
    assert varbyte_encode(np.array([127])) == bytes([0xFF])
    # 128 = 0b1_0000000 -> groups [1, 0]; terminator on last
    assert varbyte_encode(np.array([128])) == bytes([0x01, 0x80])
    # 16383 = 0b1111111_1111111 -> [0x7F, 0xFF]
    assert varbyte_encode(np.array([16383])) == bytes([0x7F, 0xFF])
    # 16384 -> 3 bytes [1, 0, 0x80]
    assert varbyte_encode(np.array([16384])) == bytes([0x01, 0x00, 0x80])
    # concatenation of values
    assert varbyte_encode(np.array([1, 128])) == bytes([0x81, 0x01, 0x80])


def test_varbyte_decode_known_vectors():
    assert varbyte_decode(bytes([0x81, 0x01, 0x80, 0xFF])).tolist() == [1, 128, 127]


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.int64)) == b""
    assert varbyte_decode(b"").tolist() == []


def test_varbyte_large_values():
    vals = np.array([2**40, 2**62, 10**12, 0, 1])
    assert varbyte_decode(varbyte_encode(vals)).tolist() == vals.tolist()


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), max_size=200)
)
@settings(max_examples=200)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.int64)
    assert varbyte_decode(varbyte_encode(arr)).tolist() == values


@st.composite
def posting_list(draw):
    m = draw(st.integers(min_value=1, max_value=300))
    gaps = draw(st.lists(st.integers(1, 10**6), min_size=m, max_size=m))
    doc_ids = np.cumsum(np.array(gaps, dtype=np.int64))
    tfs = np.array(draw(st.lists(st.integers(1, 8), min_size=m, max_size=m)), dtype=np.int64)
    dls = tfs + np.array(
        draw(st.lists(st.integers(0, 500), min_size=m, max_size=m)), dtype=np.int64
    )
    positions = []
    for tf in tfs:
        pgaps = draw(st.lists(st.integers(1, 50), min_size=int(tf), max_size=int(tf)))
        positions.extend(np.cumsum(pgaps) - 1)
    return doc_ids, tfs, dls, np.array(positions, dtype=np.int64)


@given(posting_list())
@settings(max_examples=50, deadline=None)
def test_posting_blocks_roundtrip(pl):
    from websearchengine_spark.functions.codec import bm25_impact

    doc_ids, tfs, dls, positions = pl
    avg_dl = float(dls.mean())
    blocks = encode_posting_blocks(doc_ids, tfs, dls, positions, avg_dl, block_size=64)
    d, t, dl, p = decode_posting_blocks(blocks, want_doclens=True)
    assert d.tolist() == doc_ids.tolist()
    assert t.tolist() == tfs.tolist()
    assert dl.tolist() == dls.tolist()
    assert p.tolist() == positions.tolist()
    # block metadata is correct
    assert blocks[0][0] == doc_ids[0]
    assert blocks[-1][1] == doc_ids[-1]
    assert sum(b[2] for b in blocks) == len(doc_ids)
    assert max(b[3] for b in blocks) == tfs.max()
    # max_impact is a true upper bound per block
    impacts = bm25_impact(tfs.astype(float), dls.astype(float), avg_dl)
    off = 0
    for b in blocks:
        assert b[4] >= impacts[off : off + b[2]].max() - 1e-12
        off += b[2]


def test_posting_blocks_skip_decode_positions():
    doc_ids = np.array([3, 10, 11])
    tfs = np.array([2, 1, 3])
    dls = np.array([7, 3, 9])
    positions = np.array([0, 5, 2, 1, 4, 9])
    blocks = encode_posting_blocks(doc_ids, tfs, dls, positions, avg_dl=6.0)
    d, t, dl, p = decode_posting_blocks(blocks, want_positions=False)
    assert p is None
    assert dl is None
    assert d.tolist() == [3, 10, 11]
    assert t.tolist() == [2, 1, 3]
