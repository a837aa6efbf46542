import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_assets_ray.index.codec import (
    decode_block,
    decode_postings,
    decode_varint,
    encode_postings,
    encode_varint,
    merge_encoded_parts,
    read_meta,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200)
)
@settings(max_examples=60, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(arr)), arr)


@pytest.mark.parametrize("n", [0, 1, 127, 128, 129, 1000])
@pytest.mark.parametrize("block_size", [16, 128])
@pytest.mark.parametrize("codec", ["varint", "for"])
def test_postings_roundtrip(n, block_size, codec):
    rng = np.random.default_rng(n + block_size)
    ids = np.sort(rng.choice(10**7, size=n, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 300, n).astype(np.uint64)
    blob = encode_postings(ids, tfs, block_size, codec=codec)
    d, t = decode_postings(blob)
    assert np.array_equal(d, ids)
    assert np.array_equal(t, tfs)


@given(
    st.sets(st.integers(min_value=0, max_value=2**40), max_size=300),
    st.sampled_from(["varint", "for"]),
)
@settings(max_examples=40, deadline=None)
def test_postings_roundtrip_property(id_set, codec):
    ids = np.array(sorted(id_set), dtype=np.uint64)
    tfs = (ids % np.uint64(97) + np.uint64(1)).astype(np.uint64)
    if len(ids) == 0:
        return
    blob = encode_postings(ids, tfs, 32, codec=codec)
    d, t = decode_postings(blob)
    assert np.array_equal(d, ids) and np.array_equal(t, tfs)
    meta = read_meta(blob)
    assert meta.codec == codec
    for i in range(meta.n_blocks):
        bd, bt = decode_block(meta, i)
        lo = int(meta.block_doc_off[i])
        assert np.array_equal(bd, ids[lo : lo + len(bd)])
        assert np.array_equal(bt, tfs[lo : lo + len(bt)])


def test_block_decode_independent():
    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(10**6, size=500, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 9, 500).astype(np.uint64)
    meta = read_meta(encode_postings(ids, tfs, 64))
    off = 0
    for i in range(meta.n_blocks):
        bd, bt = decode_block(meta, i)
        assert np.array_equal(bd, ids[off : off + len(bd)])
        assert np.array_equal(bt, tfs[off : off + len(bt)])
        assert int(meta.block_max_tf[i]) == int(bt.max())
        assert int(meta.block_last_doc[i]) == int(bd[-1])
        off += len(bd)
    assert off == 500


def test_merge_parts_out_of_order_and_counts():
    rng = np.random.default_rng(3)
    ids = np.sort(rng.choice(10**6, size=900, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 50, 900).astype(np.uint64)
    parts = [
        encode_postings(ids[300:600], tfs[300:600]),
        encode_postings(ids[:300], tfs[:300]),
        encode_postings(ids[600:], tfs[600:]),
    ]
    d, t = decode_postings(merge_encoded_parts(parts))
    assert np.array_equal(d, ids)
    assert np.array_equal(t, tfs)


def test_merge_rejects_duplicate_docids():
    ids = np.array([1, 2, 3], dtype=np.uint64)
    tfs = np.ones(3, dtype=np.uint64)
    with pytest.raises(ValueError):
        merge_encoded_parts([encode_postings(ids, tfs), encode_postings(ids, tfs)])
