"""Varbyte/delta codec round-trip (FIXTURES.md F7 micro-fixtures)."""

import numpy as np

from snowball_java_ray.functions.codec import (
    decode_postings,
    decode_varbyte,
    encode_postings,
    encode_varbyte,
)


def test_varbyte_roundtrip_boundaries():
    vals = np.array(
        [0, 1, 2**7 - 1, 2**7, 2**14 - 1, 2**14, 2**28, 2**35, 2**63],
        dtype=np.uint64,
    )
    assert decode_varbyte(encode_varbyte(vals)).tolist() == vals.tolist()


def test_varbyte_empty():
    assert encode_varbyte(np.empty(0, dtype=np.uint64)) == b""
    assert decode_varbyte(b"").size == 0


def test_varbyte_random_roundtrip():
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 2**40, size=10_000, dtype=np.uint64)
    assert np.array_equal(decode_varbyte(encode_varbyte(vals)), vals)


def test_varbyte_compression_small_gaps():
    # gaps of 1 must take exactly 1 byte each
    vals = np.ones(1000, dtype=np.uint64)
    assert len(encode_varbyte(vals)) == 1000


def test_postings_roundtrip():
    doc_ids = np.array([3, 7, 8, 130, 16384, 16385], dtype=np.int64)
    tfs = np.array([1, 2, 1, 300, 1, 7], dtype=np.int32)
    dls = np.array([10, 20, 10, 300, 1, 7], dtype=np.int32)
    buf = encode_postings(doc_ids, tfs, dls, base=0)
    d, t, l = decode_postings(buf, base=0)
    assert d.tolist() == doc_ids.tolist()
    assert t.tolist() == tfs.tolist()
    assert l.tolist() == dls.tolist()


def test_postings_roundtrip_with_base():
    base = 1 << 20
    doc_ids = base + np.array([0, 5, 9], dtype=np.int64)
    tfs = np.array([4, 4, 4], dtype=np.int32)
    d, t, l = decode_postings(encode_postings(doc_ids, tfs, base=base), base=base)
    assert d.tolist() == doc_ids.tolist()
    assert t.tolist() == tfs.tolist()
    assert l is None  # dls optional


def test_postings_random_roundtrip():
    rng = np.random.default_rng(7)
    doc_ids = np.sort(rng.choice(1_000_000, size=5000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 1000, size=5000).astype(np.int32)
    dls = rng.integers(1, 500, size=5000).astype(np.int32)
    d, t, l = decode_postings(encode_postings(doc_ids, tfs, dls))
    assert np.array_equal(d, doc_ids) and np.array_equal(t, tfs)
    assert np.array_equal(l, dls)
