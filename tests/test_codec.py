"""Posting codec: delta+varint blocks, impact metadata, block addressing."""

import numpy as np
import pytest

from solr_ray.stages.codec import (
    BLOCK_SIZE,
    decode_posting,
    delta_decode,
    delta_encode,
    encode_posting,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**63], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_varint_empty():
    assert varint_encode(np.empty(0, np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_varint_count_check():
    buf = varint_encode(np.array([5, 6], dtype=np.uint64))
    with pytest.raises(ValueError):
        varint_decode(buf, 3)


def test_delta_requires_ascending():
    with pytest.raises(ValueError):
        delta_encode(np.array([3, 1], dtype=np.int64))


@pytest.mark.parametrize("n", [1, 127, 128, 129, 1000, 4096])
def test_posting_roundtrip(n):
    rng = np.random.default_rng(n)
    ids = np.sort(rng.choice(10**9, n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 200, n).astype(np.int64)
    dls = rng.integers(10, 5000, n).astype(np.int64)
    enc = encode_posting(ids, tfs, dls)
    out_ids, out_tfs = decode_posting(enc)
    assert np.array_equal(out_ids, ids)
    assert np.array_equal(out_tfs, tfs)
    nb = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(enc["block_last_doc"]) == nb
    assert enc["block_last_doc"][-1] == ids[-1]
    # per-block impact bounds are true bounds
    for b in range(nb):
        lo, hi = b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, n)
        assert enc["block_max_tf"][b] == tfs[lo:hi].max()
        assert enc["block_min_dl"][b] == dls[lo:hi].min()


def test_compression_ratio_dense():
    # dense doc_ids (small gaps) should cost ~1-2 bytes per posting
    ids = np.arange(0, 500_000, 3, dtype=np.int64)
    tfs = np.ones(ids.size, dtype=np.int64)
    enc = encode_posting(ids, tfs, tfs)
    assert len(enc["doc_ids_delta_varint"]) <= ids.size * 1.1


def test_delta_roundtrip():
    ids = np.array([5, 6, 100, 10**12], dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)
