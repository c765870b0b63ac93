import numpy as np
import pytest

from lucene_solr_ray.util import packing as pk


@pytest.mark.parametrize("width", [1, 3, 7, 8, 13, 17, 24, 31, 32])
def test_pack_roundtrip(width):
    rng = np.random.default_rng(width)
    hi = (1 << width) - 1
    vals = rng.integers(0, hi + 1, size=128, dtype=np.uint64).astype(np.uint32)
    out = pk.unpack_bits(pk.pack_bits(vals, width), width, len(vals))
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("n", [1, 5, 127, 128, 129, 500, 1024 + 17])
def test_blocks_roundtrip(n):
    rng = np.random.default_rng(n)
    vals = rng.integers(0, 1 << 20, size=n, dtype=np.uint64).astype(np.uint32)
    data = pk.encode_blocks(vals)
    np.testing.assert_array_equal(pk.decode_blocks(data, n), vals)


def test_blocks_all_equal_and_zero():
    vals = np.zeros(200, dtype=np.uint32)
    np.testing.assert_array_equal(pk.decode_blocks(pk.encode_blocks(vals), 200), vals)
    vals = np.full(300, 7, dtype=np.uint32)
    np.testing.assert_array_equal(pk.decode_blocks(pk.encode_blocks(vals), 300), vals)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_varint_roundtrip(seed):
    rng = np.random.default_rng(seed)
    vals = np.concatenate(
        [
            rng.integers(0, 128, 100),
            rng.integers(0, 1 << 14, 100),
            rng.integers(0, 1 << 28, 100),
            rng.integers(0, 1 << 32, 100),
            [0, 127, 128, 16383, 16384, (1 << 32) - 1],
        ]
    ).astype(np.uint64)
    data, nbytes = pk.varint_encode_all(vals)
    assert int(nbytes.sum()) == len(data)
    out = pk.varint_decode_all(data, len(vals))
    np.testing.assert_array_equal(out, vals)


def test_varint_empty():
    data, nbytes = pk.varint_encode_all(np.array([], dtype=np.uint64))
    assert len(data) == 0
    assert len(pk.varint_decode_all(data, 0)) == 0
