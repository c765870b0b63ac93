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


def test_pfor_exception_patching_roundtrip():
    import numpy as np

    from lucene_solr_ray.util.packing import decode_blocks, encode_blocks

    rng = np.random.default_rng(9)
    # skewed data: mostly small gaps + a few huge outliers per block — the
    # PFor case (plain FOR would pay the outlier width for every value)
    v = rng.integers(0, 16, size=1000, dtype=np.uint32)
    v[rng.choice(1000, 25, replace=False)] = rng.integers(
        1 << 20, 1 << 30, size=25, dtype=np.uint32)
    enc = encode_blocks(v)
    assert np.array_equal(decode_blocks(enc, len(v)), v)
    # the patched encoding must beat pure FOR at the outlier width
    pure_for_cost = sum(
        2 + (len(v[i:i + 128]) * max(1, int(v[i:i + 128].max()).bit_length()) + 7) // 8
        for i in range(0, len(v), 128)
    )
    assert len(enc) < pure_for_cost

    # uniform data stays plain FOR (no regression)
    u = rng.integers(0, 1 << 12, size=256, dtype=np.uint32)
    assert np.array_equal(decode_blocks(encode_blocks(u), len(u)), u)
    # adversarial: every value is an outlier candidate
    w = rng.integers(1 << 28, 1 << 31, size=200, dtype=np.uint32)
    assert np.array_equal(decode_blocks(encode_blocks(w), len(w)), w)
    # zeros / singletons
    z = np.zeros(130, dtype=np.uint32)
    assert np.array_equal(decode_blocks(encode_blocks(z), len(z)), z)
    s = np.array([7], dtype=np.uint32)
    assert np.array_equal(decode_blocks(encode_blocks(s), 1), s)
