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


def test_64bit_values_round_trip():
    """Web-scale doc ids: hashed 63-bit keys (or any corpus past 2^32 docs)
    produce delta gaps beyond uint32 — the codec must widen, not truncate."""
    import numpy as np

    from lucene_solr_ray.util.packing import (
        decode_blocks,
        encode_blocks,
        pack_bits,
        unpack_bits,
        varint_decode_all,
        varint_encode_all,
    )

    rng = np.random.default_rng(11)
    v = rng.integers(0, 2**63, 2000, dtype=np.uint64)
    v[:8] = [0, 127, 128, 2**28, 2**35 - 1, 2**35, 2**62, 2**63 - 1]
    b, _ = varint_encode_all(v)
    assert np.array_equal(varint_decode_all(b, len(v)), v)

    # FOR/PFor blocks with >32-bit widths, mixed-width exception shapes
    for arr in (
        rng.integers(0, 2**62, 513, dtype=np.uint64),
        np.where(rng.random(513) < 0.05,
                 rng.integers(0, 2**62, 513, dtype=np.uint64),
                 rng.integers(0, 64, 513, dtype=np.uint64)),
    ):
        assert np.array_equal(decode_blocks(encode_blocks(arr), len(arr)), arr)

    x = rng.integers(0, 2**50, 128, dtype=np.uint64)
    assert np.array_equal(unpack_bits(pack_bits(x, 50), 50, 128), x)


def test_32bit_layout_unchanged():
    """Widths <= 32 keep the exact legacy byte layout (existing indexes
    stay readable)."""
    import numpy as np

    from lucene_solr_ray.util.packing import pack_bits

    rng = np.random.default_rng(12)
    y = rng.integers(0, 2**20, 128, dtype=np.uint64)
    v4 = np.ascontiguousarray(y, dtype=">u4")
    bits = np.unpackbits(v4.view(np.uint8)).reshape(-1, 32)[:, 32 - 20:]
    assert pack_bits(y, 20) == np.packbits(bits.ravel()).tobytes()
