import numpy as np
import pytest

from lucene_solr_ray.util import smallfloat as sf


def test_free_values_exact():
    # values below NUM_FREE_VALUES round-trip exactly
    for i in range(sf.NUM_FREE_VALUES):
        assert sf.int_to_byte4(i) == i
        assert sf.byte4_to_int(i) == i


def test_known_reference_values():
    # reference semantics: longToInt4(Integer.MAX_VALUE) leaves 24 free values
    assert sf.NUM_FREE_VALUES == 24
    # monotone, rounds down, exact below 40 (BASELINE/Fixtures boundary)
    for i in range(0, 40):
        assert sf.byte4_to_int(sf.int_to_byte4(i)) == i
    assert sf.byte4_to_int(sf.int_to_byte4(40)) == 40
    # above exact range quantization rounds down
    for i in [41, 100, 1000, 10**6, 2**31 - 1]:
        q = sf.byte4_to_int(sf.int_to_byte4(i))
        assert q <= i
        # and is the largest representable <= i
        b = sf.int_to_byte4(i)
        if b < 255:
            assert sf.byte4_to_int(b + 1) > i


def test_monotone_table():
    t = sf.LENGTH_TABLE
    assert len(t) == 256
    assert np.all(np.diff(t) > 0)


@pytest.mark.parametrize("seed", [0, 1])
def test_vectorized_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    vals = np.concatenate(
        [
            np.arange(0, 300),
            rng.integers(0, 2**31 - 1, size=1000),
            [2**31 - 1],
        ]
    ).astype(np.int64)
    enc = sf.int_to_byte4_vec(vals)
    assert enc.dtype == np.uint8
    for v, e in zip(vals.tolist(), enc.tolist()):
        assert e == sf.int_to_byte4(v)
    dec = sf.byte4_to_int_vec(enc)
    for e, d in zip(enc.tolist(), dec.tolist()):
        assert d == sf.byte4_to_int(e)
