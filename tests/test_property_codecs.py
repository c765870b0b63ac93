"""Property-based (hypothesis) tests for the storage codecs: any valid
input must round-trip bit-exactly through encode/decode. These are the
layers where a silent corruption poisons every query above them —
ForUtil/PForUtil (util/packing.py), the varint tail, and SmallFloat norms
(util/smallfloat.py; reference SmallFloat.java's intToByte4/byte4ToInt).

No Ray needed: pure numpy. Sizes cross the 128-int block boundary and the
uint8-offset PFor patch boundary (og >= 256), and gap values cross 2^32
(the round-3 64-bit doc-id gap widening)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.util.packing import (
    bit_width,
    decode_blocks,
    encode_blocks,
    pack_bits,
    unpack_bits,
    varint_decode_all,
    varint_encode_all,
)
from lucene_solr_ray.util.smallfloat import (
    byte4_to_int,
    byte4_to_int_vec,
    int_to_byte4,
    int_to_byte4_vec,
)

# value pools biased to codec edge cases: width boundaries, 2^32, 63-bit max
EDGE = [0, 1, 2, 127, 128, 255, 256, 65535, 65536,
        2**31 - 1, 2**31, 2**32 - 1, 2**32, 2**40, 2**62 - 1]
values_st = st.lists(
    st.one_of(st.sampled_from(EDGE), st.integers(0, 2**62 - 1)),
    min_size=0, max_size=700,
)


@settings(max_examples=60, deadline=None)
@given(values_st)
def test_for_blocks_roundtrip(vals):
    v = np.asarray(vals, dtype=np.uint64)
    enc = encode_blocks(v)
    out = decode_blocks(enc, len(v))
    np.testing.assert_array_equal(out.astype(np.uint64), v)


@settings(max_examples=60, deadline=None)
@given(values_st)
def test_varint_roundtrip(vals):
    v = np.asarray(vals, dtype=np.uint64)
    data, _ = varint_encode_all(v)
    out = varint_decode_all(np.asarray(data, dtype=np.uint8), len(v))
    np.testing.assert_array_equal(out.astype(np.uint64), v)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 2**62 - 1), min_size=1, max_size=300),
       st.integers(1, 63))
def test_pack_bits_roundtrip_masked(vals, width):
    # pack_bits stores the low `width` bits; decode must return exactly
    # the masked values for any width
    v = np.asarray(vals, dtype=np.uint64) & np.uint64((1 << width) - 1)
    out = unpack_bits(pack_bits(v, width), width, len(v))
    np.testing.assert_array_equal(out.astype(np.uint64), v)
    assert bit_width(v) <= 63


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_smallfloat_contract(n):
    b = int_to_byte4(n)
    back = byte4_to_int(b & 0xFF)
    # reference contract (SmallFloat.java): decoded value never exceeds the
    # input, re-encoding the decoded value is a fixed point, monotone
    assert back <= n
    assert int_to_byte4(back) == b
    if n <= 40:  # exact below the first mantissa boundary
        assert back == n


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=200))
def test_smallfloat_vec_matches_scalar(vals):
    v = np.asarray(vals, dtype=np.int64)
    enc = int_to_byte4_vec(v)
    assert [int(x) & 0xFF for x in enc] == [int_to_byte4(int(x)) & 0xFF
                                            for x in v]
    dec = byte4_to_int_vec(np.asarray([x & 0xFF for x in enc], np.uint8))
    assert [int(x) for x in dec] == [byte4_to_int(int(x) & 0xFF) for x in enc]
