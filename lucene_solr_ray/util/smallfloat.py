"""Lucene SmallFloat norm quantization, reimplemented from its public semantics.

BM25 quantizes the per-document field length (token count) into one byte via
``intToByte4`` and decodes it through a 256-entry table at score time
(reference semantics: lucene/core/.../util/SmallFloat.java:101-169 and
search/similarities/BM25Similarity.java:106-126). Scores therefore see the
*quantized* length; replicating this mapping exactly is required for
rank-identical BM25.

Encoding: values below NUM_FREE_VALUES (= 255 - longToInt4(2^31-1) = 24 + ...)
are stored exactly; larger values keep 4 significant bits (a float-like code
with a 4-bit mantissa), monotone and rounded down.
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: int) -> int:
    """Order-preserving 4-significant-bit code for non-negative ints."""
    if i < 0:
        raise ValueError("only positive values supported")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    encoded |= (shift + 1) << 3
    return encoded


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - _MAX_INT4


def int_to_byte4(i: int) -> int:
    """Quantize a non-negative int (doc length) to an unsigned byte 0..255."""
    if i < 0:
        raise ValueError("only positive values supported")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte 0..255 back to the quantized length."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + int4_to_long(b - NUM_FREE_VALUES)


# 256-entry decode table (LENGTH_TABLE in the reference's BM25 similarity).
LENGTH_TABLE: np.ndarray = np.array(
    [byte4_to_int(b) for b in range(256)], dtype=np.float32
)

# Sorted boundaries for vectorized encode: the encoder is monotone and rounds
# down, so encode(x) == index of the greatest boundary <= x.
_BOUNDARIES: np.ndarray = np.array(
    [byte4_to_int(b) for b in range(256)], dtype=np.int64
)


def int_to_byte4_vec(lengths: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over an int array -> uint8 array."""
    idx = np.searchsorted(_BOUNDARIES, np.asarray(lengths, dtype=np.int64), side="right") - 1
    return idx.astype(np.uint8)


def byte4_to_int_vec(norms: np.ndarray) -> np.ndarray:
    """Vectorized decode: uint8 norms -> quantized lengths (int64)."""
    return _BOUNDARIES[np.asarray(norms, dtype=np.int64)]
