"""Vectorized integer compression kernels for posting lists.

Two codecs, both pure numpy (the Python stand-in for the reference's
generated SIMD bit-packing — semantics from codecs/lucene84/ForUtil.java /
ForDeltaUtil.java and the VInt tail encoding of Lucene84PostingsWriter):

* FOR ("frame of reference") bit-packing of fixed 128-int blocks at the
  block's exact bit width — used for the doc-delta and freq blocks of long
  posting lists (df >= BLOCK_SIZE).
* group varint ("VInt") byte encoding — used for the short/tail postings
  (df < BLOCK_SIZE), vectorized across *many* values at once so encoding a
  million short terms needs no per-term Python loop.

All functions operate on uint32-representable non-negative ints.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # postings block length, as in the reference (128 ints)


# ---------------------------------------------------------------------------
# FOR bit-packing (width-w packing of n values, big-endian bit order)
# ---------------------------------------------------------------------------

def bit_width(values: np.ndarray) -> int:
    """Bits needed for the max value (min 1 so empty/zero blocks are valid)."""
    m = int(values.max()) if len(values) else 0
    return max(1, m.bit_length())


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack uint32 values at `width` bits each into a byte string."""
    v = np.ascontiguousarray(values, dtype=">u4")
    bits = np.unpackbits(v.view(np.uint8)).reshape(-1, 32)[:, 32 - width:]
    return np.packbits(bits.ravel()).tobytes()


def unpack_bits(data: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of pack_bits: first n values of `width` bits -> uint32 array."""
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))[: n * width]
    bits = bits.reshape(n, width)
    out = np.zeros((n, 32), dtype=np.uint8)
    out[:, 32 - width:] = bits
    return np.packbits(out.ravel()).view(">u4").astype(np.uint32)


def encode_blocks(values: np.ndarray) -> bytes:
    """Encode values as a sequence of 128-value FOR blocks.

    Layout per block: [count:u8==128 or tail count][width:u8][packed bytes].
    The tail block (len < 128) is packed at its own width (no zero padding
    on disk beyond bit alignment).
    """
    values = np.asarray(values, dtype=np.uint32)
    out = bytearray()
    for start in range(0, len(values), BLOCK_SIZE):
        blk = values[start:start + BLOCK_SIZE]
        w = bit_width(blk)
        out.append(len(blk))
        out.append(w)
        out += pack_bits(blk, w)
    return bytes(out)


def decode_blocks(data: bytes, n: int) -> np.ndarray:
    """Decode n values written by encode_blocks."""
    out = np.empty(n, dtype=np.uint32)
    pos = 0
    got = 0
    mv = memoryview(data)
    while got < n:
        cnt = mv[pos]
        w = mv[pos + 1]
        pos += 2
        nbytes = (cnt * w + 7) // 8
        out[got:got + cnt] = unpack_bits(bytes(mv[pos:pos + nbytes]), w, cnt)
        pos += nbytes
        got += cnt
    return out


# ---------------------------------------------------------------------------
# Vectorized varint (LEB128-style, low 7 bits first, high bit = continuation)
# ---------------------------------------------------------------------------

def varint_encode_all(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode many uint32 values as varints in one vectorized pass.

    Returns (bytes_array uint8, byte_lengths int64 per value). Callers slice
    the concatenated byte stream per logical record via cumsum(byte_lengths).
    """
    v = np.asarray(values, dtype=np.uint64)
    nbytes = np.ones(len(v), dtype=np.int64)
    for k in (1 << 7, 1 << 14, 1 << 21, 1 << 28):
        nbytes += (v >= k).astype(np.int64)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    rem = v.copy()
    # byte i of each varint, vectorized over all values still needing bytes
    for i in range(5):
        alive = nbytes > i
        if not alive.any():
            break
        idx = starts[alive] + i
        more = nbytes[alive] > (i + 1)
        out[idx] = (rem[alive] & 0x7F) | (more.astype(np.uint64) << 7)
        rem[alive] >>= 7
    return out, nbytes


def varint_decode_all(data: np.ndarray, n: int) -> np.ndarray:
    """Decode the first n varints from a uint8 array (vectorized).

    Returns uint64 values. `data` must contain exactly n varints.
    """
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    b = np.asarray(data, dtype=np.uint8)
    is_end = b < 0x80
    ends = np.flatnonzero(is_end)[:n]
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    out = np.zeros(n, dtype=np.uint64)
    lengths = ends - starts + 1
    for i in range(int(lengths.max()) if n else 0):
        alive = lengths > i
        out[alive] |= (b[starts[alive] + i].astype(np.uint64) & 0x7F) << (7 * i)
    return out
