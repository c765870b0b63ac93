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


MAX_EXCEPTIONS = 7  # as in the reference (PForUtil.java:49 allows <= 7)
_PFOR_FLAG = 0x80


def _bit_lengths(v: np.ndarray) -> np.ndarray:
    """Per-value bit length (uint32, exact via the float64 exponent)."""
    out = np.zeros(len(v), dtype=np.int64)
    nz = v != 0
    if nz.any():
        out[nz] = np.frexp(v[nz].astype(np.float64))[1]
    return out


def encode_blocks(values: np.ndarray) -> bytes:
    """Encode values as a sequence of 128-value FOR/PFor blocks.

    Per-block layout:
      plain FOR:  [count:u8][width:u8][packed bytes]
      PFor:       [count:u8][0x80|width:u8][n_exc:u8][packed low bits]
                  [exc positions:u8 * n_exc][exc high bits as varints]
    The patched form (PForUtil.java:49-93 semantics) is chosen per block
    when pulling up to MAX_EXCEPTIONS outliers out of the packed width
    shrinks the block: each exception keeps its low `width` bits in place
    and patches the remainder back at decode.
    """
    values = np.asarray(values, dtype=np.uint32)
    out = bytearray()
    for start in range(0, len(values), BLOCK_SIZE):
        blk = values[start:start + BLOCK_SIZE]
        cnt = len(blk)
        bl = _bit_lengths(blk)
        order_desc = np.argsort(-bl, kind="stable")
        sorted_bl = bl[order_desc]
        best_cost = None
        best = None  # (w, exc_idx)
        for ne in range(0, min(MAX_EXCEPTIONS, cnt - 1) + 1):
            w = max(1, int(sorted_bl[ne]) if ne < cnt else 1)
            exc_idx = order_desc[:ne][bl[order_desc[:ne]] > w]
            n_exc = len(exc_idx)
            if ne > 0 and n_exc == 0:
                continue  # same as a smaller ne
            highs = (blk[exc_idx] >> w).astype(np.uint64)
            hi_bytes = int(sum(max(1, (int(h).bit_length() + 6) // 7) for h in highs))
            cost = 2 + (cnt * w + 7) // 8 + (1 + n_exc + hi_bytes if ne else 0)
            if best_cost is None or cost < best_cost:
                best_cost = cost
                best = (w, exc_idx)
        w, exc_idx = best
        out.append(cnt)
        if len(exc_idx):
            exc_idx = np.sort(exc_idx)
            low = blk & np.uint32((1 << w) - 1)
            out.append(_PFOR_FLAG | w)
            out.append(len(exc_idx))
            out += pack_bits(low, w)
            out += bytes(int(i) for i in exc_idx)
            hv, _ = varint_encode_all((blk[exc_idx] >> w).astype(np.uint64))
            out += hv.tobytes()
        else:
            out.append(w)
            out += pack_bits(blk, w)
    return bytes(out)


def decode_blocks(data: bytes, n: int) -> np.ndarray:
    """Decode n values written by encode_blocks (FOR and PFor blocks)."""
    out = np.empty(n, dtype=np.uint32)
    pos = 0
    got = 0
    mv = memoryview(data)
    while got < n:
        cnt = mv[pos]
        wbyte = mv[pos + 1]
        pos += 2
        w = wbyte & 0x7F
        if wbyte & _PFOR_FLAG:
            n_exc = mv[pos]
            pos += 1
            nbytes = (cnt * w + 7) // 8
            vals = unpack_bits(bytes(mv[pos:pos + nbytes]), w, cnt)
            pos += nbytes
            exc_pos = np.frombuffer(mv[pos:pos + n_exc], dtype=np.uint8)
            pos += n_exc
            # exceptions' high bits: n_exc varints follow
            hp = pos
            seen = 0
            while seen < n_exc:
                if mv[hp] < 0x80:
                    seen += 1
                hp += 1
            highs = varint_decode_all(
                np.frombuffer(mv[pos:hp], dtype=np.uint8), n_exc
            )
            pos = hp
            vals[exc_pos] |= (highs << np.uint64(w)).astype(np.uint32)
            out[got:got + cnt] = vals
        else:
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
