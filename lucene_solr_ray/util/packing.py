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

All functions accept uint64 values: blocks whose width fits 32 bits keep
the exact 32-bit byte layout (the common case — freqs, dense-id gaps);
wider blocks pack through a 64-bit path. This matters at web scale: with
hashed 63-bit document keys (or any corpus past 2^32 docs) the delta gaps
inside a posting list exceed uint32, and a 32-bit-only codec silently
truncates ids.
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
    """Pack values at `width` bits each into a byte string."""
    if width <= 32:
        v = np.ascontiguousarray(values, dtype=">u4")
        bits = np.unpackbits(v.view(np.uint8)).reshape(-1, 32)[:, 32 - width:]
    else:
        v = np.ascontiguousarray(values, dtype=">u8")
        bits = np.unpackbits(v.view(np.uint8)).reshape(-1, 64)[:, 64 - width:]
    return np.packbits(bits.ravel()).tobytes()


def unpack_bits(data: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of pack_bits: first n values of `width` bits -> uint64 array."""
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))[: n * width]
    bits = bits.reshape(n, width)
    if width <= 32:
        out = np.zeros((n, 32), dtype=np.uint8)
        out[:, 32 - width:] = bits
        return np.packbits(out.ravel()).view(">u4").astype(np.uint64)
    out = np.zeros((n, 64), dtype=np.uint8)
    out[:, 64 - width:] = bits
    return np.packbits(out.ravel()).view(">u8").astype(np.uint64)


MAX_EXCEPTIONS = 7  # as in the reference (PForUtil.java:49 allows <= 7)
_PFOR_FLAG = 0x80


def _bit_lengths(v: np.ndarray) -> np.ndarray:
    """Per-value bit length (uint32, exact via the float64 exponent)."""
    out = np.zeros(len(v), dtype=np.int64)
    nz = v != 0
    if nz.any():
        out[nz] = np.frexp(v[nz].astype(np.float64))[1]
    return out


def _pack_rows(rows: np.ndarray, w: int) -> np.ndarray:
    """Pack a (k, cnt) matrix at width w -> uint8 buffer whose per-row
    byte spans are contiguous (cnt*w divisible by 8 for cnt=128)."""
    if w <= 32:
        v = np.ascontiguousarray(rows, dtype=">u4")
        bits = np.unpackbits(v.view(np.uint8)).reshape(-1, 32)[:, 32 - w:]
    else:
        v = np.ascontiguousarray(rows, dtype=">u8")
        bits = np.unpackbits(v.view(np.uint8)).reshape(-1, 64)[:, 64 - w:]
    return np.packbits(bits.ravel())


def encode_blocks(values: np.ndarray, force_width: int | None = None) -> bytes:
    """Encode values as a sequence of 128-value FOR/PFor blocks.

    Per-block layout:
      plain FOR:  [count:u8][width:u8][packed bytes]
      PFor:       [count:u8][0x80|width:u8][n_exc:u8][packed low bits]
                  [exc positions:u8 * n_exc][exc high bits as varints]
    The patched form (PForUtil.java:49-93 semantics) is chosen per block
    when pulling up to MAX_EXCEPTIONS outliers out of the packed width
    shrinks the block. The width/exception choice AND the low-bit packing
    run vectorized across all full blocks at once (one numpy pass per
    distinct width); only the tiny per-block byte assembly is Python.

    force_width: emit every block as plain FOR at this fixed width — the
    DirectPostingsFormat trade (codecs/memory/DirectPostingsFormat.java:104):
    decode becomes a straight widen, space grows. Same wire format, so
    every decoder/merger works unchanged.
    """
    values = np.asarray(values, dtype=np.uint64)
    n = len(values)
    if n == 0:
        return b""
    nfull = n // BLOCK_SIZE
    out = bytearray()

    if force_width is not None:
        w = int(force_width)
        if nfull:
            M = values[: nfull * BLOCK_SIZE].reshape(nfull, BLOCK_SIZE)
            buf = _pack_rows(M, w)
            nb = (BLOCK_SIZE * w) // 8
            for r in range(nfull):
                out.append(BLOCK_SIZE)
                out.append(w)
                out += buf[r * nb:(r + 1) * nb].tobytes()
        tail = values[nfull * BLOCK_SIZE:]
        if len(tail):
            out.append(len(tail))
            out.append(w)
            out += pack_bits(tail, w)
        return bytes(out)

    if nfull:
        M = values[: nfull * BLOCK_SIZE].reshape(nfull, BLOCK_SIZE)
        BL = np.zeros(M.shape, dtype=np.int64)
        nz = M != 0
        if nz.any():
            # frexp may overestimate by 1 bit above 2^53 (rounding up across
            # a power of two) — harmless for packing; clamp to 64
            BL[nz] = np.minimum(np.frexp(M[nz].astype(np.float64))[1], 64)
        top_k = min(8, BLOCK_SIZE)
        BL8 = -np.sort(-BL, axis=1)[:, :top_k]
        w0 = np.maximum(BL8[:, 0], 1)
        best_cost = 2 + (BLOCK_SIZE * w0 + 7) // 8
        best_ne = np.zeros(nfull, dtype=np.int64)
        best_w = w0.copy()
        for ne in range(1, min(MAX_EXCEPTIONS, top_k - 1) + 1):
            w = np.maximum(BL8[:, ne], 1)
            exc_mask = BL8[:, :ne] > w[:, None]
            n_exc = exc_mask.sum(axis=1)
            hi_bits = np.maximum(BL8[:, :ne] - w[:, None], 0)
            hib = np.where(exc_mask, np.maximum((hi_bits + 6) // 7, 1), 0).sum(axis=1)
            cost = 2 + (BLOCK_SIZE * w + 7) // 8 + np.where(
                n_exc > 0, 1 + n_exc + hib, (BLOCK_SIZE * (w0 - w)) * 0)
            better = (n_exc > 0) & (cost < best_cost)
            best_cost = np.where(better, cost, best_cost)
            best_w = np.where(better, w, best_w)
            best_ne = np.where(better, n_exc, best_ne)
        # batched low-bit packing per distinct width (masking is a no-op for
        # plain-FOR blocks: their values already fit the width)
        low_bufs: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        nbytes_of = {}
        for w in np.unique(best_w).tolist():
            rows = np.flatnonzero(best_w == w)
            masked = M[rows] & np.uint64((1 << w) - 1)
            buf = _pack_rows(masked, w)
            row_pos = {int(r): i for i, r in enumerate(rows)}
            low_bufs[w] = (buf, row_pos)
            nbytes_of[w] = (BLOCK_SIZE * w) // 8
        # exception highs: gather all, varint-encode once, slice per block
        pfor_rows = np.flatnonzero(best_ne > 0)
        exc_idx_per, highs_all, highs_cnt = [], [], []
        for r in pfor_rows.tolist():
            w = int(best_w[r])
            ei = np.flatnonzero(BL[r] > w)
            exc_idx_per.append(ei)
            highs_all.append(M[r, ei] >> np.uint64(w))
            highs_cnt.append(len(ei))
        if pfor_rows.size:
            hv, hlens = varint_encode_all(
                np.concatenate(highs_all).astype(np.uint64))
            hb = hv.tobytes()
            h_ends = np.cumsum(hlens)
            blk_end = np.cumsum(highs_cnt)
            blk_byte_end = h_ends[blk_end - 1]
            blk_byte_start = np.concatenate([[0], blk_byte_end[:-1]])
            pfor_pos = {int(r): i for i, r in enumerate(pfor_rows.tolist())}
        for r in range(nfull):
            w = int(best_w[r])
            buf, row_pos = low_bufs[w]
            nb = nbytes_of[w]
            i = row_pos[r]
            low = buf[i * nb:(i + 1) * nb].tobytes()
            out.append(BLOCK_SIZE)
            if best_ne[r] > 0:
                j = pfor_pos[r]
                ei = exc_idx_per[j]
                out.append(_PFOR_FLAG | w)
                out.append(len(ei))
                out += low
                out += bytes(int(x) for x in ei)
                out += hb[blk_byte_start[j]:blk_byte_end[j]]
            else:
                out.append(w)
                out += low

    # --- tail block (< 128 values): plain FOR (the PFor saving is marginal)
    tail = values[nfull * BLOCK_SIZE:]
    if len(tail):
        w = bit_width(tail)
        out.append(len(tail))
        out.append(w)
        out += pack_bits(tail, w)
    return bytes(out)


def block_spans(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Walk encode_blocks headers WITHOUT unpacking: per-block byte offsets
    (header position) plus a final sentinel = len(data), and per-block value
    counts. This is the single-level skip structure's byte map — it lets a
    caller decode an arbitrary block range via
    decode_blocks(data[offsets[b0]:offsets[b1]], counts[b0:b1].sum())
    without touching the other blocks' bytes (Lucene84SkipWriter.java:51
    role: jump to a block by file pointer)."""
    mv = memoryview(data)
    offsets = []
    counts = []
    pos = 0
    end = len(data)
    while pos < end:
        offsets.append(pos)
        cnt = mv[pos]
        wbyte = mv[pos + 1]
        pos += 2
        w = wbyte & 0x7F
        if wbyte & _PFOR_FLAG:
            n_exc = mv[pos]
            pos += 1
            pos += (cnt * w + 7) // 8
            pos += n_exc  # exception positions
            seen = 0
            while seen < n_exc:  # exception-high varints
                if mv[pos] < 0x80:
                    seen += 1
                pos += 1
        else:
            pos += (cnt * w + 7) // 8
        counts.append(cnt)
    offsets.append(end)
    return (np.asarray(offsets, dtype=np.int64),
            np.asarray(counts, dtype=np.int64))


def decode_blocks(data: bytes, n: int) -> np.ndarray:
    """Decode n values written by encode_blocks (FOR and PFor blocks).

    Decoding is batched BY (width, count): one header pass collects every
    block's (offset, out position) plus any PFor patch info, then all blocks
    sharing a width unpack in a single vectorized pass (one unpackbits + one
    weighted sum for the whole group) — a long posting list costs a handful
    of numpy calls, not one per 128-doc block. Patches apply afterwards."""
    out = np.empty(n, dtype=np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8)
    mv = memoryview(data)
    groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
    patches: list[tuple[int, int, np.ndarray, np.ndarray]] = []
    pos = 0
    got = 0
    while got < n:
        cnt = mv[pos]
        wbyte = mv[pos + 1]
        pos += 2
        w = wbyte & 0x7F
        is_pfor = bool(wbyte & _PFOR_FLAG)
        if is_pfor:
            n_exc = mv[pos]
            pos += 1
        nbytes = (cnt * w + 7) // 8
        groups.setdefault((w, cnt), []).append((pos, got))
        pos += nbytes
        if is_pfor:
            exc_start = pos
            pos += n_exc
            # walk the n_exc varints (<=35 bytes: a python byte loop beats
            # a numpy call's fixed overhead here)
            hp = pos
            seen = 0
            while seen < n_exc:
                if mv[hp] < 0x80:
                    seen += 1
                hp += 1
            patches.append((got, w, exc_start, pos, hp, n_exc))
            pos = hp
        got += cnt
    for (w, cnt), blocks in groups.items():
        nbytes = (cnt * w + 7) // 8
        if len(blocks) == 1:
            o, og = blocks[0]
            out[og:og + cnt] = unpack_bits(bytes(mv[o:o + nbytes]), w, cnt)
            continue
        offs = np.asarray([o for o, _ in blocks], dtype=np.int64)
        gather = buf[offs[:, None] + np.arange(nbytes)[None, :]]
        bits = np.unpackbits(gather, axis=1)[:, : cnt * w].reshape(-1, w)
        if w <= 32:
            padded = np.zeros((bits.shape[0], 32), dtype=np.uint8)
            padded[:, 32 - w:] = bits
            vals = np.packbits(padded.ravel()).view(">u4").astype(np.uint64)
        else:
            padded = np.zeros((bits.shape[0], 64), dtype=np.uint8)
            padded[:, 64 - w:] = bits
            vals = np.packbits(padded.ravel()).view(">u8").astype(np.uint64)
        outs = np.asarray([og for _, og in blocks], dtype=np.int64)
        idx = (outs[:, None] + np.arange(cnt)[None, :]).ravel()
        out[idx] = vals
    if patches:
        # decode every block's exception varints in ONE pass
        hb = np.concatenate([buf[a:b] for _, _, _, a, b, _ in patches])
        counts = np.asarray([ne for *_, ne in patches], dtype=np.int64)
        all_highs = varint_decode_all(hb, int(counts.sum()))
        ends = np.cumsum(counts)
        starts = ends - counts
        for i, (og, w, es, _, _, ne) in enumerate(patches):
            exc_pos = buf[es:es + ne]
            highs = all_highs[starts[i]:ends[i]]
            # exc_pos is uint8; the explicit int64 index keeps og + pos from
            # overflowing under numpy>=2 NEP-50 promotion once og >= 256
            out[og + exc_pos.astype(np.int64)] |= highs << np.uint64(w)
    return out


# ---------------------------------------------------------------------------
# Vectorized varint (LEB128-style, low 7 bits first, high bit = continuation)
# ---------------------------------------------------------------------------

def varint_encode_all(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode many uint64 values as varints in one vectorized pass
    (up to 10 bytes per value; values < 2^28 cost the same passes as a
    32-bit-only encoder since the byte loop exits when nothing is alive).

    Returns (bytes_array uint8, byte_lengths int64 per value). Callers slice
    the concatenated byte stream per logical record via cumsum(byte_lengths).
    """
    v = np.asarray(values, dtype=np.uint64)
    nbytes = np.ones(len(v), dtype=np.int64)
    for s in range(7, 64, 7):
        nbytes += (v >= np.uint64(1 << s)).astype(np.int64)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    rem = v.copy()
    # byte i of each varint, vectorized over all values still needing bytes
    for i in range(10):
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
