"""Baseline JPEG (ITU-T T.81 sequential DCT) codec in pure numpy.

This removes the last codec stub: web-thumbnail JPEGs now decode for
real. The decoder is general baseline JPEG — it reads the quantization
and Huffman tables from the file (DQT/DHT), so it decodes both our own
output and Annex-K-table files from other encoders: 8-bit samples, 1 or
3 components, any h/v subsampling factors in {1,2} (4:4:4, 4:2:2,
4:2:0), byte stuffing, and DRI restart markers. Progressive (SOF2),
arithmetic coding, and 12-bit precision raise NotImplementedError — the
honest boundary for a curation pipeline whose inputs are overwhelmingly
baseline.

The encoder exists so tests and synthetic corpora can round-trip
deterministically without an image library. It emits spec-compliant
baseline JPEGs: standard Annex-K quantization tables scaled by quality
(the libjpeg convention), 4:4:4 or 4:2:0 sampling, and *simple
canonical Huffman tables* (every symbol at one fixed code length,
carried in DHT as the spec requires) — less compact than Annex K's
optimized tables but byte-for-byte decodable by any conformant decoder.

Block DCT/IDCT are single einsum contractions over all blocks at once;
only the entropy coder is a per-symbol Python loop (inherent to Huffman
bitstreams; fine for the thumbnail-scale images a curation pipeline
featurizes — full-page scans would want a C codec).

Reference parity target: the reference indexes binary payloads opaquely
(SURVEY §2 multimodal rows); decode fidelity is defined by T.81 itself.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order).
_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)


def _zigzag() -> np.ndarray:
    """Natural-order index for each zigzag position (T.81 Figure 5)."""
    out = []
    for s in range(15):
        rng = range(s + 1) if s % 2 == 1 else range(s, -1, -1)
        for i in rng:
            j = s - i
            if i < 8 and j < 8:
                out.append(i * 8 + j)
    return np.array(out, dtype=np.int64)


_ZZ = _zigzag()            # zigzag pos -> natural index
_UNZZ = np.argsort(_ZZ)    # natural index -> zigzag pos

# Orthonormal DCT-II basis: F = C @ f @ C.T, f = C.T @ F @ C.
_n = np.arange(8)
_C = np.cos((2 * _n[None, :] + 1) * _n[:, None] * np.pi / 16) / 2.0
_C[0] /= np.sqrt(2.0)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qy = np.clip((_QY * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255).astype(np.int32)
    return qy, qc


# --- simple canonical Huffman tables for the encoder -------------------------
# All symbols at one code length L (smallest L with n <= 2^L - 1 so the
# all-ones code stays unused, as T.81 C.2 requires). Canonical assignment
# makes code(i) = i, which keeps the encoder a table lookup.

def _flat_table(symbols: list[int]) -> tuple[dict, list[int], list[int]]:
    n = len(symbols)
    length = 1
    while (1 << length) - 1 < n:
        length += 1
    codes = {sym: (i, length) for i, sym in enumerate(symbols)}
    bits = [0] * 16
    bits[length - 1] = n
    return codes, bits, symbols


_DC_SYMS = list(range(12))                      # DC size categories 0..11
_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                           for s in range(1, 11)]  # EOB, ZRL, run/size
_DC_CODES, _DC_BITS, _DC_VALS = _flat_table(_DC_SYMS)
_AC_CODES, _AC_BITS, _AC_VALS = _flat_table(_AC_SYMS)


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:           # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, coefs: np.ndarray, pred: int) -> int:
    """Huffman-encode one zigzagged quantized block; returns the new DC
    predictor."""
    dc = int(coefs[0])
    diff = dc - pred
    size = _category(diff)
    code, ln = _DC_CODES[size]
    bw.write(code, ln)
    if size:
        bw.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(coefs)[0])) if np.any(coefs[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_CODES[0xF0]
            bw.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = _AC_CODES[(run << 4) | size]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, ln = _AC_CODES[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(H, W) float, H/W multiples of 8 -> (nby, nbx, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph, pw = (-h) % mh, (-w) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) gray -> baseline JPEG bytes.
    subsample=True uses 4:2:0 chroma (2x2-mean downsample); else 4:4:4.
    restart_interval>0 emits DRI + RSTn markers every that many MCUs."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[0], img.shape[1]
    qy, qc = _quality_tables(quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        f = img.astype(np.float64)
        y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        cb = 128.0 - 0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] \
            + 0.5 * f[:, :, 2]
        cr = 128.0 + 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] \
            - 0.081312 * f[:, :, 2]
        if subsample:
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2) \
                .mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2) \
                .mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # pad each plane so its block grid tiles whole MCUs
    padded = []
    for (sh, sv), p in zip(samp, planes):
        padded.append(_pad_to(p, 8 * sv, 8 * sh) - 128.0)
    # forward DCT + quantize each plane's blocks in one shot
    qtabs = [qy, qc]
    zz_planes = []
    for qi, p in zip(qsel, padded):
        blocks = _blockify(p)
        coefs = np.einsum("ab,nmbc,dc->nmad", _C, blocks, _C,
                          optimize=True)
        q = qtabs[qi].reshape(8, 8).astype(np.float64)
        quant = np.round(coefs / q).astype(np.int32)
        zz_planes.append(quant.reshape(*quant.shape[:2], 64)[:, :, _ZZ])

    # headers
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">HH", marker, len(payload) + 2) + payload)

    seg(0xFFDB, b"\x00" + qy[_ZZ].astype(np.uint8).tobytes())
    if not gray:
        seg(0xFFDB, b"\x01" + qc[_ZZ].astype(np.uint8).tobytes())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += struct.pack(">BBB", ci + 1,
                           (samp[ci][0] << 4) | samp[ci][1], qsel[ci])
    seg(0xFFC0, sof)
    seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if restart_interval:
        seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = struct.pack(">B", ncomp)
    for ci in range(ncomp):
        sos += struct.pack(">BB", ci + 1, 0x00)  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    seg(0xFFDA, sos)

    # entropy-coded scan, MCU interleaved
    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_rows = padded[0].shape[0] // (8 * vmax)
    mcu_cols = padded[0].shape[1] // (8 * hmax)
    mcu_i = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_i and \
                    mcu_i % restart_interval == 0:
                out.extend(bw.flush())
                out.extend(bytes([0xFF, 0xD0 + ((mcu_i // restart_interval
                                                 - 1) & 7)]))
                bw = _BitWriter()
                preds = [0] * ncomp
            mcu_i += 1
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        blk = zz_planes[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(bw, blk, preds[ci])
    out.extend(bw.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# --- decoder ------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over entropy-coded data with byte unstuffing
    and restart-marker awareness."""

    __slots__ = ("data", "pos", "acc", "nbits", "hit_marker")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.hit_marker = 0  # marker byte seen (0 = none)

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:       # stuffed 0xFF data byte
                self.pos += 2
            else:                  # a real marker terminates the segment
                self.hit_marker = nxt
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8
        return True

    def read(self, n: int) -> int:
        while self.nbits < n:
            if not self._fill():
                raise ValueError("JPEG entropy stream truncated")
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_restart(self) -> None:
        """Consume an expected RSTn marker and byte-align."""
        self.acc = 0
        self.nbits = 0
        if self.hit_marker:
            if not (0xD0 <= self.hit_marker <= 0xD7):
                raise ValueError(
                    f"expected restart marker, got 0xFF{self.hit_marker:02x}")
            self.pos += 2
            self.hit_marker = 0
            return
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF \
                and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("missing JPEG restart marker")


class _HuffTable:
    """Canonical Huffman decode table from DHT bits/vals: a dict keyed by
    (length, code) -> symbol. Per-symbol dict lookup keeps the decoder
    simple; the images a curation stage featurizes are thumbnails."""

    __slots__ = ("lut", "maxlen")

    def __init__(self, bits: bytes, vals: bytes) -> None:
        self.lut = {}
        code = 0
        vi = 0
        self.maxlen = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = vals[vi]
                vi += 1
                code += 1
                self.maxlen = length
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, self.maxlen + 1):
            code = (code << 1) | br.read(1)
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline JPEG -> (h, w, 3) uint8 RGB (or (h, w) for grayscale).
    Supports 8-bit baseline sequential (SOF0/SOF1), 1 or 3 components,
    sampling factors 1-2, DRI restarts. Progressive / arithmetic /
    12-bit raise NotImplementedError."""
    b = bytes(blob)
    if not b.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    n = len(b)
    while pos + 4 <= n:
        if b[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", b, pos + 2)
        payload = b[pos + 4:pos + 2 + length]
        seg_end = pos + 2 + length
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq == 0:
                    tab = np.frombuffer(payload, np.uint8, 64, p) \
                        .astype(np.int32)
                    p += 64
                else:
                    tab = np.frombuffer(payload, ">u2", 64, p) \
                        .astype(np.int32)
                    p += 128
                nat = np.empty(64, np.int32)
                nat[_ZZ] = tab
                qtabs[tq] = nat
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = payload[p + 1:p + 17]
                cnt = sum(bits)
                vals = payload[p + 17:p + 17 + cnt]
                huff[(tc, th)] = _HuffTable(bits, vals)
                p += 17 + cnt
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            prec, fh, fw, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG unsupported")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", payload, 6 + ci * 3)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02x})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = payload[0]
            sel = {}
            for si in range(ns):
                cs, tt = payload[1 + si * 2], payload[2 + si * 2]
                sel[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(b, seg_end, frame, sel, qtabs, huff,
                                restart_interval)
        pos = seg_end
    raise ValueError("JPEG without SOS scan")


def _decode_scan(b: bytes, pos: int, frame, sel, qtabs, huff,
                 restart_interval: int) -> np.ndarray:
    fh, fw, comps = frame
    if fh == 0 or fw == 0:
        raise ValueError("JPEG with zero dimension")
    for c in comps:
        if not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2):
            raise NotImplementedError(
                f"sampling factors {c['h']}x{c['v']} unsupported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_cols = -(-fw // (8 * hmax))
    mcu_rows = -(-fh // (8 * vmax))
    # per-component quantized-coefficient block grids
    grids = []
    for c in comps:
        nby = mcu_rows * c["v"]
        nbx = mcu_cols * c["h"]
        grids.append(np.zeros((nby, nbx, 64), dtype=np.int32))

    br = _BitReader(b, pos)
    preds = [0] * len(comps)
    mcu_i = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_i and \
                    mcu_i % restart_interval == 0:
                br.align_restart()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                tdc, tac = sel.get(c["id"], (0, 0))
                hdc = huff.get((0, tdc))
                hac = huff.get((1, tac))
                if hdc is None or hac is None:
                    raise ValueError("JPEG scan references missing DHT")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = grids[ci][my * c["v"] + by, mx * c["h"] + bx]
                        size = hdc.decode(br)
                        if size > 11:
                            raise ValueError("bad DC size category")
                        diff = _extend(br.read(size), size) if size else 0
                        preds[ci] += diff
                        blk[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = hac.decode(br)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0x0F
                            if k > 63 or size == 0:
                                raise ValueError("bad AC run/size")
                            blk[k] = _extend(br.read(size), size)
                            k += 1
            mcu_i += 1

    # dequantize + IDCT per component, all blocks at once
    planes = []
    for c, grid in zip(comps, grids):
        q = qtabs.get(c["tq"])
        if q is None:
            raise ValueError("JPEG scan references missing DQT")
        nat = grid[:, :, _UNZZ].astype(np.float64) * q.astype(np.float64)
        blocks = nat.reshape(*nat.shape[:2], 8, 8)
        pix = np.einsum("ba,nmbc,cd->nmad", _C, blocks, _C, optimize=True)
        plane = pix.transpose(0, 2, 1, 3).reshape(
            blocks.shape[0] * 8, blocks.shape[1] * 8) + 128.0
        # upsample to full resolution then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise NotImplementedError(
            f"{len(planes)}-component JPEG unsupported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, bl], axis=-1)), 0, 255) \
        .astype(np.uint8)
