"""Real pure-numpy image codecs.

This container has no image libraries; everything that stdlib + numpy can
decode, decodes for real: binary PPM (P6), 24-bit uncompressed BMP,
non-interlaced 8-bit gray/RGB/RGBA PNG (zlib inflate + RFC 2083 row
unfiltering), GIF87a/89a first frames (pure-Python LZW, interlace,
local/global palettes), uncompressed baseline TIFF, and baseline
sequential JPEG (pure-numpy T.81 Huffman + IDCT in jpeg.py — no codec
stubs remain for the web formats).
encode_* exist so tests and synthetic corpora can round-trip
deterministically.

All decoders return (h, w, 3) uint8 RGB arrays; all kernels are
vectorized numpy (one reshape/stride pass per image, no per-pixel
Python)."""

from __future__ import annotations

import struct

import numpy as np

_PPM_MAGIC = b"P6"
_BMP_MAGIC = b"BM"
_JPEG_MAGIC = b"\xff\xd8\xff"
_PNG_MAGIC = b"\x89PNG"
_GIF_MAGIC = b"GIF8"
_TIFF_MAGICS = (b"II*\x00", b"MM\x00*")


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6, maxval 255)."""
    h, w, c = img.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8).tobytes()


def decode_ppm(blob: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8. Handles comments and arbitrary
    whitespace in the header per the netpbm spec."""
    if not blob.startswith(_PPM_MAGIC):
        raise ValueError("not a P6 PPM")
    pos = 2
    vals: list[int] = []
    n = len(blob)
    while len(vals) < 3:
        while pos < n and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":  # comment to end of line
            while pos < n and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not blob[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = h * w * 3
    data = np.frombuffer(blob, dtype=np.uint8, count=need, offset=pos)
    return data.reshape(h, w, 3)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding, BGR byte order)."""
    h, w, c = img.shape
    assert c == 3
    row = w * 3
    pad = (-row) % 4
    bgr = np.ascontiguousarray(img[::-1, :, ::-1], dtype=np.uint8)
    if pad:
        padded = np.zeros((h, row + pad), dtype=np.uint8)
        padded[:, :row] = bgr.reshape(h, row)
        body = padded.tobytes()
    else:
        body = bgr.tobytes()
    size = 14 + 40 + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return header + dib + body


def decode_bmp(blob: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB. Top-down (negative
    height) and bottom-up layouts both supported."""
    if not blob.startswith(_BMP_MAGIC):
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    w, h_raw = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    compression = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h_raw < 0
    h = abs(h_raw)
    row = w * 3
    stride = row + ((-row) % 4)
    rows = np.frombuffer(blob, dtype=np.uint8, count=h * stride,
                         offset=data_offset).reshape(h, stride)[:, :row]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img if top_down else img[::-1]


def sniff_and_decode(blob: bytes) -> np.ndarray:
    """Magic-byte dispatch. PPM/BMP/PNG/GIF/TIFF/baseline-JPEG all decode
    natively (PNG via stdlib zlib, GIF via pure-Python LZW, JPEG via the
    pure-numpy T.81 baseline decoder in jpeg.py); unknown bytes raise
    ValueError, unsupported sub-formats (progressive JPEG, LZW TIFF, ...)
    raise NotImplementedError."""
    b = blob or b""
    if b.startswith(_PPM_MAGIC):
        return decode_ppm(b)
    if b.startswith(_BMP_MAGIC):
        return decode_bmp(b)
    if b.startswith(_PNG_MAGIC):
        return decode_png(b)
    if b.startswith(_GIF_MAGIC):
        return decode_gif(b)
    if b[:4] in _TIFF_MAGICS:
        return decode_tiff(b)
    if b.startswith(_JPEG_MAGIC):
        from lucene_solr_ray.multimodal.jpeg import decode_jpeg
        img = decode_jpeg(b)
        if img.ndim == 2:  # grayscale JPEG -> RGB for a uniform contract
            img = np.repeat(img[:, :, None], 3, axis=2)
        return img
    raise ValueError("unrecognized image format")


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize as two numpy index gathers."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ri][:, ci]


def image_stats(img: np.ndarray, with_hist: bool = True) -> dict:
    """Per-image features: dims, per-channel means, and (with_hist) a
    4-bucket luminance histogram (fractions). One vectorized pass; skip
    the histogram when the caller only consumes dims/means — the luminance
    plane is ~2x the per-pixel arithmetic."""
    f = img.astype(np.float64)
    out = {
        "height": img.shape[0], "width": img.shape[1],
        "mean_r": float(f[:, :, 0].mean()),
        "mean_g": float(f[:, :, 1].mean()),
        "mean_b": float(f[:, :, 2].mean()),
    }
    if with_hist:
        lum = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        hist = np.histogram(lum, bins=4, range=(0.0, 256.0))[0]
        npx = img.shape[0] * img.shape[1]
        out["lum_hist"] = (hist / max(npx, 1)).astype(np.float32)
    return out


# --- PNG (stdlib zlib — no external image library needed) ------------------

def encode_png(img: np.ndarray) -> bytes:
    """Minimal non-interlaced 8-bit PNG encoder (filter 0 rows): gray (2-D),
    RGB (H,W,3) or RGBA (H,W,4)."""
    import struct
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color = 0
    elif img.shape[2] == 3:
        color = 2
    elif img.shape[2] == 4:
        color = 6
    else:
        raise ValueError(f"unsupported channel count: {img.shape}")
    h, w = img.shape[0], img.shape[1]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _unfilter_png(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse the per-row PNG filters (None/Sub/Up/Average/Paeth;
    RFC 2083 §6). Row-vectorized where the filter allows (Up is one numpy
    add; Sub/Average/Paeth carry a running left dependency)."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ftype = int(raw[pos])
        pos += 1
        row = raw[pos:pos + stride].astype(np.int32)
        pos += stride
        if ftype == 0:
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 1:  # Sub
            cur = row.copy()
            for i in range(ch, stride):
                cur[i] = (cur[i] + cur[i - ch]) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(blob: bytes) -> np.ndarray:
    """Pure numpy+zlib PNG decode: non-interlaced, 8-bit gray / RGB / RGBA
    (the common web cases). Interlaced or palette PNGs raise
    NotImplementedError (the remaining honest boundary)."""
    import struct
    import zlib

    b = bytes(blob)
    if not b.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG")
    pos = 8
    idat = []
    w = h = bitdepth = color = interlace = None
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos:pos + 4])
        tag = b[pos + 4:pos + 8]
        payload = b[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bitdepth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    if bitdepth != 8 or interlace != 0 or color not in (0, 2, 6):
        raise NotImplementedError(
            "only non-interlaced 8-bit gray/RGB/RGBA PNGs decode here "
            f"(bitdepth={bitdepth}, color={color}, interlace={interlace})")
    ch = {0: 1, 2: 3, 6: 4}[color]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (w * ch + 1):
        raise ValueError("PNG payload length mismatch")
    flat = _unfilter_png(raw, h, w, ch)
    img = flat.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


# --- GIF (pure-Python LZW; GIF87a/89a, first frame) -------------------------

def decode_gif(blob: bytes) -> np.ndarray:
    """Decode the FIRST frame of a GIF87a/89a to (h, w, 3) uint8 RGB:
    LZW decompression, global/local color tables, 4-pass interlace.
    Animation frames beyond the first, and disposal/transparency
    compositing, are out of scope (the first-frame thumbnail is what a
    curation pipeline featurizes)."""
    b = bytes(blob)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = b[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[pos:pos + 3 * n], dtype=np.uint8) \
            .reshape(n, 3).copy()
        pos += 3 * n
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension: skip sub-blocks
            pos += 2
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            w = b[pos + 5] | (b[pos + 6] << 8)
            h = b[pos + 7] | (b[pos + 8] << 8)
            iflags = b[pos + 9]
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = np.frombuffer(b[pos:pos + 3 * n], dtype=np.uint8) \
                    .reshape(n, 3).copy()
                pos += 3 * n
            if table is None:
                raise ValueError("GIF frame without a color table")
            min_code = b[pos]
            pos += 1
            data = bytearray()
            while b[pos] != 0:
                ln = b[pos]
                data += b[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(bytes(data), min_code, w * h)
            img = table[np.asarray(idx, dtype=np.int64)].reshape(h, w, 3)
            if iflags & 0x40:  # interlaced: 4-pass row order
                order = np.concatenate([
                    np.arange(0, h, 8), np.arange(4, h, 8),
                    np.arange(2, h, 4), np.arange(1, h, 2)])
                out = np.empty_like(img)
                out[order] = img
                img = out
            return img
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
    raise ValueError("GIF without an image frame")


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> list:
    """GIF-variant LZW (LSB-first bitstream, CLEAR/EOI codes, code width
    grows after the table fills, 12-bit cap)."""
    clear = 1 << min_code
    eoi = clear + 1
    out: list = []
    table: list = [(i,) for i in range(clear)] + [(), ()]
    width = min_code + 1
    buf = 0
    nbits = 0
    prev = None
    i = 0
    while i < len(data) or nbits >= width:
        while nbits < width and i < len(data):
            buf |= data[i] << nbits
            nbits += 8
            i += 1
        if nbits < width:
            break
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            table = [(j,) for j in range(clear)] + [(), ()]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_pixels:
            break
    return out[:n_pixels]


# --- TIFF (uncompressed strips) ---------------------------------------------

def decode_tiff(blob: bytes) -> np.ndarray:
    """Uncompressed baseline TIFF -> (h, w, 3) or (h, w) uint8: both byte
    orders, 8-bit gray/RGB, strip layout (compression 1 only — LZW/JPEG
    TIFFs raise NotImplementedError)."""
    b = bytes(blob)
    if b[:4] == b"II*\x00":
        end = "<"
    elif b[:4] == b"MM\x00*":
        end = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack_from(end + "I", b, 4)
    (n_tags,) = struct.unpack_from(end + "H", b, ifd_off)
    tags: dict = {}
    for i in range(n_tags):
        off = ifd_off + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(end + "HHI", b, off)
        if typ == 3 and cnt == 1:
            (v,) = struct.unpack_from(end + "H", b, off + 8)
            vals = [v]
        elif typ == 4 and cnt == 1:
            (v,) = struct.unpack_from(end + "I", b, off + 8)
            vals = [v]
        else:
            sz = {1: 1, 3: 2, 4: 4}.get(typ)
            if sz is None:
                continue
            total = sz * cnt
            voff = off + 8 if total <= 4 else struct.unpack_from(
                end + "I", b, off + 8)[0]
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            vals = list(struct.unpack_from(end + str(cnt) + fmt, b, voff))
        tags[tag] = vals
    w = tags.get(256, [None])[0]
    h = tags.get(257, [None])[0]
    if w is None or h is None:
        raise ValueError("TIFF without dimensions")
    compression = tags.get(259, [1])[0]
    if compression != 1:
        raise NotImplementedError(
            f"only uncompressed TIFF decodes here (compression={compression})")
    bits = tags.get(258, [8])
    if any(x != 8 for x in bits):
        raise NotImplementedError("only 8-bit TIFF samples decode here")
    spp = tags.get(277, [len(bits)])[0]
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets:
        raise ValueError("TIFF without strip offsets")
    if counts is None:
        counts = [len(b) - offsets[0]]
    raw = b"".join(b[o:o + c] for o, c in zip(offsets, counts))
    need = h * w * spp
    arr = np.frombuffer(raw, dtype=np.uint8, count=need)
    img = arr.reshape(h, w, spp) if spp > 1 else arr.reshape(h, w)
    return img[:, :, :3] if spp >= 3 else img


def encode_tiff(img: np.ndarray) -> bytes:
    """Minimal little-endian uncompressed TIFF (one strip)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[0], img.shape[1]
    spp = 1 if gray else img.shape[2]
    body = img.tobytes()
    # layout: header(8) + body + IFD
    data_off = 8
    ifd_off = data_off + len(body)
    tags = [
        (256, 3, 1, w), (257, 3, 1, h),
        (258, 3, 1, 8) if spp == 1 else None,
        (259, 3, 1, 1),
        (262, 3, 1, 1 if gray else 2),
        (273, 4, 1, data_off), (277, 3, 1, spp),
        (279, 4, 1, len(body)),
    ]
    tags = [t for t in tags if t is not None]
    if spp == 3:  # BitsPerSample array lives after the IFD
        bps_off = ifd_off + 2 + (len(tags) + 1) * 12 + 4
        tags.append((258, 3, 3, bps_off))
    tags.sort()
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += body
    out += struct.pack("<H", len(tags))
    for tag, typ, cnt, val in tags:
        out += struct.pack("<HHI", tag, typ, cnt)
        out += struct.pack("<I", val) if typ == 4 else \
            struct.pack("<HH", val, 0)
    out += struct.pack("<I", 0)
    if spp == 3:
        out += struct.pack("<HHH", 8, 8, 8)
    return bytes(out)
