"""Real pure-numpy image codecs for UNCOMPRESSED formats.

This container has no image libraries, so compressed formats (JPEG/PNG)
stay behind the honest NotImplementedError stub in ops.py — but binary
PPM (P6) and 24-bit uncompressed BMP need nothing beyond numpy, and a
100 TB curation pipeline meets both (raw crawl assets, thumbnails,
intermediate artifacts). encode_* exist so tests and synthetic corpora
can round-trip deterministically.

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
    """Magic-byte dispatch. Compressed formats raise NotImplementedError
    (the honest stub boundary); unknown bytes raise ValueError."""
    b = blob or b""
    if b.startswith(_PPM_MAGIC):
        return decode_ppm(b)
    if b.startswith(_BMP_MAGIC):
        return decode_bmp(b)
    if b.startswith(_JPEG_MAGIC) or b.startswith(_PNG_MAGIC):
        raise NotImplementedError(
            "JPEG/PNG decoding requires an image library not present in "
            "this container; uncompressed PPM/BMP decode natively")
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
