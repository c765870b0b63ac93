"""Real pure-numpy audio codec for uncompressed WAV (RIFF PCM).

PCM WAV needs nothing beyond struct + numpy, so — like PPM/BMP on the
image side — it decodes FOR REAL; compressed audio (MP3/OGG/FLAC) stays
behind the honest NotImplementedError boundary. Decoders return
(samples float32 in [-1, 1] with shape (n, channels), sample_rate)."""

from __future__ import annotations

import struct

import numpy as np

_RIFF = b"RIFF"
_MP3_MAGICS = (b"ID3", b"\xff\xfb", b"\xff\xf3")
_OGG = b"OggS"
_FLAC = b"fLaC"


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) float32 in [-1, 1] -> 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    body = pcm.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate,
                      byte_rate, ch * 2, 16)
    data = struct.pack("<4sI", b"data", len(body)) + body
    return (struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
            + fmt + data)


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """16-bit PCM WAV -> ((n, channels) float32 in [-1, 1], sample_rate).
    Walks RIFF chunks, so extra chunks (LIST/fact) before `data` are fine."""
    if not blob.startswith(_RIFF) or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, n = 12, len(blob)
    ch = rate = bits = None
    audio_fmt = 1
    samples = None
    while pos + 8 <= n:
        cid, size = struct.unpack_from("<4sI", blob, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", blob, pos)
            bits = struct.unpack_from("<H", blob, pos + 14)[0]
        elif cid == b"data":
            samples = np.frombuffer(blob, dtype="<i2", count=size // 2,
                                    offset=pos)
        pos += size + (size & 1)  # chunks are word-aligned
    if ch is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    # PCM min is -32768: clamp so full-scale-negative samples honor the
    # documented [-1, 1] contract (1-LSB symmetric scale otherwise)
    out = np.maximum(samples.astype(np.float32) / 32767.0, -1.0)
    return out.reshape(-1, ch), rate


def sniff_and_decode_audio(blob: bytes) -> tuple[np.ndarray, int]:
    b = blob or b""
    if b.startswith(_RIFF):
        return decode_wav(b)
    if b[:4] == b"FORM" and b[8:12] == b"AIFF":
        return decode_aiff(b)
    if b.startswith(_MP3_MAGICS) or b.startswith(_OGG) or b.startswith(_FLAC):
        raise NotImplementedError(
            "compressed audio requires a codec library not present in this "
            "container; uncompressed PCM WAV and AIFF decode natively")
    raise ValueError("unrecognized audio format")


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Per-clip features: duration, rms, peak, zero-crossing rate — one
    vectorized pass over the (n, ch) array (mono mixdown for zcr/rms)."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    zc = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    return {
        "n_samples": n,
        "channels": int(samples.shape[1]) if samples.ndim == 2 else 1,
        "sample_rate": int(sample_rate),
        "duration_s": n / sample_rate if sample_rate else 0.0,
        "rms": float(np.sqrt(np.mean(mono ** 2))) if n else 0.0,
        "peak": float(np.abs(mono).max()) if n else 0.0,
        "zcr": zc / max(n - 1, 1),
    }


def encode_aiff(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, ch) float32 [-1,1] -> 16-bit PCM AIFF (big-endian samples,
    80-bit extended sample rate per the AIFF-C spec)."""
    import struct

    s = np.asarray(samples, dtype=np.float32)
    if s.ndim == 1:
        s = s[:, None]
    pcm = np.clip(np.rint(s * 32767.0), -32768, 32767).astype(">i2")
    n, ch = pcm.shape
    body = pcm.tobytes()
    # 80-bit extended float for the rate: exponent 16382 + #bits, mantissa
    # = rate << (63 - #bits)
    r = int(sample_rate)
    nbits = r.bit_length()
    ext = struct.pack(">HQ", 16382 + nbits, r << (64 - nbits))
    comm = struct.pack(">hIh", ch, n, 16) + ext
    ssnd = struct.pack(">II", 0, 0) + body
    chunks = (b"COMM" + struct.pack(">I", len(comm)) + comm
              + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    return (b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF"
            + chunks)


def decode_aiff(blob: bytes) -> tuple[np.ndarray, int]:
    """16-bit PCM AIFF -> ((n, ch) float32 in [-1, 1], sample_rate)."""
    import struct

    b = bytes(blob)
    if b[:4] != b"FORM" or b[8:12] != b"AIFF":
        raise ValueError("not an AIFF")
    pos = 12
    ch = bits = rate = None
    data = None
    while pos + 8 <= len(b):
        tag = b[pos:pos + 4]
        (ln,) = struct.unpack(">I", b[pos + 4:pos + 8])
        payload = b[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks pad to even
        if tag == b"COMM":
            ch, _nframes, bits = struct.unpack(">hIh", payload[:8])
            exp, mant = struct.unpack(">HQ", payload[8:18])
            rate = int(mant >> (16383 + 63 - exp)) if mant else 0
        elif tag == b"SSND":
            (off, _blk) = struct.unpack(">II", payload[:8])
            data = payload[8 + off:]
    if ch is None or data is None:
        raise ValueError("AIFF missing COMM/SSND")
    if bits != 16:
        raise ValueError(f"unsupported AIFF bits={bits}")
    pcm = np.frombuffer(data, dtype=">i2")
    out = np.maximum(pcm.astype(np.float32) / 32767.0, -1.0)
    return out.reshape(-1, ch), rate
