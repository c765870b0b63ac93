"""Multimodal column plumbing (image/audio/video as opaque binary columns).

Every common web image format decodes FOR REAL in pure numpy/stdlib:
PPM (P6), 24-bit BMP, PNG (zlib), GIF (LZW), uncompressed TIFF, and
baseline JPEG (T.81 Huffman + IDCT, jpeg.py); PCM WAV/AIFF audio decode
in audio.py. decode_images_real runs them through the actor-pool stage
with value-level oracles. Only video frame extraction stays STUBBED (no
container/codec library here): that stage's Ray-side plumbing — schema,
actor-pool signature, batch sizing for wide binary rows, output layout —
is real and tested with a deterministic fake decoder; swapping in ffmpeg
is a one-function change inside the actor's __init__/__call__.

Batch-size guidance: binary payloads of ~100KB-10MB mean batches must be
small (tens of rows) and blocks should not be split absurdly small — raise
DataContext.target_max_block_size for very wide rows (ray_guide pitfalls).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset


class _FakeDecoder:
    """Deterministic stand-in for a real image decoder.

    Raises NotImplementedError when strict=True (the honest stub); otherwise
    produces a seeded fake (height, width, feature vector) from the bytes so
    the pipeline shape is testable end to end.
    """

    def __init__(self, strict: bool = False, feat_dim: int = 8):
        self.strict = strict
        self.feat_dim = feat_dim

    def decode(self, blob: bytes) -> tuple[int, int]:
        if self.strict:
            raise NotImplementedError(
                "image decoding requires an image library not present in this "
                "container; install one and replace _FakeDecoder"
            )
        # dims derive from the byte length only, so the driver's DuckDB
        # oracle can recompute them from the source column (oracles.py)
        n = len(blob or b"")
        return 16 + n % 240, 16 + (n // 240) % 240

    def features(self, blob: bytes) -> np.ndarray:
        h = hashlib.blake2b(blob or b"", digest_size=self.feat_dim).digest()
        return np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0


def decode_images(
    ds: Dataset, key_col: str, blob_col: str, strict: bool = False,
    batch_size: int = 32, concurrency: int = 2,
) -> Dataset:
    """Actor-pool decode stage: (key, binary) -> (key, height, width)."""

    class Decode:
        def __init__(self):
            self.dec = _FakeDecoder(strict=strict)  # model/codec load: once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            dims = [self.dec.decode(b) for b in t[blob_col].to_pylist()]
            return pa.table(
                {
                    key_col: t[key_col],
                    "height": pa.array([d[0] for d in dims], pa.int32()),
                    "width": pa.array([d[1] for d in dims], pa.int32()),
                }
            )

    return ds.map_batches(
        Decode, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def extract_image_features(
    ds: Dataset, key_col: str, blob_col: str, feat_dim: int = 8,
    batch_size: int = 32, concurrency: int = 2,
) -> Dataset:
    """Feature extraction stage -> fixed-size float vector per image."""

    class Feats:
        def __init__(self):
            self.dec = _FakeDecoder(feat_dim=feat_dim)

        def __call__(self, t: pa.Table) -> pa.Table:
            f = np.stack([self.dec.features(b) for b in t[blob_col].to_pylist()])
            return pa.table(
                {
                    key_col: t[key_col],
                    "features": pa.FixedSizeListArray.from_arrays(
                        pa.array(f.ravel(), pa.float32()), feat_dim
                    ),
                }
            )

    return ds.map_batches(
        Feats, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def sample_frames(
    ds: Dataset, key_col: str, blob_col: str, every_n: int = 10,
    batch_size: int = 8, concurrency: int = 2,
) -> Dataset:
    """Video frame-sampling stage: one output row per sampled frame index.

    The frame decode itself is stubbed; the explode layout (one row per
    (video, frame_idx) with a binary frame payload) is the real contract."""

    class Sample:
        def __init__(self):
            self.dec = _FakeDecoder()

        def __call__(self, t: pa.Table) -> pa.Table:
            keys, idxs, frames = [], [], []
            for k, b in zip(t[key_col].to_pylist(), t[blob_col].to_pylist()):
                n_frames = 1 + (len(b or b"") % 50)
                for i in range(0, n_frames, every_n):
                    keys.append(k)
                    idxs.append(i)
                    frames.append(
                        hashlib.blake2b((b or b"") + i.to_bytes(4, "little"),
                                        digest_size=16).digest()
                    )
            return pa.table(
                {
                    key_col: pa.array(keys, pa.int64()),
                    "frame_idx": pa.array(idxs, pa.int32()),
                    "frame": pa.array(frames, pa.large_binary()),
                }
            )

    return ds.map_batches(
        Sample, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def decode_images_real(
    ds: Dataset, key_col: str, blob_col: str,
    batch_size: int = 32, concurrency: int = 2,
) -> Dataset:
    """REAL decode stage for uncompressed formats (PPM/BMP, codecs.py):
    (key, binary) -> (key, height, width, mean_r, mean_g, mean_b).

    Same actor-pool shape as decode_images; compressed formats raise the
    honest NotImplementedError at the codec boundary. Means are float64
    over the decoded pixels — a value-level invariant an oracle can
    recompute for synthetic inputs."""

    class Decode:
        def __init__(self):
            # codec dispatch + stats kernels bound once per actor
            from .codecs import image_stats, sniff_and_decode

            self.decode = sniff_and_decode
            self.stats = image_stats

        def __call__(self, t: pa.Table) -> pa.Table:
            st = [self.stats(self.decode(b), with_hist=False)
                  for b in t[blob_col].to_pylist()]
            return pa.table({
                key_col: t[key_col],
                "height": pa.array([s["height"] for s in st], pa.int32()),
                "width": pa.array([s["width"] for s in st], pa.int32()),
                "mean_r": pa.array([s["mean_r"] for s in st], pa.float64()),
                "mean_g": pa.array([s["mean_g"] for s in st], pa.float64()),
                "mean_b": pa.array([s["mean_b"] for s in st], pa.float64()),
            })

    return ds.map_batches(
        Decode, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_audio_real(
    ds: Dataset, key_col: str, blob_col: str,
    batch_size: int = 32, concurrency: int = 2,
) -> Dataset:
    """REAL decode stage for PCM WAV (audio.py): (key, binary) ->
    (key, sample_rate, channels, n_samples, duration_s, rms, peak, zcr).
    Compressed audio raises the honest NotImplementedError at the codec
    boundary."""

    class Decode:
        def __init__(self):
            from .audio import audio_features, sniff_and_decode_audio

            self.decode = sniff_and_decode_audio
            self.feats = audio_features

        def __call__(self, t: pa.Table) -> pa.Table:
            st = [self.feats(*self.decode(b))
                  for b in t[blob_col].to_pylist()]
            cols = {key_col: t[key_col]}
            for name, typ in (("sample_rate", pa.int32()),
                              ("channels", pa.int32()),
                              ("n_samples", pa.int64()),
                              ("duration_s", pa.float64()),
                              ("rms", pa.float64()),
                              ("peak", pa.float64()),
                              ("zcr", pa.float64())):
                cols[name] = pa.array([s[name] for s in st], typ)
            return pa.table(cols)

    return ds.map_batches(
        Decode, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
