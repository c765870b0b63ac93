"""Real image codecs (multimodal/codecs.py): property round-trips for
PPM/BMP on arbitrary dims (BMP row padding edge cases included), resize
gather shape/content, sniffing dispatch, and the honest stub boundary
for compressed formats."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.multimodal import (
    decode_bmp,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    image_stats,
    resize_nearest,
    sniff_and_decode,
)

dims_st = st.tuples(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32 - 1))


def _img(h, w, seed):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)


@settings(max_examples=60, deadline=None)
@given(dims_st)
def test_ppm_roundtrip(dims):
    h, w, seed = dims
    img = _img(h, w, seed)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)


@settings(max_examples=60, deadline=None)
@given(dims_st)
def test_bmp_roundtrip_with_padding(dims):
    h, w, seed = dims  # w % 4 != 0 exercises the row-padding path
    img = _img(h, w, seed)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(img)), img)


def test_ppm_header_comments_and_whitespace():
    img = _img(2, 3, 7)
    blob = b"P6\n# a comment\n 3\t2\n# more\n255\n" + img.tobytes()
    np.testing.assert_array_equal(decode_ppm(blob), img)


def test_sniff_dispatch_and_stub_boundary():
    img = _img(4, 5, 1)
    np.testing.assert_array_equal(sniff_and_decode(encode_ppm(img)), img)
    np.testing.assert_array_equal(sniff_and_decode(encode_bmp(img)), img)
    with pytest.raises(ValueError):
        sniff_and_decode(b"\xff\xd8\xff\xe0JFIF")  # truncated JPEG = bad
    with pytest.raises(ValueError):
        sniff_and_decode(b"\x89PNG\r\n")  # PNG decodes now; truncated = bad
    with pytest.raises(ValueError):
        sniff_and_decode(b"garbage")


# --- JPEG (pure-numpy T.81 baseline; jpeg.py) --------------------------------

def _smooth(h, w, seed):
    """Band-limited test image (JPEG is lossy; smooth content bounds the
    round-trip error tightly)."""
    rng = np.random.default_rng(seed)
    a, b, c = rng.uniform(0.05, 0.3, 3)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    chans = [128 + 100 * np.sin(a * yy + p) * np.cos(b * xx + p)
             + 20 * np.sin(c * (yy + xx)) for p in (0.0, 1.0, 2.0)]
    return np.clip(np.stack(chans, axis=-1), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("subsample", [False, True])
@pytest.mark.parametrize("dims", [(8, 8), (16, 24), (37, 53), (41, 30)])
def test_jpeg_roundtrip_rgb(dims, subsample):
    from lucene_solr_ray.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = _smooth(*dims, seed=dims[0] * 100 + dims[1])
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample=subsample))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    # 4:2:0 genuinely discards high-frequency chroma (2x2-mean), so its
    # bound is a subsampling-loss bound, not a codec-accuracy bound
    assert err.max() <= (24 if subsample else 6)
    assert err.mean() < 4.0


def test_jpeg_flat_image_exact():
    from lucene_solr_ray.multimodal.jpeg import decode_jpeg, encode_jpeg

    flat = np.full((24, 16, 3), 113, np.uint8)
    np.testing.assert_array_equal(
        decode_jpeg(encode_jpeg(flat, quality=90)), flat)


def test_jpeg_grayscale_and_sniff():
    from lucene_solr_ray.multimodal.jpeg import decode_jpeg, encode_jpeg

    g = _smooth(19, 26, 5)[:, :, 0]
    blob = encode_jpeg(g, quality=95)
    out = decode_jpeg(blob)
    assert out.shape == g.shape  # decode_jpeg keeps gray 2-D
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 6
    via_sniff = sniff_and_decode(blob)  # sniff promotes gray -> RGB
    assert via_sniff.shape == (19, 26, 3)
    np.testing.assert_array_equal(via_sniff[:, :, 0], out)


@pytest.mark.parametrize("interval", [1, 3, 7])
def test_jpeg_restart_markers(interval):
    from lucene_solr_ray.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = _smooth(41, 67, 9)
    blob = encode_jpeg(img, quality=92, subsample=True,
                       restart_interval=interval)
    assert b"\xff\xdd" in blob  # DRI present
    out = decode_jpeg(blob)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 24
    # restarts change the framing, not the content: identical to no-DRI
    no_dri = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
    np.testing.assert_array_equal(out, no_dri)


def test_jpeg_progressive_raises():
    from lucene_solr_ray.multimodal.jpeg import decode_jpeg, encode_jpeg

    blob = bytearray(encode_jpeg(_smooth(8, 8, 1), quality=90))
    i = blob.find(b"\xff\xc0")
    assert i > 0
    blob[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))


def test_jpeg_truncation_fuzz():
    import struct

    from lucene_solr_ray.multimodal.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    blob = encode_jpeg(_smooth(16, 16, 3), quality=85)
    ok_errors = (ValueError, NotImplementedError, struct.error, IndexError)
    for _ in range(40):
        cut = int(rng.integers(2, len(blob)))
        try:
            out = decode_jpeg(blob[:cut])
            assert out.shape[-1] == 3 or out.ndim == 2
        except ok_errors:
            pass
    # single-byte corruptions
    for _ in range(40):
        mut = bytearray(blob)
        mut[int(rng.integers(2, len(mut)))] = int(rng.integers(0, 256))
        try:
            decode_jpeg(bytes(mut))
        except ok_errors:
            pass


def test_resize_nearest_and_stats():
    img = np.zeros((10, 10, 3), np.uint8)
    img[:, :, 0] = 200
    out = resize_nearest(img, 3, 25)
    assert out.shape == (3, 25, 3) and (out[:, :, 0] == 200).all()
    s = image_stats(img)
    assert (s["height"], s["width"]) == (10, 10)
    assert s["mean_r"] == 200.0 and s["mean_g"] == 0.0
    assert s["lum_hist"].sum() == pytest.approx(1.0)


def test_decode_images_real_stage(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from lucene_solr_ray.multimodal import decode_images_real

    blobs, ids = [], []
    for i in range(12):
        img = _img(2 + i % 3, 3 + i % 5, i)
        blobs.append(encode_ppm(img) if i % 2 else encode_bmp(img))
        ids.append(i)
    p = str(tmp_path / "imgs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "img": pa.array(blobs, pa.large_binary())}), p)
    out = decode_images_real(rd.read_parquet(p), "doc_id", "img").to_pandas()
    assert len(out) == 12
    for i, r in out.sort_values("doc_id").reset_index(drop=True).iterrows():
        assert (r["height"], r["width"]) == (2 + i % 3, 3 + i % 5)


# --- audio (multimodal/audio.py) -------------------------------------------

@settings(max_examples=50, deadline=None)
@given(st.integers(1, 3000), st.integers(1, 2), st.integers(0, 2**32 - 1))
def test_wav_roundtrip(n, ch, seed):
    from lucene_solr_ray.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(seed)
    sig = (rng.random((n, ch), dtype=np.float64) * 2 - 1).astype(np.float32)
    back, rate = decode_wav(encode_wav(sig, 16000))
    assert rate == 16000 and back.shape == (n, ch)
    assert np.abs(back - sig).max() <= 1.0 / 32767 + 1e-6


def test_wav_extra_chunks_and_stub_boundary():
    from lucene_solr_ray.multimodal import (
        decode_wav,
        encode_wav,
        sniff_and_decode_audio,
    )

    sig = np.ones((10, 1), np.float32) * 0.5
    blob = encode_wav(sig, 8000)
    # splice a LIST chunk between fmt and data: chunk walker must skip it
    spliced = blob[:36] + b"LIST\x04\x00\x00\x00INFO" + blob[36:]
    back, rate = decode_wav(spliced)
    assert rate == 8000 and back.shape == (10, 1)
    with pytest.raises(NotImplementedError):
        sniff_and_decode_audio(b"ID3\x04rest-of-mp3")
    with pytest.raises(ValueError):
        sniff_and_decode_audio(b"noise")


def test_audio_features_closed_form():
    from lucene_solr_ray.multimodal import audio_features, decode_wav, encode_wav

    n = 101
    sig = np.empty(n, np.float32)
    sig[0::2], sig[1::2] = 0.5, -0.5
    back, rate = decode_wav(encode_wav(sig, 8000))
    f = audio_features(back, rate)
    assert f["n_samples"] == n and f["channels"] == 1
    assert f["zcr"] == pytest.approx(1.0)           # alternating signs
    assert f["rms"] == pytest.approx(0.5, abs=1e-4)
    assert f["duration_s"] == pytest.approx(n / 8000)


def test_png_round_trip_all_filters():
    """encode (filter 0) -> decode round-trips exactly; decode also
    handles Sub/Up/Average/Paeth-filtered rows via a hand-built PNG."""
    import struct
    import zlib

    from lucene_solr_ray.multimodal.codecs import (
        decode_png,
        encode_png,
        sniff_and_decode,
    )

    rng = np.random.default_rng(3)
    for shape in ((5, 7), (6, 4, 3), (3, 5, 4)):
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        blob = encode_png(img)
        out = sniff_and_decode(blob)
        np.testing.assert_array_equal(out, img)

    # hand-build a PNG exercising every filter type on an RGB image
    img = rng.integers(0, 256, size=(5, 6, 3)).astype(np.uint8)
    stride = 6 * 3

    def px(r, c, ch):
        return int(img[r, c, ch])

    rows = []
    prev = np.zeros(stride, dtype=np.int32)
    for r, f in enumerate([0, 1, 2, 3, 4]):
        cur = img[r].reshape(-1).astype(np.int32)
        enc = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else c)
            enc[i] = (cur[i] - pred) & 0xFF
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    blob = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(blob), img)

    # unsupported shapes stay honest
    import pytest as _pt

    with _pt.raises(NotImplementedError):
        decode_png(blob[:8]
                   + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
                   + chunk(b"IEND", b""))


def test_gif_known_vector_and_independent_encoder():
    import base64

    from lucene_solr_ray.multimodal.codecs import decode_gif, \
        sniff_and_decode

    # the canonical 1x1 transparent GIF (public known vector)
    one = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7")
    img = sniff_and_decode(one)
    assert img.shape == (1, 1, 3)
    assert img[0, 0].tolist() == [0, 0, 0]

    # independent mini LZW encoder (root codes + frequent CLEARs) built in
    # the test: 4-color 4x3 image, min_code=2 -> clear=4, width starts 3
    rng = np.random.default_rng(9)
    idxs = rng.integers(0, 4, size=12).tolist()
    palette = bytes([0, 0, 0,  255, 0, 0,  0, 255, 0,  0, 0, 255])

    codes = []
    for i, v in enumerate(idxs):
        if i % 2 == 0:
            codes.append(4)  # CLEAR: keep the table tiny, width fixed at 3
        codes.append(v)
    codes.append(5)  # EOI

    buf = 0
    nbits = 0
    out = bytearray()
    for c in codes:
        buf |= c << nbits
        nbits += 3
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8
    if nbits:
        out.append(buf & 0xFF)

    gif = (b"GIF89a"
           + bytes([4, 0, 3, 0])          # screen 4x3
           + bytes([0x91, 0, 0])          # GCT flag, 4 colors (2<<1)
           + palette
           + b"\x2c" + bytes([0, 0, 0, 0, 4, 0, 3, 0, 0])  # descriptor
           + bytes([2])                   # LZW min code size
           + bytes([len(out)]) + bytes(out) + b"\x00"
           + b"\x3b")
    img = decode_gif(gif)
    pal = np.frombuffer(palette, dtype=np.uint8).reshape(4, 3)
    exp = pal[np.asarray(idxs)].reshape(3, 4, 3)
    np.testing.assert_array_equal(img, exp)


def test_tiff_round_trip_and_dispatch():
    from lucene_solr_ray.multimodal.codecs import (
        decode_tiff,
        encode_tiff,
        sniff_and_decode,
    )

    rng = np.random.default_rng(5)
    for shape in ((5, 7, 3), (4, 6)):
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        out = sniff_and_decode(encode_tiff(img))
        np.testing.assert_array_equal(out, img)
    # compressed TIFFs stay honest
    blob = bytearray(encode_tiff(rng.integers(0, 256, size=(2, 2, 3))
                                 .astype(np.uint8)))
    i = blob.find(bytes([3, 1]) + b"\x03\x00\x01\x00\x00\x00\x01\x00")
    assert i > 0  # the compression tag (259 little-endian = 0x0103)
    blob[i + 8] = 5  # compression = LZW
    import pytest as _pt

    with _pt.raises(NotImplementedError):
        decode_tiff(bytes(blob))


def test_codec_truncation_fuzz_never_hangs():
    """Random truncations/corruptions of valid blobs raise cleanly
    (ValueError / NotImplementedError / struct.error / zlib.error /
    Index...) — never hang or return garbage silently."""
    import struct
    import zlib

    from lucene_solr_ray.multimodal.codecs import (
        encode_bmp,
        encode_png,
        encode_ppm,
        encode_tiff,
        sniff_and_decode,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(6, 5, 3)).astype(np.uint8)
    blobs = [encode_ppm(img), encode_bmp(img), encode_png(img),
             encode_tiff(img)]
    ok_errors = (ValueError, NotImplementedError, struct.error,
                 zlib.error, IndexError)
    for blob in blobs:
        for _ in range(25):
            cut = int(rng.integers(1, len(blob)))
            try:
                out = sniff_and_decode(blob[:cut])
                assert out.shape[-1] in (3,) or out.ndim == 2
            except ok_errors:
                pass


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 2000), st.integers(1, 2), st.integers(0, 2**32 - 1),
       st.sampled_from([8000, 16000, 44100, 48000]))
def test_aiff_roundtrip(n, ch, seed, rate):
    from lucene_solr_ray.multimodal.audio import decode_aiff, encode_aiff

    rng = np.random.default_rng(seed)
    sig = (rng.random((n, ch), dtype=np.float64) * 2 - 1).astype(np.float32)
    back, r = decode_aiff(encode_aiff(sig, rate))
    assert r == rate and back.shape == (n, ch)
    assert np.abs(back - sig).max() <= 1.0 / 32767 + 1e-6
