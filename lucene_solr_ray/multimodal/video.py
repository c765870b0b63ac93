"""Video-container metadata extraction (multimodal plumbing).

Real ISO BMFF / MP4 box parsing (ISO/IEC 14496-12 §4, §8 — public spec):
box tree walk, `mvhd` timescale/duration, per-`trak` `tkhd` dimensions and
`hdlr` handler type. This makes the video column's metadata stage REAL —
only frame DECODE stays behind the deterministic stub (no video codec
library in the environment), mirroring how the image path grew real codecs
around the same actor plumbing (multimodal/codecs.py).

Reference hook: Tika-style media extraction feeds Solr through the
extraction contrib (solr/contrib/extraction); here the parser is a
vectorized map_batches stage over an opaque binary column.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ray.data import Dataset

# boxes that contain child boxes (the subset the walk descends into)
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"udta",
               b"edts", b"mvex"}


class Mp4Error(ValueError):
    pass


def parse_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (type, payload_start, payload_end, header_size) for each box
    in [start, end); raises Mp4Error on truncated/absurd sizes."""
    end = len(data) if end is None else end
    off = start
    while off < end:
        if off + 8 > end:
            raise Mp4Error(f"truncated box header at {off}")
        size = struct.unpack_from(">I", data, off)[0]
        btype = data[off + 4:off + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                raise Mp4Error(f"truncated largesize at {off}")
            size = struct.unpack_from(">Q", data, off + 8)[0]
            hdr = 16
        elif size == 0:  # box extends to end of file
            size = end - off
        if size < hdr or off + size > end:
            raise Mp4Error(f"bad box size {size} at {off}")
        yield btype, off + hdr, off + size, hdr
        off += size


def _walk(data: bytes, start: int, end: int, out: list, depth: int = 0):
    if depth > 16:
        raise Mp4Error("box nesting too deep")
    for btype, ps, pe, _ in parse_boxes(data, start, end):
        out.append((btype, ps, pe, depth))
        if btype in _CONTAINERS:
            _walk(data, ps, pe, out, depth + 1)


def mp4_metadata(data: bytes) -> dict:
    """{major_brand, duration_s, timescale, n_tracks, tracks:[{kind,
    track_id, width, height}]} from the container alone (no decode)."""
    boxes: list = []
    _walk(data, 0, len(data), boxes)
    types = [b[0] for b in boxes]
    if b"ftyp" not in types or b"moov" not in types:
        raise Mp4Error("not an MP4: missing ftyp/moov")
    meta: dict = {"major_brand": "", "duration_s": 0.0, "timescale": 0,
                  "n_tracks": 0, "tracks": []}
    cur_track: dict | None = None
    for btype, ps, pe, depth in boxes:
        if btype == b"ftyp":
            meta["major_brand"] = data[ps:ps + 4].decode("ascii", "replace")
        elif btype == b"mvhd":
            ver = data[ps]
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", data, ps + 20)
            else:
                ts, dur = struct.unpack_from(">II", data, ps + 12)
            meta["timescale"] = ts
            meta["duration_s"] = dur / ts if ts else 0.0
        elif btype == b"trak":
            cur_track = {"kind": "", "track_id": 0, "width": 0.0,
                         "height": 0.0}
            meta["tracks"].append(cur_track)
            meta["n_tracks"] += 1
        elif btype == b"tkhd" and cur_track is not None:
            ver = data[ps]
            base = ps + (4 + 8 + 8) if ver == 1 else ps + (4 + 4 + 4)
            cur_track["track_id"] = struct.unpack_from(">I", data, base)[0]
            # width/height: 16.16 fixed point, last 8 bytes of the box
            w, h = struct.unpack_from(">II", data, pe - 8)
            cur_track["width"] = w / 65536.0
            cur_track["height"] = h / 65536.0
        elif btype == b"hdlr" and cur_track is not None:
            cur_track["kind"] = data[ps + 8:ps + 12].decode(
                "ascii", "replace")
    return meta


# --- deterministic synthetic MP4 (tests / fake corpus) --------------------

def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def synth_mp4(duration_s: float = 2.0, timescale: int = 1000,
              width: int = 64, height: int = 48,
              kinds: tuple[str, ...] = ("vide",)) -> bytes:
    """A minimal spec-conformant MP4 skeleton (ftyp + moov) whose parsed
    metadata round-trips exactly — the video-corpus synthesizer."""
    mvhd = _box(b"mvhd", bytes(4) + bytes(8)
                + struct.pack(">II", timescale,
                              int(duration_s * timescale)) + bytes(80))
    traks = b""
    for i, kind in enumerate(kinds):
        tkhd = _box(b"tkhd", bytes(4) + bytes(8)
                    + struct.pack(">I", i + 1) + bytes(4) + bytes(4)
                    + bytes(8) + bytes(8) + bytes(36)
                    + struct.pack(">II", width << 16, height << 16))
        hdlr = _box(b"hdlr", bytes(8) + kind.encode("ascii") + bytes(12))
        mdia = _box(b"mdia", hdlr)
        traks += _box(b"trak", tkhd + mdia)
    return (_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
            + _box(b"moov", mvhd + traks))


def video_metadata(ds: Dataset, key_col: str, bin_col: str) -> Dataset:
    """Per-row MP4 metadata extraction over an opaque binary column ->
    (key, ok, major_brand, duration_s, n_tracks, n_video_tracks, width,
    height). Unparsable payloads yield ok=False rows, never exceptions —
    the web-scale contract (a corrupt container must not kill the batch)."""

    def extract(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        ok, brand, dur, ntr, nvid, w, h = [], [], [], [], [], [], []
        for payload in t[bin_col].to_pylist():
            try:
                m = mp4_metadata(payload or b"")
                vids = [tr for tr in m["tracks"] if tr["kind"] == "vide"]
                ok.append(True)
                brand.append(m["major_brand"])
                dur.append(m["duration_s"])
                ntr.append(m["n_tracks"])
                nvid.append(len(vids))
                w.append(vids[0]["width"] if vids else 0.0)
                h.append(vids[0]["height"] if vids else 0.0)
            except (Mp4Error, struct.error):
                ok.append(False)
                brand.append("")
                dur.append(0.0)
                ntr.append(0)
                nvid.append(0)
                w.append(0.0)
                h.append(0.0)
        return pa.table({
            key_col: pa.array(keys, t[key_col].type),
            "ok": pa.array(ok, pa.bool_()),
            "major_brand": pa.array(brand, pa.string()),
            "duration_s": pa.array(dur, pa.float64()),
            "n_tracks": pa.array(np.asarray(ntr, np.int64)),
            "n_video_tracks": pa.array(np.asarray(nvid, np.int64)),
            "width": pa.array(w, pa.float64()),
            "height": pa.array(h, pa.float64()),
        })

    return ds.select_columns([key_col, bin_col]).map_batches(
        extract, batch_format="pyarrow")
