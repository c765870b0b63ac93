"""MP4 container metadata parsing (multimodal/video.py) — synth round
trip, box-walk robustness, batch extraction with corrupt rows."""

import struct

import pyarrow as pa
import pytest
import ray

from lucene_solr_ray.multimodal.video import (Mp4Error, mp4_metadata,
                                              parse_boxes, synth_mp4,
                                              video_metadata)


def test_round_trip():
    data = synth_mp4(duration_s=3.5, timescale=600, width=320, height=240,
                     kinds=("vide", "soun"))
    m = mp4_metadata(data)
    assert m["major_brand"] == "isom"
    assert m["timescale"] == 600
    assert m["duration_s"] == pytest.approx(3.5)
    assert m["n_tracks"] == 2
    assert [t["kind"] for t in m["tracks"]] == ["vide", "soun"]
    assert m["tracks"][0]["width"] == 320.0
    assert m["tracks"][0]["height"] == 240.0
    assert m["tracks"][0]["track_id"] == 1
    assert m["tracks"][1]["track_id"] == 2


def test_largesize_and_size0():
    # a box with 64-bit largesize followed by a size-0 (to-EOF) box parses
    payload = b"abcd"
    big = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 16 + 4) + payload
    tail = struct.pack(">I", 0) + b"mdat" + b"xyz"
    data = big + tail
    boxes = list(parse_boxes(data))
    assert [b[0] for b in boxes] == [b"free", b"mdat"]
    assert data[boxes[0][1]:boxes[0][2]] == payload
    assert data[boxes[1][1]:boxes[1][2]] == b"xyz"


@pytest.mark.parametrize("bad", [
    b"",  # empty
    b"\x00\x00\x00\x04ftyp",  # size < header
    b"\x00\x00\x00\xffftypxxxx",  # size beyond end
    synth_mp4()[: 20],  # truncated
    b"\x00" * 64,  # garbage
])
def test_corrupt_raises(bad):
    with pytest.raises((Mp4Error, struct.error)):
        mp4_metadata(bad)


def test_batch_extraction(ray_session):
    rows = [synth_mp4(duration_s=i + 1.0, width=64 * (i + 1), height=48,
                      kinds=("vide",)) for i in range(3)]
    rows.append(b"not a video at all")
    rows.append(None)
    ds = ray.data.from_arrow(pa.table({
        "id": list(range(5)),
        "blob": pa.array(rows, pa.large_binary()),
    }))
    out = video_metadata(ds, "id", "blob").to_pandas().sort_values("id")
    assert list(out["ok"]) == [True, True, True, False, False]
    assert list(out["duration_s"])[:3] == [1.0, 2.0, 3.0]
    assert list(out["width"])[:3] == [64.0, 128.0, 192.0]
    assert list(out["n_video_tracks"]) == [1, 1, 1, 0, 0]
