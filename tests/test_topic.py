"""TopicStream checkpointed pulls + DaemonStream run loop
(io/stream/TopicStream.java:66, DaemonStream.java:42)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search.topic import DaemonStream, TopicStream


def _corpus(path, ids, word="kato"):
    pq.write_table(pa.table({
        "doc_id": pa.array(np.asarray(list(ids), np.int64)),
        "text": pa.array([f"{word} body {i}" for i in ids]),
    }), path)


def test_topic_stream_pulls_only_new_generations(tmp_path, ray_session):
    from lucene_solr_ray.index.maintenance import append_index

    c1 = str(tmp_path / "c1.parquet")
    _corpus(c1, range(100))
    idx = str(tmp_path / "idx")
    build_index(c1, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4,
                                              batch_size=64))
    ts = TopicStream(idx, "kato", str(tmp_path / "ckpt.json"))
    first = ts.pull()
    assert sorted(first["doc_id"].to_pylist()) == list(range(100))
    assert ts.pull().num_rows == 0  # nothing new

    c2 = str(tmp_path / "c2.parquet")
    _corpus(c2, range(100, 150))
    append_index(idx, c2)
    second = ts.pull()
    assert sorted(second["doc_id"].to_pylist()) == list(range(100, 150))
    assert ts.pull().num_rows == 0


def test_daemon_stream_runs_and_stops(ray_session):
    import time

    def tick():
        return 1

    d = DaemonStream(tick, interval_s=0.05)
    # poll instead of a fixed sleep: actor cold-start can eat a fixed window
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline and d.stats()["runs"] < 2:
        time.sleep(0.05)
    final = d.stop()
    assert final["runs"] >= 2
    assert final["errors"] == 0
    assert final["stopped"] is True


def test_daemon_stream_survives_errors(ray_session):
    import time

    state = {"n": 0}

    def flaky():
        state["n"] += 1
        raise RuntimeError("boom")

    d = DaemonStream(flaky, interval_s=0.05)
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline and d.stats()["errors"] < 2:
        time.sleep(0.05)
    final = d.stop()
    assert final["errors"] >= 2
    assert final["runs"] == 0
