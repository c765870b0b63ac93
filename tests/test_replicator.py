"""Replicator (replicator/LocalReplicator.java, IndexRevision.java role):
incremental revision pull, identical search results, crash-safe adopt."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.replicator import pull_revision, revision_files
from lucene_solr_ray.search import IndexSearcher


def _corpus(path, ids, seed=0):
    rng = np.random.default_rng(seed)
    words = ["kato", "mito", "zuka", "rado", "neli", "fast", "query"]
    texts = [" ".join(rng.choice(words, 8)) for _ in ids]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.asarray(ids, np.int64)),
        "text": pa.array(texts),
    }), path)


def _results(idx, q="kato"):
    t = IndexSearcher(idx).match_all(q)
    return sorted(zip(t["doc_id"].to_pylist(),
                      [round(s, 6) for s in t["score"].to_pylist()]))


@pytest.fixture()
def src_index(tmp_path):
    c = str(tmp_path / "c1.parquet")
    _corpus(c, range(500))
    idx = str(tmp_path / "src")
    build_index(c, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4,
                                             batch_size=256))
    return idx, tmp_path


def test_pull_fresh_replica(src_index):
    idx, root = src_index
    rep = str(root / "replica")
    r = pull_revision(idx, rep)
    assert r["copied"] == len(revision_files(idx)) > 0
    assert _results(rep) == _results(idx)
    # second pull at the same generation is a no-op
    assert pull_revision(idx, rep)["copied"] == 0


def test_pull_incremental_generation(src_index):
    from lucene_solr_ray.index.maintenance import append_index

    idx, root = src_index
    rep = str(root / "replica")
    pull_revision(idx, rep)
    c2 = str(root / "c2.parquet")
    _corpus(c2, range(1000, 1400), seed=1)
    append_index(idx, c2)
    r = pull_revision(idx, rep)
    # only the appended generation's shard files move
    new_files = {f for f in revision_files(idx) if "shard=2" in f or "shard=3" in f}
    assert 0 < r["copied"] <= len(new_files) + 1
    assert _results(rep) == _results(idx)


def test_pull_after_merge_gcs_old_shards(src_index):
    from lucene_solr_ray.index.maintenance import (
        append_index,
        delete_by_ids,
        force_merge,
    )

    idx, root = src_index
    rep = str(root / "replica")
    pull_revision(idx, rep)
    c2 = str(root / "c2.parquet")
    _corpus(c2, range(1000, 1400), seed=1)
    append_index(idx, c2)
    delete_by_ids(idx, [0, 1, 2])
    force_merge(idx)
    r = pull_revision(idx, rep)
    assert r["removed"] > 0  # pre-merge shard files dropped from the replica
    assert _results(rep) == _results(idx)
    assert set(revision_files(rep)) == set(revision_files(idx))
