"""Points index (BKD substitute): leaf pruning, parity with the docvalues
scan, liveness, and merge consistency. Mirrors the reference's
TestPointQueries ranges over BKD (util/bkd/BKDWriter.java:59-90,
search/PointRangeQuery.java:47)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.points import LEAF_SIZE, ShardPoints
from lucene_solr_ray.index.reader import IndexReader

N_DOCS = 5000


@pytest.fixture(scope="module")
def points_index(tmp_path_factory):
    root = tmp_path_factory.mktemp("points")
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 10_000, N_DOCS).astype(np.int64)
    corpus = pa.table({
        "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
        "text": pa.array([f"doc {v} body" for v in vals]),
        "n_chars": pa.array(vals),
    })
    cpath = str(root / "corpus.parquet")
    pq.write_table(corpus, cpath)
    idx = str(root / "idx")
    cfg = IndexBuildConfig(num_shards=1, num_buckets=4, batch_size=1024,
                           points_fields=("n_chars",))
    build_index(cpath, idx, cfg=cfg)
    return idx, vals


def _dv_expected(vals, lo, hi):
    m = np.ones(len(vals), dtype=bool)
    if lo is not None:
        m &= vals >= lo
    if hi is not None:
        m &= vals <= hi
    return np.flatnonzero(m).astype(np.int64)  # doc_id == position


def test_points_parity_with_dv_scan(points_index):
    idx, vals = points_index
    shard = IndexReader(idx).shards[0]
    for lo, hi in [(100, 200), (None, 50), (9900, None), (0, 9999),
                   (5000, 5000), (20000, 30000), (None, None)]:
        got = shard.point_range("n_chars", lo, hi)
        want = _dv_expected(vals, lo, hi)
        assert np.array_equal(np.sort(got), want), (lo, hi)


def test_points_leaf_pruning(points_index):
    idx, vals = points_index
    sp = ShardPoints(idx, 0)
    total_groups = pq.ParquetFile(
        os.path.join(idx, "points", "shard=0", "n_chars.parquet")
    ).metadata.num_row_groups
    assert total_groups == -(-N_DOCS // LEAF_SIZE)
    sp.range("n_chars", 100, 120)  # ~0.2% selectivity
    assert 0 < sp.last_groups_read < total_groups
    sp.range("n_chars", 50_000, 60_000)  # outside the value domain
    assert sp.last_groups_read == 0


def test_points_inclusive_bounds(points_index):
    idx, vals = points_index
    shard = IndexReader(idx).shards[0]
    v = int(vals[123])
    got = shard.point_range("n_chars", v, v)
    assert 123 in got.tolist()
    assert np.array_equal(np.sort(got), _dv_expected(vals, v, v))


def test_numeric_range_query_uses_points(points_index):
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.query import NumericRange

    idx, vals = points_index
    s = IndexSearcher(idx)
    res = s.match_all(NumericRange("n_chars", 100, 200))
    got = np.sort(res["doc_id"].to_numpy(zero_copy_only=False))
    assert np.array_equal(got, _dv_expected(vals, 100, 200))


def test_points_respect_deletes_and_merge(points_index):
    import shutil

    from lucene_solr_ray.index.maintenance import delete_by_ids, force_merge

    idx, vals = points_index
    idx2 = idx + "_del"
    shutil.copytree(idx, idx2)
    want = _dv_expected(vals, 100, 200)
    victims = want[:3].tolist()
    delete_by_ids(idx2, victims)
    shard = IndexReader(idx2).shards[0]
    got = shard.point_range("n_chars", 100, 200)
    assert not set(victims) & set(got.tolist())
    assert np.array_equal(np.sort(got), np.setdiff1d(want, victims))

    force_merge(idx2)
    reader = IndexReader(idx2)
    assert all(s.has_points("n_chars") for s in reader.shards)
    merged = np.sort(np.concatenate(
        [s.point_range("n_chars", 100, 200) for s in reader.shards]))
    assert np.array_equal(merged, np.setdiff1d(want, victims))


def test_points_all_nan_leaf_never_matches(tmp_path):
    """A field missing on >= LEAF_SIZE docs yields all-NaN trailing row
    groups with NO parquet min/max stats; those leaves must read as
    never-overlapping, not crash the stats load."""
    idx = str(tmp_path / "idx")
    n_real = 100
    vals = np.concatenate([np.sort(np.arange(n_real, dtype=np.float64)),
                           np.full(2 * LEAF_SIZE + 7, np.nan)])
    ids = np.arange(len(vals), dtype=np.int64)
    path = os.path.join(idx, "points", "shard=0", "score.parquet")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.table({"value": pa.array(vals, pa.float64()),
                             "doc_id": pa.array(ids, pa.int64())}),
                   path, row_group_size=LEAF_SIZE)
    sp = ShardPoints(idx, 0)
    got = sp.range("score", 10.0, 20.0)
    assert np.array_equal(got, np.arange(10, 21, dtype=np.int64))
    assert sp.last_groups_read == 1  # the NaN leaves were pruned
    assert len(sp.range("score", 1e9, None)) == 0
