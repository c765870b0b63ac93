"""Tiered (selective) generation merge: results identical before/after,
other generations untouched, tombstones purged, no resurrection."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.maintenance import (
    append_index,
    check_index,
    delete_by_ids,
    maybe_tiered_merge,
    merge_generations,
)
from lucene_solr_ray.search import IndexSearcher


def _corpus(path, ids, texts):
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}), path)


def _build_with_gens(tmp_path, n_gens=3):
    base = str(tmp_path / "base.parquet")
    _corpus(base, np.arange(100, dtype=np.int64),
            ["alpha beta doc%d" % i for i in range(100)])
    idx = str(tmp_path / "idx")
    build_index(base, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    for g in range(1, n_gens + 1):
        p = str(tmp_path / f"gen{g}.parquet")
        lo = 100 * g + 1000
        _corpus(p, np.arange(lo, lo + 50, dtype=np.int64),
                [f"gamma{g} delta doc%d" % i for i in range(50)])
        append_index(idx, p)
    return idx


def test_merge_generations_preserves_results(tmp_path):
    idx = _build_with_gens(tmp_path, n_gens=3)
    s0 = IndexSearcher(idx)
    before = {
        q: (s0.match_all(q)["doc_id"].to_pylist(),
            s0.match_all(q)["score"].to_pylist())
        for q in ("alpha", "delta", "gamma1", "gamma2", "gamma3")
    }
    m0 = IndexSearcher(idx).reader.manifest
    assert len(m0["shard_ids"]) == 8  # base + 3 gens x 2 shards
    # merge generations 1 and 2 (offsets 2 and 4) only
    m = merge_generations(idx, [2, 4])
    assert m["num_shards"] == 6
    assert sorted(m["shard_ids"]) == [0, 1, 6, 7, 8, 9]
    check_index(idx)
    s1 = IndexSearcher(idx)
    for q, (docs, scores) in before.items():
        got = s1.match_all(q)
        assert got["doc_id"].to_pylist() == docs, q
        assert got["score"].to_pylist() == scores, q


def test_merge_generations_purges_tombstones(tmp_path):
    idx = _build_with_gens(tmp_path, n_gens=2)
    # delete some docs living in generation 1 (ids 1100..1104)
    delete_by_ids(idx, list(range(1100, 1105)))
    s = IndexSearcher(idx)
    assert s.count("gamma1") == 45
    m = merge_generations(idx, [2])  # merge generation 1 only
    s2 = IndexSearcher(idx)
    assert s2.count("gamma1") == 45
    # physically gone: raw stats of the merged gen exclude them
    assert s2.reader.term_stats("gamma1")[0] == 45
    check_index(idx)
    # and another full pass doesn't resurrect
    merge_generations(idx, [m["shard_ids"][-1] - 1])  # merge the new gen again
    assert IndexSearcher(idx).reader.term_stats("gamma1")[0] == 45


def test_maybe_tiered_merge_policy(tmp_path):
    idx = _build_with_gens(tmp_path, n_gens=4)  # 5 generations total
    m = maybe_tiered_merge(idx, max_generations=3)
    assert m is not None
    K = 2
    offsets = sorted({i - (i % K) for i in m["shard_ids"]})
    assert len(offsets) == 3
    # under budget now: planner is a no-op
    assert maybe_tiered_merge(idx, max_generations=3) is None
    check_index(idx)
    s = IndexSearcher(idx)
    assert s.count("alpha") == 100
    for g in range(1, 5):
        assert s.count(f"gamma{g}") == 50
