"""ToParentBlockJoinQuery / ToChildBlockJoinQuery score semantics
(search/join/ToParentBlockJoinQuery.java:63, ToChildBlockJoinQuery.java:42,
ScoreMode None/Avg/Max/Total/Min) — brute-force parity over the real
searcher plus edge cases."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.services import (
    to_child_block_join,
    to_parent_block_join,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
SPAN = 16


def parent_of(ids):
    return np.asarray(ids, dtype=np.int64) // SPAN


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("bj_idx"))
    build_index(DOCS, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=3, num_buckets=4))
    return d


@pytest.fixture(scope="module")
def searcher(idx):
    return IndexSearcher(idx, dtype=np.float64)


@pytest.fixture(scope="module")
def brute(searcher):
    t = searcher.match_all("fast")
    docs = t["doc_id"].to_numpy()
    scores = t["score"].to_numpy()
    groups: dict[int, list[float]] = {}
    for d, s in zip(docs.tolist(), scores.tolist()):
        groups.setdefault(int(d) // SPAN, []).append(s)
    return groups


@pytest.mark.parametrize("mode,agg", [
    ("max", max),
    ("min", min),
    ("total", sum),
    ("avg", lambda v: sum(v) / len(v)),
])
def test_score_modes_match_brute_force(searcher, brute, mode, agg):
    out = to_parent_block_join(searcher, "fast", parent_of, score_mode=mode)
    got = dict(zip(out["parent_id"].to_pylist(), out["score"].to_pylist()))
    want = {p: agg(v) for p, v in brute.items()}
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-12)


def test_n_children_and_order(searcher, brute):
    out = to_parent_block_join(searcher, "fast", parent_of, score_mode="none")
    pids = out["parent_id"].to_pylist()
    assert pids == sorted(pids)
    counts = dict(zip(pids, out["n_children"].to_pylist()))
    assert counts == {p: len(v) for p, v in brute.items()}
    assert all(s == 0.0 for s in out["score"].to_pylist())


def test_topk_cut(searcher, brute):
    k = 5
    out = to_parent_block_join(searcher, "fast", parent_of,
                               score_mode="max", k=k)
    want = sorted(((max(v), p) for p, v in brute.items()),
                  key=lambda t: (-t[0], t[1]))[:k]
    assert out["parent_id"].to_pylist() == [p for _, p in want]


def test_no_matches(searcher):
    out = to_parent_block_join(searcher, "zzzznotaterm", parent_of)
    assert out.num_rows == 0


def test_round_child_rounds_before_aggregate(searcher, brute):
    out = to_parent_block_join(searcher, "fast", parent_of,
                               score_mode="total", round_child=2)
    got = dict(zip(out["parent_id"].to_pylist(), out["score"].to_pylist()))
    p10 = 100.0

    def r2(x):
        ax = abs(x) * p10
        fl = np.floor(ax)
        return np.sign(x) * (fl + (ax - fl >= 0.5)) / p10

    want = {p: sum(r2(s) for s in v) for p, v in brute.items()}
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-12)


def test_to_child_join_inherits_parent_score(searcher):
    # parents = docs matching "fast" (acting as their own parent key);
    # children = every doc id in the corpus whose parent matched
    t = searcher.match_all("fast")
    p_ids = set(t["doc_id"].to_pylist())
    p_score = dict(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))
    all_ids = pq.read_table(DOCS, columns=["doc_id"])["doc_id"].to_numpy()
    out = to_child_block_join(searcher, "fast", parent_of, all_ids)
    kids = out["doc_id"].to_numpy()
    scores = out["score"].to_numpy()
    # every returned child's parent matched, score equals the parent's
    for kid, sc in zip(kids.tolist(), scores.tolist()):
        par = kid // SPAN
        assert par in p_ids
        assert sc == pytest.approx(p_score[par], rel=1e-12)
    # completeness: every candidate whose parent matched is returned
    want = sorted(int(i) for i in all_ids.tolist() if i // SPAN in p_ids)
    assert kids.tolist() == want


def test_to_child_join_no_parent_matches(searcher):
    all_ids = pq.read_table(DOCS, columns=["doc_id"])["doc_id"].to_numpy()
    out = to_child_block_join(searcher, "zzzznotaterm", parent_of, all_ids)
    assert out.num_rows == 0
