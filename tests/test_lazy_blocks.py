"""Lazy per-block postings decode: block_spans byte map + postings_blocks
range decode must reproduce the eager whole-term decode exactly, and
block-max WAND over the lazy path must stay rank-identical to exhaustive
evaluation while actually skipping pruned blocks' decompression."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.maintenance import delete_by_ids
from lucene_solr_ray.index.reader import IndexReader
from lucene_solr_ray.search.executor import (
    eval_node,
    resolve_weights,
    top_k_select,
    wand_top_k,
)
from lucene_solr_ray.search.query import Bool, Term


@pytest.fixture(scope="module")
def lazy_index(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("lazy")
    rng = np.random.default_rng(23)
    n = 4000
    texts = []
    for i in range(n):
        words = []
        if i < 80:
            # a CLUSTERED doc-id range of dominant docs (a block or two per
            # shard): huge tf + short doclen -> those blocks' impact bounds
            # tower over the flat tf=1 tail, so WAND prunes the tail blocks
            words += ["hot"] * 50
        else:
            words += ["hot"]
        if rng.random() < 0.8:
            words += ["common"] * int(rng.integers(1, 5))
            words += ["pad%d" % (i % 211)] * int(rng.integers(8, 25))
        else:
            words += ["pad%d" % (i % 211)] * int(rng.integers(8, 25))
        if rng.random() < 0.3:
            words += ["medium"] * int(rng.integers(1, 3))
        if rng.random() < 0.05:
            words.append("rare")
        rng.shuffle(words)
        texts.append(" ".join(words))
    p = str(tmp / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())}), p)
    idx = str(tmp / "idx")
    # 2 shards so per-shard df of "common" spans many 128-doc blocks
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    return idx


def test_postings_blocks_match_eager(lazy_index):
    r = IndexReader(lazy_index)
    for s in r.shards:
        for term in ("common", "medium", "rare", "pad7"):
            docs, freqs = s.postings(term)
            firsts, handles, _ = s.block_layout(term)
            assert len(firsts) == len(handles)
            ld, lf = s.postings_blocks(term, 0, len(handles))
            assert np.array_equal(ld, docs), term
            assert np.array_equal(lf, freqs), term
            # every individual block range matches the eager slice by value
            for b in range(len(handles)):
                bd, bf = s.postings_blocks(term, b, b + 1)
                lo = np.searchsorted(docs, bd[0]) if len(bd) else 0
                assert np.array_equal(bd, docs[lo:lo + len(bd)])


def test_wand_lazy_parity_and_skips(lazy_index):
    r = IndexReader(lazy_index)
    node = Bool(should=[Term("common"), Term("medium"), Term("rare")],
                min_should=1)
    weights = resolve_weights(r, node, None, np.float32)
    for s in r.shards:
        ed, es = eval_node(s, node, weights, np.float32)
        exp_d, exp_s = top_k_select(ed, es, 10)
        got_d, got_s = wand_top_k(
            s, [Term("common"), Term("medium"), Term("rare")],
            weights, 10, np.float32)
        assert np.array_equal(got_d, exp_d)
        assert np.array_equal(got_s, exp_s)


def test_wand_lazy_skips_blocks(lazy_index):
    # single high-tf-cluster term: θ after the hot block towers over the
    # flat tf=1 tail, so the tail's blocks must never be decompressed
    r = IndexReader(lazy_index)
    node = Bool(should=[Term("hot")], min_should=1)
    weights = resolve_weights(r, node, None, np.float32)
    for s in r.shards:
        ed, es = eval_node(s, node, weights, np.float32)
        exp_d, exp_s = top_k_select(ed, es, 10)
        got_d, got_s = wand_top_k(s, [Term("hot")], weights, 10, np.float32)
        assert np.array_equal(got_d, exp_d)
        assert np.array_equal(got_s, exp_s)
        firsts, handles, cache = s.block_layout("hot")
        if len(handles) > 4:
            assert len(cache) < len(handles), (
                "lazy WAND decoded every block — no pruning happened")


def test_wand_lazy_with_deletes(lazy_index, tmp_path):
    import shutil

    idx2 = str(tmp_path / "idx2")
    shutil.copytree(lazy_index, idx2)
    # tombstone a third of the docs, including whole doc ranges
    delete_by_ids(idx2, list(range(0, 1300)))
    r = IndexReader(idx2)
    node = Bool(should=[Term("common"), Term("medium")], min_should=1)
    weights = resolve_weights(r, node, None, np.float32)
    for s in r.shards:
        ed, es = eval_node(s, node, weights, np.float32)
        exp_d, exp_s = top_k_select(ed, es, 10)
        got_d, got_s = wand_top_k(
            s, [Term("common"), Term("medium")], weights, 10, np.float32)
        assert np.array_equal(got_d, exp_d)
        assert np.array_equal(got_s, exp_s)
        assert not np.isin(got_d, np.arange(1300)).any()
