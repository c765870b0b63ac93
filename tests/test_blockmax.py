"""BlockMaxConjunction + shared-θ parity: pruned results must equal the
exhaustive evaluation, merged across shards."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.executor import (
    MaxScoreAccumulator,
    conj_top_k,
    resolve_weights,
)
from lucene_solr_ray.search.query import Bool, Term


@pytest.fixture(scope="module")
def conj_index(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("conj")
    rng = np.random.default_rng(11)
    n = 3000
    texts = []
    for i in range(n):
        words = ["alpha"] * int(rng.integers(1, 6)) + \
                ["beta"] * int(rng.integers(1, 4)) + \
                ["filler%d" % (i % 97)] * int(rng.integers(1, 40))
        rng.shuffle(words)
        texts.append(" ".join(words))
    p = str(tmp / "c.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                             "text": pa.array(texts, pa.string())}), p)
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=4, num_buckets=8))
    return idx


def test_conjunction_blockmax_parity(conj_index):
    s = IndexSearcher(conj_index)
    node = Bool(must=[Term("alpha"), Term("beta")])
    weights = resolve_weights(s.reader, node, s.params, s.dtype)
    for k in (3, 10, 50):
        for shard in s.reader.shards:
            from lucene_solr_ray.search.executor import eval_node, top_k_select

            d_ex, s_ex = eval_node(shard, node, weights, s.dtype)
            exp = top_k_select(d_ex, s_ex, k)
            got = conj_top_k(shard, [Term("alpha"), Term("beta")], weights,
                             k, s.dtype)
            assert got[0].tolist() == exp[0].tolist()
            assert got[1].tolist() == exp[1].tolist()


def test_shared_theta_merged_parity(conj_index):
    s = IndexSearcher(conj_index)
    # WAND path with shared accumulator vs exhaustive, whole-index merge
    for q in ("alpha OR beta", "alpha AND beta"):
        a = s.search(q, k=10, use_wand="force")
        b = s.search(q, k=10, use_wand=False)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        assert a["score"].to_pylist() == pytest.approx(b["score"].to_pylist())


def test_accumulator_bound_is_safe(conj_index):
    # a pre-published θ from another shard must not change the merged result
    s = IndexSearcher(conj_index)
    node = Bool(must=[Term("alpha"), Term("beta")])
    weights = resolve_weights(s.reader, node, s.params, s.dtype)
    from lucene_solr_ray.search.executor import shard_top_k
    from lucene_solr_ray.search.searcher import merge_top_k

    # exhaustive global answer
    exp = merge_top_k(
        [shard_top_k(sh, node, weights, 10, s.dtype, use_wand=False)
         for sh in s.reader.shards], 10)
    acc = MaxScoreAccumulator()
    parts = [conj_top_k(sh, [Term("alpha"), Term("beta")], weights, 10,
                        s.dtype, acc=acc) for sh in s.reader.shards]
    got = merge_top_k(parts, 10)
    assert got[0].tolist() == exp[0].tolist()
    assert got[1].tolist() == pytest.approx(exp[1].tolist())


def test_impact_frontier_tightens_bounds(conj_index):
    """Stored frontier bounds must be valid (>= every real doc score in the
    block) and no looser than the single-point (max_freq, min_norm) bound."""
    import numpy as np

    from lucene_solr_ray.search.bm25 import score_postings
    from lucene_solr_ray.search.executor import (
        _block_upper_bounds, resolve_weights,
    )

    s = IndexSearcher(conj_index)
    weights = resolve_weights(s.reader, Term("filler1"), s.params, s.dtype)
    checked = 0
    for sh in s.reader.shards:
        for term in ("alpha", "beta", "filler1"):
            imps = sh.block_impacts(term)
            if imps is None:
                continue
            firsts, maxf, minn = sh.block_metadata(term)
            w = resolve_weights(s.reader, Term(term), s.params, s.dtype)
            tw = w[(term, 1.0)]
            ub = _block_upper_bounds(sh, term, tw, firsts, maxf, minn, s.dtype)
            loose = score_postings(tw, maxf, minn.astype(np.int64), s.dtype)
            assert np.all(ub <= loose.astype(np.float64) + 1e-9)
            # validity: every real doc score in each block <= its ub
            docs, freqs = sh.postings(term)
            norms = sh.norms_for(docs)
            scores = score_postings(tw, freqs, norms, s.dtype)
            bi = np.maximum(np.searchsorted(firsts, docs, side="right") - 1, 0)
            assert np.all(scores.astype(np.float64) <= ub[bi] + 1e-9)
            checked += 1
    assert checked > 0
