"""Randomized search-parity fuzz: over random corpora, every generated
query must satisfy the engine's two load-bearing invariants
(BASELINE.json north_rule: rank-identical top-k):

1. WAND block-max pruning == exhaustive scoring (exact ranks AND scores).
2. K-shard layout == 1-shard layout (global stats + TopDocs.merge make
   sharding invisible; TopDocs.java:187-216 tie rule = lower doc id).

Random queries cover term/OR/AND/NOT/min-should/phrase(slop)/prefix
shapes — the grammar subset the query parser emits."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher

VOCAB = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta",
         "theta", "iota", "kappa", "lam", "mu"]


def _rand_query(rng) -> str:
    kind = rng.integers(0, 7)
    t = lambda: str(rng.choice(VOCAB))  # noqa: E731
    if kind == 0:
        return t()
    if kind == 1:
        return " OR ".join(t() for _ in range(int(rng.integers(2, 5))))
    if kind == 2:
        return " AND ".join(t() for _ in range(int(rng.integers(2, 4))))
    if kind == 3:
        return f"{t()} AND NOT {t()}"
    if kind == 4:  # min-should via parens group OR'd
        return f"({t()} OR {t()} OR {t()}) AND {t()}"
    if kind == 5:
        slop = int(rng.integers(0, 3))
        return f'"{t()} {t()}"~{slop}' if slop else f'"{t()} {t()}"'
    return t()[:3] + "*"


@pytest.fixture(scope="module", params=[5, 23])
def fuzz_indexes(request, tmp_path_factory, ray_session):
    seed = request.param
    rng = np.random.default_rng(seed)
    n = 250
    # zipf-ish frequencies so some terms are dense (WAND-prunable) and
    # some rare; repeats inside a doc exercise phrase/freq paths
    probs = 1.0 / np.arange(1, len(VOCAB) + 1)
    probs /= probs.sum()
    texts = [" ".join(rng.choice(VOCAB, size=rng.integers(4, 14), p=probs))
             for _ in range(n)]
    tmp = tmp_path_factory.mktemp(f"fuzz{seed}")
    p = str(tmp / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }), p)
    multi = str(tmp / "idx4")
    one = str(tmp / "idx1")
    build_index(p, multi, cfg=IndexBuildConfig(num_shards=4, num_buckets=8,
                                               batch_size=64))
    build_index(p, one, cfg=IndexBuildConfig(num_shards=1, num_buckets=8,
                                             batch_size=64))
    queries = [_rand_query(rng) for _ in range(40)]
    return multi, one, queries


def test_wand_parity_fuzz(fuzz_indexes):
    multi, _, queries = fuzz_indexes
    s = IndexSearcher(multi)
    for q in queries:
        a = s.search(q, k=10, use_wand="force")
        b = s.search(q, k=10, use_wand=False)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q


def test_shard_layout_parity_fuzz(fuzz_indexes):
    multi, one, queries = fuzz_indexes
    sm, so = IndexSearcher(multi), IndexSearcher(one)
    for q in queries:
        a = sm.search(q, k=10)
        b = so.search(q, k=10)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == pytest.approx(
            b["score"].to_pylist(), rel=1e-6), q


def test_parity_survives_random_deletes(fuzz_indexes, tmp_path_factory):
    """Random tombstones: WAND and shard-layout parity must hold with live
    filtering engaged (block-max bounds may cover dead docs — pruning must
    stay conservative, never wrong)."""
    import shutil

    from lucene_solr_ray.index.maintenance import delete_by_ids

    multi, one, queries = fuzz_indexes
    tmp = tmp_path_factory.mktemp("fuzz_del")
    m2, o2 = str(tmp / "m"), str(tmp / "o")
    shutil.copytree(multi, m2)
    shutil.copytree(one, o2)
    rng = np.random.default_rng(99)
    dead = rng.choice(250, size=40, replace=False).tolist()
    delete_by_ids(m2, dead)
    delete_by_ids(o2, dead)
    sm, so = IndexSearcher(m2), IndexSearcher(o2)
    for q in queries[:20]:
        a = sm.search(q, k=10, use_wand="force")
        b = sm.search(q, k=10, use_wand=False)
        c = so.search(q, k=10)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q
        assert b["doc_id"].to_pylist() == c["doc_id"].to_pylist(), q
        assert not set(a["doc_id"].to_pylist()) & set(dead), q
