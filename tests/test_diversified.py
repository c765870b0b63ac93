"""DiversifiedTopDocsCollector (lucene/misc) — brute-force parity."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.services import diversified_top_k

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("div_idx"))
    build_index(DOCS, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=3, num_buckets=4,
                                     string_docvalues_fields=("lang",)))
    return IndexSearcher(d, dtype=np.float64)


def brute(searcher, query, k, mhpk):
    t = searcher.match_all(query)
    meta = pq.read_table(DOCS, columns=["doc_id", "lang"])
    lang = dict(zip(meta["doc_id"].to_pylist(), meta["lang"].to_pylist()))
    rows = sorted(
        [(-s, d, lang[d]) for d, s in zip(t["doc_id"].to_pylist(),
                                          t["score"].to_pylist())])
    quota, out = {}, []
    for ns, d, g in rows:
        if quota.get(g, 0) < mhpk:
            quota[g] = quota.get(g, 0) + 1
            out.append((d, g, -ns))
            if len(out) == k:
                break
    return out


@pytest.mark.parametrize("query,k,mhpk", [
    ("fast", 5, 1), ("fast OR query", 10, 2), ("merge", 8, 3),
])
def test_matches_brute(searcher, query, k, mhpk):
    got = diversified_top_k(searcher, query, "lang", k=k,
                            max_hits_per_key=mhpk)
    rows = list(zip(got["doc_id"].to_pylist(), got["key"].to_pylist(),
                    got["score"].to_pylist()))
    want = brute(searcher, query, k, mhpk)
    assert [(d, g) for d, g, _ in rows] == [(d, g) for d, g, _ in want]
    assert [s for _, _, s in rows] == pytest.approx(
        [s for _, _, s in want])
    # the diversity constraint holds
    from collections import Counter

    assert max(Counter(g for _, g, _ in rows).values()) <= mhpk


def test_no_matches(searcher):
    assert len(diversified_top_k(searcher, "zzzznotaterm", "lang")) == 0
