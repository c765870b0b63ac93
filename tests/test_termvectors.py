"""Term-vector sidecar (Lucene50TermVectorsFormat role): build, pruned
lookup, and MoreLikeThis-from-vectors parity with the re-analyze path."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.termvectors import (
    build_term_vectors,
    more_like_this_tv,
    term_vector,
    term_vectors_for,
)
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.services import more_like_this

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("tv_idx"))
    build_index(DOCS, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=3, num_buckets=4))
    build_term_vectors(DOCS, d, num_shards=3)
    return d


def test_term_vector_matches_brute_force(idx):
    texts = pq.read_table(DOCS, columns=["doc_id", "text"])
    lookup = dict(zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()))
    for doc in (0, 7, 42):
        tv = term_vector(idx, doc, num_shards=3)
        got = dict(zip(tv["term"].to_pylist(), tv["freq"].to_pylist()))
        toks = lookup[doc].split()
        want: dict[str, int] = {}
        for t in toks:
            want[t] = want.get(t, 0) + 1
        assert got == want, doc


def test_term_vectors_for_many(idx):
    t = term_vectors_for(idx, [3, 1, 2], num_shards=3)
    ids = t["doc_id"].to_pylist()
    assert sorted(set(ids)) == [1, 2, 3]
    assert ids == sorted(ids)
    # unpartitioned read agrees
    t2 = term_vectors_for(idx, [3, 1, 2])
    assert t2.equals(t)


def test_mlt_from_tv_matches_reanalyze(idx):
    s = IndexSearcher(idx, dtype=np.float64)
    texts = pq.read_table(DOCS, columns=["doc_id", "text"])
    lookup = dict(zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()))
    for doc in (5, 17):
        res_tv, terms = more_like_this_tv(s, idx, doc, max_terms=8, k=10)
        res_txt = more_like_this(s, lookup[doc], max_terms=8, k=10)
        assert res_tv["doc_id"].to_pylist() == res_txt["doc_id"].to_pylist()
        assert res_tv["score"].to_pylist() == pytest.approx(
            res_txt["score"].to_pylist())


def test_missing_doc_empty(idx):
    tv = term_vector(idx, 10_000_000, num_shards=3)
    assert tv.num_rows == 0
