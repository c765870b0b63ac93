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


@pytest.fixture(scope="module")
def fvh_idx(tmp_path_factory, ray_session):
    """Index with BOTH offsets-in-postings and positions+offsets term
    vectors, so the two highlighters can be compared on shared cases."""
    d = str(tmp_path_factory.mktemp("fvh_idx"))
    build_index(DOCS, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=3, num_buckets=4,
                                     store_offsets=True))
    build_term_vectors(DOCS, d, num_shards=3, with_positions_offsets=True)
    return d


def test_tv_positions_offsets_roundtrip(fvh_idx):
    from lucene_solr_ray.index.termvectors import term_vectors_po_for

    texts = pq.read_table(DOCS, columns=["doc_id", "text"])
    lookup = dict(zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()))
    tvs = term_vectors_po_for(fvh_idx, [0, 7], num_shards=3)
    for doc in (0, 7):
        toks = lookup[doc].split()
        per_term = tvs[doc]
        # every token occurrence accounted for, offsets slice the text back
        for t, (poss, offs) in per_term.items():
            want_pos = [i for i, w in enumerate(toks) if w == t]
            assert poss.tolist() == want_pos, (doc, t)
            for o in offs.tolist():
                s, e = o >> 32, o & 0xFFFFFFFF
                assert lookup[doc][s:e] == t


def test_fvh_matches_offsets_highlighter(fvh_idx):
    """FastVectorHighlighter parity: identical snippets to the
    postings-offsets source on shared term + phrase cases."""
    from lucene_solr_ray.search.services import (
        highlight_results_offsets,
        highlight_results_tv,
    )

    s = IndexSearcher(fvh_idx, dtype=np.float64)
    for q in ("fast", "fast AND query", '"fast query"', "fast OR slow"):
        a = highlight_results_offsets(s, DOCS, "doc_id", "text", q, k=8)
        b = highlight_results_tv(s, fvh_idx, DOCS, "doc_id", "text", q, k=8)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["snippet"].to_pylist() == b["snippet"].to_pylist(), q


def test_fvh_requires_po_sidecar(idx):
    from lucene_solr_ray.index.termvectors import term_vectors_po_for

    with pytest.raises(ValueError, match="with_positions_offsets"):
        term_vectors_po_for(idx, [0], num_shards=3)


def test_fvh_zero_hits(fvh_idx):
    """A query matching nothing must return an empty result, not crash on
    the empty shard read."""
    from lucene_solr_ray.search.services import highlight_results_tv

    s = IndexSearcher(fvh_idx, dtype=np.float64)
    out = highlight_results_tv(s, fvh_idx, DOCS, "doc_id", "text",
                               "zzzznomatch", k=5)
    assert out.num_rows == 0


def test_highlighters_expand_multiterm(fvh_idx):
    """'fa*' must highlight the matched surface forms (UnifiedHighlighter
    MultiTermHighlighting role) in BOTH highlighters, with parity."""
    from lucene_solr_ray.search.services import (
        highlight_results_offsets,
        highlight_results_tv,
    )

    s = IndexSearcher(fvh_idx, dtype=np.float64)
    a = highlight_results_offsets(s, DOCS, "doc_id", "text", "fa*", k=5)
    b = highlight_results_tv(s, fvh_idx, DOCS, "doc_id", "text", "fa*", k=5)
    assert a.num_rows > 0
    assert all("<b>" in sn for sn in a["snippet"].to_pylist())
    assert a["snippet"].to_pylist() == b["snippet"].to_pylist()
