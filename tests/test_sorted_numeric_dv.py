"""SORTED_NUMERIC docvalues: multi-valued numeric sidecar
(DocValuesType.SORTED_NUMERIC). Build stores per-doc ascending float64
lists; newSlowRangeQuery-style filters match docs with ANY value in range;
sort-by-field reduces per doc with a MIN/MAX selector
(SortedNumericSelector.java:34)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.reader import IndexReader
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import Bool, SortedNumericRange, Term
from lucene_solr_ray.search.services import search_sorted_by_field

N = 400


@pytest.fixture(scope="module")
def sndv_index(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("sndv")
    rng = np.random.default_rng(7)
    texts, prices = [], []
    for i in range(N):
        words = ["item"] + (["query"] if i % 3 == 0 else ["other"])
        texts.append(" ".join(words))
        k = int(rng.integers(0, 4))  # 0..3 values; some docs have none
        prices.append(sorted(rng.integers(1, 1000, size=k).astype(float).tolist()))
    p = str(tmp / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(N, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "price": pa.array(prices, pa.list_(pa.float64())),
    }), p)
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4,
        sorted_numeric_docvalues_fields=("price",)))
    return idx, prices


def test_sndv_roundtrip(sndv_index):
    idx, prices = sndv_index
    r = IndexReader(idx)
    got = {}
    for s in r.shards:
        vals, offs = s.sorted_numeric_dv["price"]
        for j, d in enumerate(s.doc_ids):
            got[int(d)] = vals[offs[j]:offs[j + 1]].tolist()
    assert len(got) == N
    for i, want in enumerate(prices):
        assert got[i] == want, i


def test_sndv_range_filter_any_value(sndv_index):
    idx, prices = sndv_index
    s = IndexSearcher(idx)
    node = Bool(must=[Term("query")],
                filter=[SortedNumericRange("price", lo=100, hi=200)])
    t = s.match_all(node)
    got = set(t["doc_id"].to_pylist())
    want = {i for i in range(N)
            if i % 3 == 0 and any(100 <= v <= 200 for v in prices[i])}
    assert got == want
    assert want  # fixture actually exercises the filter


def test_sndv_sort_min_max_selector(sndv_index):
    idx, prices = sndv_index
    s = IndexSearcher(idx)
    docs_with = [i for i in range(N) if i % 3 == 0 and prices[i]]
    empty = [i for i in range(N) if i % 3 == 0 and not prices[i]]

    t = search_sorted_by_field(s, "query", "price", k=5,
                               descending=False, selector="min")
    want = sorted(docs_with, key=lambda i: (min(prices[i]), i))[:5]
    assert t["doc_id"].to_pylist() == want
    assert t["price"].to_pylist() == [min(prices[i]) for i in want]

    t = search_sorted_by_field(s, "query", "price", k=5,
                               descending=True, selector="max")
    want = sorted(docs_with, key=lambda i: (-max(prices[i]), i))[:5]
    assert t["doc_id"].to_pylist() == want

    # docs with no values sort last in both directions
    k_all = len(docs_with) + len(empty)
    t = search_sorted_by_field(s, "query", "price", k=k_all,
                               descending=False, selector="min")
    tail = t["doc_id"].to_pylist()[len(docs_with):]
    assert set(tail) == set(empty)
    t = search_sorted_by_field(s, "query", "price", k=k_all,
                               descending=True, selector="max")
    tail = t["doc_id"].to_pylist()[len(docs_with):]
    assert set(tail) == set(empty)


def test_sndv_survives_append(sndv_index, tmp_path):
    import shutil

    from lucene_solr_ray.index.maintenance import append_index

    idx, prices = sndv_index
    idx2 = str(tmp_path / "idx2")
    shutil.copytree(idx, idx2)
    p2 = str(tmp_path / "more.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(N, N + 10, dtype=np.int64)),
        "text": pa.array(["query appended"] * 10, pa.string()),
        "price": pa.array([[5.0, 50.0]] * 10, pa.list_(pa.float64())),
    }), p2)
    append_index(idx2, p2)
    s = IndexSearcher(idx2)
    node = Bool(must=[Term("query")],
                filter=[SortedNumericRange("price", lo=5, hi=5)])
    t = s.match_all(node)
    assert set(t["doc_id"].to_pylist()) == set(range(N, N + 10))
