"""SORTED_SET (multi-valued string) docvalues (reference:
index/DocValuesType.java SORTED_SET, Lucene80DocValuesFormat.java:66-132,
SortedSetDocValuesFacetCounts.java:66, sandbox DocValuesTermsQuery.java:71):
per-doc value SETS stored as a shared value dictionary + per-doc ord list,
facetable and set-filterable off the index without touching the corpus."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import Bool, SortedSetContains, Term

POOL = ["news", "blog", "wiki", "forum", "docs", "mail"]


def _make_corpus(tmp, n=240):
    rng = np.random.default_rng(11)
    vocab = ["fast", "slow", "query", "table", "index"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(3, 9))))
             for _ in range(n)]
    # variable-size tag sets incl. empties and in-row duplicates (the build
    # must dedupe + sort per doc)
    tags = []
    for i in range(n):
        k = int(rng.integers(0, 4))
        t = list(rng.choice(POOL, size=k))
        if k and i % 7 == 0:
            t.append(t[0])  # duplicate value in the input row
        tags.append(t)
    p = str(tmp / "c.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "tags": pa.array(tags, pa.list_(pa.string())),
        }), p)
    return p, texts, tags


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("ssdv")
    p, texts, tags = _make_corpus(tmp)
    d = str(tmp / "idx")
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4,
                           sorted_set_docvalues_fields=("tags",))
    build_index(p, d, cfg=cfg)
    return d, texts, tags


def test_per_doc_sets_roundtrip(idx):
    d, texts, tags = idx
    s = IndexSearcher(d)
    got = {}
    for sh in s.reader.shards:
        assert "tags" in sh.sorted_set_dv
        u, ords, offs = sh.sorted_set_dv["tags"]
        # ords are increasing within each doc (the SORTED_SET contract)
        for i, doc in enumerate(sh.doc_ids.tolist()):
            o = ords[offs[i]:offs[i + 1]]
            assert list(o) == sorted(set(o.tolist()))
            got[doc] = sorted(u[o].tolist())
    exp = {i: sorted(set(t)) for i, t in enumerate(tags)}
    assert got == exp


def test_sorted_set_facet_counts(idx):
    from lucene_solr_ray.search.services import facet_sorted_set_docvalues

    d, texts, tags = idx
    out = facet_sorted_set_docvalues(d, "tags").to_pandas()
    exp: dict = {}
    for t in tags:
        for v in set(t):
            exp[v] = exp.get(v, 0) + 1
    assert dict(zip(out["value"], out["cnt"])) == exp
    # ordering contract: cnt desc, value asc
    rows = list(zip(out["cnt"], out["value"]))
    assert rows == sorted(rows, key=lambda r: (-r[0], r[1]))


def test_sorted_set_facet_query_constrained(idx):
    from lucene_solr_ray.search.services import facet_sorted_set_docvalues

    d, texts, tags = idx
    out = facet_sorted_set_docvalues(d, "tags", query="fast").to_pandas()
    exp: dict = {}
    for txt, t in zip(texts, tags):
        if "fast" in txt.split():
            for v in set(t):
                exp[v] = exp.get(v, 0) + 1
    assert dict(zip(out["value"], out["cnt"])) == exp


def test_sorted_set_contains_filter(idx):
    d, texts, tags = idx
    s = IndexSearcher(d)
    want = ("wiki", "mail")
    got = s.match_all(SortedSetContains("tags", want))["doc_id"].to_pylist()
    exp = sorted(i for i, t in enumerate(tags) if set(t) & set(want))
    assert got == exp
    # unknown values match nothing; empty intersection matches nothing
    assert s.match_all(SortedSetContains("tags", ("nope",)))["doc_id"].to_pylist() == []
    # as a Bool filter alongside a scored must clause
    node = Bool(must=[Term("fast")], filter=[SortedSetContains("tags", want)])
    got_b = s.match_all(node)["doc_id"].to_pylist()
    exp_b = sorted(i for i, (txt, t) in enumerate(zip(texts, tags))
                   if "fast" in txt.split() and set(t) & set(want))
    assert got_b == exp_b


def test_sorted_set_survives_delete_and_merge(tmp_path, ray_session):
    from lucene_solr_ray.index.maintenance import delete_by_ids, force_merge
    from lucene_solr_ray.search.services import facet_sorted_set_docvalues

    p, texts, tags = _make_corpus(tmp_path, n=120)
    d = str(tmp_path / "idx")
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4,
                           sorted_set_docvalues_fields=("tags",))
    build_index(p, d, cfg=cfg)
    kill = list(range(0, 30))
    delete_by_ids(d, kill)

    def counts(tag_rows):
        e: dict = {}
        for t in tag_rows:
            for v in set(t):
                e[v] = e.get(v, 0) + 1
        return e

    live = [t for i, t in enumerate(tags) if i not in set(kill)]
    out = facet_sorted_set_docvalues(d, "tags").to_pandas()
    assert dict(zip(out["value"], out["cnt"])) == counts(live)
    force_merge(d)
    out2 = facet_sorted_set_docvalues(d, "tags").to_pandas()
    assert dict(zip(out2["value"], out2["cnt"])) == counts(live)
    s = IndexSearcher(d)
    assert any("tags" in sh.sorted_set_dv for sh in s.reader.shards)
