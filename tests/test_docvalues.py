import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import Bool, NumericRange, Term
from lucene_solr_ray.search.services import search_sorted_by_field

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("dv_idx"))
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4,
                           docvalues_fields=("n_chars",))
    build_index(DOCS, d, key_col="doc_id", text_col="text", cfg=cfg)
    return d


@pytest.fixture(scope="module")
def raw():
    return pq.read_table(DOCS, columns=["doc_id", "text", "n_chars"]).to_pandas()


def test_docvalues_stored_and_loaded(idx, raw):
    s = IndexSearcher(idx)
    vals = {}
    for sh in s.reader.shards:
        assert "n_chars" in sh.docvalues
        for d, v in zip(sh.doc_ids.tolist(), sh.docvalues["n_chars"].tolist()):
            vals[d] = v
    exp = dict(zip(raw["doc_id"], raw["n_chars"]))
    assert vals == {k: float(v) for k, v in exp.items()}


def test_docvalues_range_filter(idx, raw):
    s = IndexSearcher(idx)
    node = Bool(must=[Term("fast")], filter=[NumericRange("n_chars", 100, 300)])
    got = s.match_all(node)["doc_id"].to_pylist()
    exp = sorted(
        raw[
            raw.text.str.split(" ").map(lambda w: "fast" in w)
            & raw.n_chars.between(100, 300)
        ]["doc_id"]
    )
    assert got == exp


def test_docvalues_sort(idx, raw):
    s = IndexSearcher(idx)
    out = search_sorted_by_field(s, "fast", "n_chars", k=10, descending=True)
    vals = out["n_chars"].to_pylist()
    assert vals == sorted(vals, reverse=True)
    lookup = dict(zip(raw["doc_id"], raw["n_chars"]))
    for d, v in zip(out["doc_id"].to_pylist(), vals):
        assert lookup[d] == v


def test_append_preserves_docvalues_and_keywords(tmp_path, ray_session):
    import glob

    from lucene_solr_ray.index.maintenance import append_index
    from lucene_solr_ray.pipelines import synthesize_corpus
    from lucene_solr_ray.search.query import parse_query

    d = synthesize_corpus(400, str(tmp_path / "c"), n_files=2)
    files = sorted(glob.glob(d + "/*.parquet"))
    idx = str(tmp_path / "idx")
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4, files_per_chunk=1,
                           keyword_fields=("lang",), docvalues_fields=("doc_id",))
    build_index(files[:1], idx, key_col="doc_id", text_col="text", cfg=cfg)
    append_index(idx, files[1:])
    s = IndexSearcher(idx)
    # keyword field works across generations
    n_en = s.count(parse_query("lang:en"))
    t = pq.read_table(d, columns=["lang"])
    assert n_en == sum(1 for x in t["lang"].to_pylist() if x == "en")
    # docvalues present in delta shards too
    total = sum(len(sh.docvalues.get("doc_id", [])) for sh in s.reader.shards)
    assert total == 400
