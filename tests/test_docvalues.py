import numpy as np
import pyarrow as pa
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


@pytest.fixture(scope="module")
def sidx(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("sdv_idx"))
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4,
                           string_docvalues_fields=("lang", "source"))
    build_index(DOCS, d, key_col="doc_id", text_col="text", cfg=cfg)
    return d


def test_sorted_docvalues_sort(sidx):
    raw = pq.read_table(DOCS, columns=["doc_id", "text", "lang"]).to_pandas()
    s = IndexSearcher(sidx)
    out = search_sorted_by_field(s, "fast", "lang", k=10, descending=False)
    hits = raw[raw.text.str.split(" ").map(lambda w: "fast" in w)]
    exp = hits.sort_values(["lang", "doc_id"]).head(10)
    assert out["doc_id"].to_pylist() == exp["doc_id"].tolist()
    assert out["lang"].to_pylist() == exp["lang"].tolist()
    # descending too
    out_d = search_sorted_by_field(s, "fast", "lang", k=10, descending=True)
    exp_d = hits.sort_values(["lang", "doc_id"], ascending=[False, True]).head(10)
    assert out_d["doc_id"].to_pylist() == exp_d["doc_id"].tolist()


def test_sorted_docvalues_facet(sidx):
    from lucene_solr_ray.search.services import facet_string_docvalues

    raw = pq.read_table(DOCS, columns=["doc_id", "text", "lang"]).to_pandas()
    out = facet_string_docvalues(sidx, "lang").to_pandas()
    exp = raw["lang"].value_counts()
    assert dict(zip(out["value"], out["cnt"])) == exp.to_dict()
    # query-constrained facet counts only matching docs
    out_q = facet_string_docvalues(sidx, "lang", query="fast").to_pandas()
    hits = raw[raw.text.str.split(" ").map(lambda w: "fast" in w)]
    assert dict(zip(out_q["value"], out_q["cnt"])) == hits["lang"].value_counts().to_dict()


def test_sorted_docvalues_survive_merge(tmp_path, ray_session):
    from lucene_solr_ray.index.maintenance import delete_by_ids, force_merge
    from lucene_solr_ray.search.services import facet_string_docvalues

    idx = str(tmp_path / "sdv_m")
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4,
                           string_docvalues_fields=("lang",))
    build_index(DOCS, idx, key_col="doc_id", text_col="text", cfg=cfg)
    raw = pq.read_table(DOCS, columns=["doc_id", "lang"]).to_pandas()
    kill = raw["doc_id"].tolist()[:25]
    delete_by_ids(idx, kill)
    # facet excludes tombstoned docs before the merge...
    live = raw[~raw.doc_id.isin(kill)]
    out = facet_string_docvalues(idx, "lang").to_pandas()
    assert dict(zip(out["value"], out["cnt"])) == live["lang"].value_counts().to_dict()
    # ...and the encoded merge carries the sdv column through
    force_merge(idx)
    out2 = facet_string_docvalues(idx, "lang").to_pandas()
    assert dict(zip(out2["value"], out2["cnt"])) == live["lang"].value_counts().to_dict()
    s = IndexSearcher(idx)
    assert any("lang" in sh.sorted_dv for sh in s.reader.shards)


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


def test_sorted_facet_skips_missing_values(tmp_path, ray_session):
    """Docs with a null SORTED value ('' sentinel at build) must not form
    an empty-string facet bucket — SortedSetDocValuesFacetCounts counts
    only docs with ords."""
    from lucene_solr_ray.search.services import facet_string_docvalues

    p = str(tmp_path / "c.parquet")
    langs = ["en", None, "de", None, "en", None, None, "fr"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(8, dtype=np.int64)),
        "text": pa.array([f"fast doc{i}" for i in range(8)], pa.string()),
        "lang": pa.array(langs, pa.string()),
    }), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=1, num_buckets=4, string_docvalues_fields=("lang",)))
    out = facet_string_docvalues(idx, "lang").to_pandas()
    assert dict(zip(out["value"], out["cnt"])) == {"en": 2, "de": 1, "fr": 1}
    assert "" not in set(out["value"])
