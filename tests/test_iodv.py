"""IndexOrDocValuesQuery planner: identical results on both paths, correct
cost-based choice, and a measured win for the docvalues-verify plan on a
selective lead (search/IndexOrDocValuesQuery.java:50 parity)."""

import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.executor import iodv_plan
from lucene_solr_ray.search.query import Bool, IndexOrDocValues, Term


N = 6000


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("iodv")
    rng = np.random.default_rng(11)
    langs = np.array(["en", "de", "fr"])[rng.integers(0, 3, N)]
    texts = []
    for i in range(N):
        words = [f"t{rng.integers(0, 2000)}" for _ in range(20)]
        if i % 1500 == 0:
            words.append("needleword")  # 4 docs: the selective lead
        texts.append(" ".join(words))
    p = str(d / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(N, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs.tolist(), pa.string()),
    }), p)
    out = str(d / "idx")
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4,
                           keyword_fields=("lang",),
                           string_docvalues_fields=("lang",))
    build_index(p, out, cfg=cfg)
    return out, dict(langs=langs, texts=texts)


def test_both_paths_identical(idx):
    out, meta = idx
    s = IndexSearcher(out, dtype=np.float64)
    via_iodv = s.match_all(Bool(must=[Term("needleword")],
                                filter=[IndexOrDocValues("lang", "en")]))
    via_term = s.match_all(Bool(must=[Term("needleword")],
                                filter=[Term("lang:en")]))
    assert via_iodv["doc_id"].to_pylist() == via_term["doc_id"].to_pylist()
    assert via_iodv["score"].to_pylist() == via_term["score"].to_pylist()
    exp = [i for i in range(0, N, 1500) if meta["langs"][i] == "en"]
    assert via_iodv["doc_id"].to_pylist() == exp


def test_standalone_iodv_matches_term(idx):
    out, meta = idx
    s = IndexSearcher(out)
    a = s.match_all(Bool(filter=[IndexOrDocValues("lang", "de")]))
    b = s.match_all(Bool(filter=[Term("lang:de")]))
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert len(a) == int(np.count_nonzero(meta["langs"] == "de"))


def test_plan_choice(idx):
    out, _ = idx
    s = IndexSearcher(out)
    sh = s.reader.shards[0]
    df_en = sh.term_stats("lang:en")[0]
    assert df_en > 100
    # a tiny candidate set beats decoding the big lang postings
    assert iodv_plan(sh, IndexOrDocValues("lang", "en"), 4) == "dv"
    # a candidate set larger than df prefers the postings decode
    assert iodv_plan(sh, IndexOrDocValues("lang", "en"), df_en + 1) == "postings"
    # field without docvalues always takes postings
    assert iodv_plan(sh, IndexOrDocValues("nodv", "x"), 1) == "postings"


def test_dv_verify_faster_on_selective_lead(idx):
    """Measured win: with a 4-doc lead, verifying via docvalues ordinals
    should not lose to decoding a ~2000-doc keyword posting list. The host
    is noisy, so assert a generous bound (<= 2x) over best-of-5 runs."""
    out, _ = idx
    s = IndexSearcher(out, dtype=np.float64)
    sh = s.reader.shards[0]
    docs, _f = sh.postings("needleword")
    node = IndexOrDocValues("lang", "en")

    def best_of(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    from lucene_solr_ray.search.executor import _iodv_dv_mask

    def dv_path():
        _iodv_dv_mask(sh, node, docs)

    def postings_path():
        sh._cache.clear()  # decode cost is the point; defeat the LRU
        fd, _ = sh.postings("lang:en")
        np.isin(docs, fd, assume_unique=True)

    t_dv = best_of(dv_path)
    t_post = best_of(postings_path)
    assert t_dv <= 2.0 * t_post, (t_dv, t_post)


def test_iodv_respects_deletes(idx, tmp_path):
    from lucene_solr_ray.index.maintenance import delete_by_ids

    out, meta = idx
    s0 = IndexSearcher(out)
    before = s0.match_all(Bool(filter=[IndexOrDocValues("lang", "fr")]))
    kill = before["doc_id"].to_pylist()[:3]
    delete_by_ids(out, kill)
    s1 = IndexSearcher(out)
    after = s1.match_all(Bool(filter=[IndexOrDocValues("lang", "fr")]))
    assert len(after) == len(before) - 3
    assert not (set(kill) & set(after["doc_id"].to_pylist()))
