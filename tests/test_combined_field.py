"""BM25FQuery / CombinedFieldQuery parity tests
(sandbox/search/BM25FQuery.java:58, MultiNormsLeafSimScorer.java:124-133)."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import CombinedField, Term
from lucene_solr_ray.util.smallfloat import byte4_to_int, int_to_byte4

DOCS = [
    # (title, body)
    ("ray data engine", "ray powers data pipelines and ray actors"),  # 0
    ("deep learning", "models learn from data"),                      # 1
    ("ray tracing", "light and shadow"),                              # 2
    ("", "ray ray ray everywhere"),                                   # 3
    ("data systems", "batch and stream processing"),                  # 4
]


@pytest.fixture(scope="module")
def cf_index(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("cf")
    p = str(tmp / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(DOCS), dtype=np.int64)),
        "text": pa.array(["x"] * len(DOCS), pa.string()),
        "title": pa.array([t for t, _ in DOCS], pa.string()),
        "body": pa.array([b for _, b in DOCS], pa.string()),
    }), p)
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4,
        analyzed_fields=(("title", "", ""), ("body", "", "")),
    ))
    return idx


def _bm25(freq, df, n, avgdl, dl_quant, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    inv = 1.0 / (k1 * ((1 - b) + b * dl_quant / avgdl))
    return idf - idf / (1.0 + freq * inv)


def test_combined_field_scores_hand_computed(cf_index):
    s = IndexSearcher(cf_index, dtype=np.float64)
    q = CombinedField((("title", 1.0), ("body", 2.0)), ("ray",))
    t = s.match_all(q)
    got = dict(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))

    titles = [d[0].split() if d[0] else [] for d in DOCS]
    bodies = [d[1].split() for d in DOCS]
    tf_t = [x.count("ray") for x in titles]
    tf_b = [x.count("ray") for x in bodies]
    # pseudo term stats: df = max over fields; collection: docCount = max,
    # sumTTF = sum of weighted field sums
    df = max(sum(1 for f in tf_t if f), sum(1 for f in tf_b if f))
    dc = max(sum(1 for x in titles if x), sum(1 for x in bodies if x))
    sttf = int(1.0 * sum(len(x) for x in titles)
               + 2.0 * sum(len(x) for x in bodies))
    avgdl = sttf / dc
    exp = {}
    for i in range(len(DOCS)):
        freq = 1.0 * tf_t[i] + 2.0 * tf_b[i]
        if freq == 0:
            continue
        # combined norm: weighted sum of per-field decoded norms, requantized
        nv = (1.0 * byte4_to_int(int_to_byte4(len(titles[i])))
              + 2.0 * byte4_to_int(int_to_byte4(len(bodies[i]))))
        dlq = byte4_to_int(int_to_byte4(int(math.floor(nv + 0.5))))
        exp[i] = _bm25(freq, df, dc, avgdl, dlq)
    assert sorted(got) == sorted(exp)
    for i in exp:
        assert got[i] == pytest.approx(exp[i], rel=1e-9), i


def test_combined_single_field_equals_term_query(cf_index):
    s = IndexSearcher(cf_index, dtype=np.float64)
    a = s.match_all(CombinedField((("title", 1.0),), ("data",)))
    b = s.match_all(Term("title:data"))
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    np.testing.assert_allclose(a["score"].to_pylist(), b["score"].to_pylist())


def test_combined_field_weight_below_one_rejected():
    with pytest.raises(ValueError, match="greater or equal to 1"):
        CombinedField((("title", 0.5),), ("ray",))


def test_combined_field_distributed_parity(cf_index):
    from lucene_solr_ray.search import DistributedSearcher

    q = CombinedField((("title", 1.0), ("body", 2.0)), ("ray", "data"))
    local = IndexSearcher(cf_index, dtype=np.float64).search(q, k=10)
    dist = DistributedSearcher(cf_index, num_actors=2,
                               dtype=np.float64).search(q, k=10)
    assert local["doc_id"].to_pylist() == dist["doc_id"].to_pylist()
    np.testing.assert_allclose(local["score"].to_pylist(),
                               dist["score"].to_pylist())


def test_combined_field_in_bool(cf_index):
    # composes as a clause like any scoring node
    from lucene_solr_ray.search.query import Bool

    s = IndexSearcher(cf_index, dtype=np.float64)
    cf = CombinedField((("title", 1.0), ("body", 1.0)), ("data",))
    both = s.match_all(Bool(should=[cf, Term("body:batch")]))
    only_cf = s.match_all(cf)
    only_t = s.match_all(Term("body:batch"))
    exp: dict = {}
    for tt in (only_cf, only_t):
        for d, sc in zip(tt["doc_id"].to_pylist(), tt["score"].to_pylist()):
            exp[d] = exp.get(d, 0.0) + sc
    got = dict(zip(both["doc_id"].to_pylist(), both["score"].to_pylist()))
    assert sorted(got) == sorted(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=1e-9)
