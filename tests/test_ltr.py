"""LTR contrib (solr/contrib/ltr): feature extraction, normalizers, and
Linear / MultipleAdditiveTrees / NeuralNetwork models — hand parity plus
Solr managed-store JSON loading."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.ltr import (FieldLengthFeature,
                                        FieldValueFeature, LinearModel,
                                        MinMaxNormalizer,
                                        OriginalScoreFeature, SolrFeature,
                                        StandardNormalizer, ValueFeature,
                                        extract_features, load_features,
                                        load_model, load_normalizers,
                                        ltr_rescore)
from lucene_solr_ray.util.smallfloat import LENGTH_TABLE, int_to_byte4_vec

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("ltr_idx"))
    build_index(DOCS, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=3, num_buckets=4,
                                     docvalues_fields=("n_chars",)))
    return IndexSearcher(d, dtype=np.float64)


@pytest.fixture(scope="module")
def meta():
    t = pq.read_table(DOCS, columns=["doc_id", "n_chars", "text"])
    nch = dict(zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()))
    dl = {d: len(s.split(" ")) for d, s in
          zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
    return nch, dl


FEATS = [OriginalScoreFeature(), FieldValueFeature("nch", "n_chars"),
         FieldLengthFeature("flen")]


def test_feature_extraction(searcher, meta):
    nch, dl = meta
    first = searcher.search("fast", k=20)
    docs = first["doc_id"].to_numpy().astype(np.int64)
    orig = first["score"].to_numpy().astype(np.float64)
    f = extract_features(searcher, docs, orig, FEATS)
    assert np.allclose(f["originalScore"], orig)
    assert [f["nch"][i] for i in range(len(docs))] == \
        [float(nch[int(d)]) for d in docs]
    want_flen = [float(LENGTH_TABLE[int_to_byte4_vec(
        np.array([dl[int(d)]]))[0]]) for d in docs]
    assert list(f["flen"]) == want_flen


def test_linear_rescore_hand(searcher, meta):
    nch, _ = meta
    model = LinearModel((("originalScore", 2.0), ("nch", 0.001)))
    got = ltr_rescore(searcher, "fast", model,
                      [OriginalScoreFeature(),
                       FieldValueFeature("nch", "n_chars")],
                      rerank_docs=30, k=10)
    first = searcher.search("fast", k=30)
    hand = sorted(
        [(-(2.0 * s + 0.001 * nch[int(d)]), d) for d, s in
         zip(first["doc_id"].to_pylist(), first["score"].to_pylist())])
    want = [(d, -s) for s, d in hand[:10]]
    assert got["doc_id"].to_pylist() == [d for d, _ in want]
    assert got["ltr_score"].to_pylist() == pytest.approx(
        [s for _, s in want])


def test_solr_feature(searcher):
    first = searcher.search("fast", k=15)
    docs = first["doc_id"].to_numpy().astype(np.int64)
    orig = first["score"].to_numpy().astype(np.float64)
    f = extract_features(searcher, docs, orig, [SolrFeature("q2", "query")])
    t = searcher.match_all("query")
    sc = dict(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))
    assert list(f["q2"]) == [sc.get(int(d), 0.0) for d in docs]


def test_value_feature_efi():
    from lucene_solr_ray.search.ltr import ValueFeature

    ctx = {"docs": np.arange(3), "efi": {"boostA": "2.5"}}
    assert list(ValueFeature("c", 7.0).extract(ctx)) == [7.0] * 3
    assert list(ValueFeature("p", "${boostA}").extract(ctx)) == [2.5] * 3
    assert list(ValueFeature("m", "${nope}").extract(ctx)) == [0.0] * 3
    with pytest.raises(ValueError):
        ValueFeature("m", "${nope}", required=True).extract(ctx)


def test_normalizers():
    v = np.array([-5.0, 5.0, 55.0])
    # MinMaxNormalizer.java:33-35 examples
    assert list(MinMaxNormalizer(0, 50).normalize(v)) == \
        pytest.approx([-0.1, 0.1, 1.1])
    # StandardNormalizer.java:34-36 examples
    assert list(StandardNormalizer(42, 6).normalize(
        np.array([39.0, 42.0, 45.0]))) == pytest.approx([-0.5, 0.0, 0.5])


TREE_MODEL = {
    "class": "org.apache.solr.ltr.model.MultipleAdditiveTreesModel",
    "features": [{"name": "a"}, {"name": "b"}],
    "params": {"trees": [
        {"weight": 1.0, "root": {
            "feature": "a", "threshold": "0.5",
            "left": {"value": "10"},
            "right": {"feature": "b", "threshold": "2.0",
                      "left": {"value": "20"}, "right": {"value": "30"}}}},
        {"weight": 2.0, "root": {
            "feature": "b", "threshold": "1.0",
            "left": {"value": "-1"}, "right": {"value": "1"}}},
    ]},
}


def test_trees_hand():
    model = load_model(TREE_MODEL)
    feats = {"a": np.array([0.3, 0.5, 0.9, 0.9]),
             "b": np.array([0.0, 5.0, 2.0, 2.1])}

    def one(a, b):
        t1 = 10 if a <= 0.5 + 1e-6 else (20 if b <= 2.0 + 1e-6 else 30)
        t2 = -1 if b <= 1.0 + 1e-6 else 1
        return 1.0 * t1 + 2.0 * t2

    want = [one(a, b) for a, b in zip(feats["a"], feats["b"])]
    assert list(model.score(feats)) == pytest.approx(want)
    # threshold equality goes LEFT (<=), incl. the slack bump
    assert model.score({"a": np.array([0.5]),
                        "b": np.array([0.0])})[0] == pytest.approx(8.0)


def test_neural_network():
    spec = {
        "class": "org.apache.solr.ltr.model.NeuralNetworkModel",
        "features": [{"name": "x"}, {"name": "y"}],
        "params": {"layers": [
            {"matrix": [[1.0, -1.0], [0.5, 0.5]], "bias": [0.0, 1.0],
             "activation": "relu"},
            {"matrix": [[1.0, 2.0]], "bias": [0.5],
             "activation": "identity"},
        ]},
    }
    model = load_model(spec)
    mat = np.array([[3.0, 1.0], [1.0, 4.0]])  # rows = docs (x, y)
    # doc0: h = relu([3-1, .5*4+1]) = [2,3] -> 2 + 6 + .5 = 8.5
    # doc1: h = relu([1-4, .5*5+1]) = [0,3.5] -> 0 + 7 + .5 = 7.5
    assert list(model.score_matrix(mat)) == pytest.approx([8.5, 7.5])


def test_json_store_round_trip(searcher):
    feats = load_features([
        {"name": "originalScore",
         "class": "org.apache.solr.ltr.feature.OriginalScoreFeature"},
        {"name": "nch",
         "class": "org.apache.solr.ltr.feature.FieldValueFeature",
         "params": {"field": "n_chars"}},
        {"name": "boost",
         "class": "org.apache.solr.ltr.feature.ValueFeature",
         "params": {"value": "${userBoost}", "required": False}},
    ])
    spec = {
        "class": "org.apache.solr.ltr.model.LinearModel",
        "features": [
            {"name": "originalScore"},
            {"name": "nch",
             "norm": {"class": "org.apache.solr.ltr.norm.MinMaxNormalizer",
                      "params": {"min": "0", "max": "1000"}}},
            {"name": "boost"},
        ],
        "params": {"weights": {"originalScore": 1.0, "nch": 0.5,
                               "boost": 2.0}},
    }
    model = load_model(spec)
    norms = load_normalizers(spec)
    got = ltr_rescore(searcher, "fast", model, feats, rerank_docs=20,
                      k=5, normalizers=norms, efi={"userBoost": "3"})
    assert len(got) == 5
    # ltr = orig + 0.5*(nch/1000) + 2*3
    first = searcher.search("fast", k=20)
    t = pq.read_table(DOCS, columns=["doc_id", "n_chars"])
    nch = dict(zip(t["doc_id"].to_pylist(), t["n_chars"].to_pylist()))
    hand = sorted(
        [(-(s + 0.5 * nch[int(d)] / 1000 + 6.0), d) for d, s in
         zip(first["doc_id"].to_pylist(), first["score"].to_pylist())])
    assert got["doc_id"].to_pylist() == [d for _, d in hand[:5]]
    assert got["ltr_score"].to_pylist() == pytest.approx(
        [-s for s, _ in hand[:5]])


def test_missing_weight_raises():
    with pytest.raises(ValueError):
        load_model({
            "class": "org.apache.solr.ltr.model.LinearModel",
            "features": [{"name": "a"}, {"name": "b"}],
            "params": {"weights": {"a": 1.0}},
        })
