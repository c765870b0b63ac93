"""Expression-compiled function scoring and the suggester extensions
(expressions/js/JavascriptCompiler.java:77, FunctionScoreQuery.java:46,
AnalyzingInfixSuggester.java:106, AnalyzingSuggester.java:121 roles)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.expressions import compile_expression
from lucene_solr_ray.search.query import FunctionScore, Term


def test_compile_arithmetic():
    fn = compile_expression("score * 2 + log1p(pop) - min(a, b)")
    env = {"score": np.array([1.0, 2.0]), "pop": np.array([0.0, np.e - 1]),
           "a": np.array([5.0, 1.0]), "b": np.array([3.0, 4.0])}
    out = fn(env)
    assert np.allclose(out, [1 * 2 + 0 - 3, 2 * 2 + 1 - 1])
    assert fn.variables == {"score", "pop", "a", "b"}


def test_compile_rejects_unsafe():
    for bad in ("__import__('os')", "a.b", "x[0]", "lambda: 1",
                "open('f')", "'str'", "a if b else c"):
        with pytest.raises(ValueError):
            compile_expression(bad)
    with pytest.raises(KeyError):
        compile_expression("nosuchvar + 1")({"x": np.ones(1)})


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = tmp_path_factory.mktemp("fs")
    n = 50
    pop = (np.arange(n) % 7).astype(np.float64)
    p = str(d / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array([f"apple w{i % 11} pie crumble" for i in range(n)]),
        "pop": pa.array(pop, pa.float64()),
    }), p)
    out = str(d / "idx")
    build_index(p, out, cfg=IndexBuildConfig(num_shards=2, num_buckets=4,
                                             docvalues_fields=("pop",)))
    return out, pop


def test_function_score_query(idx):
    out, pop = idx
    s = IndexSearcher(out, dtype=np.float64)
    base = s.match_all(Term("apple"))
    shaped = s.match_all(FunctionScore(Term("apple"), "score * log1p(pop)"))
    b = dict(zip(base["doc_id"].to_pylist(), base["score"].to_pylist()))
    got = dict(zip(shaped["doc_id"].to_pylist(), shaped["score"].to_pylist()))
    assert set(got) == set(b)
    for d, v in got.items():
        assert v == pytest.approx(b[d] * np.log1p(pop[d]), rel=1e-9)


def test_function_score_reorders_topk(idx):
    out, pop = idx
    s = IndexSearcher(out, dtype=np.float64)
    top = s.search(FunctionScore(Term("apple"), "score * pop"), k=5)
    # BM25 over identical-length docs is flat; pop drives the order
    assert all(pop[d] == 6.0 for d in top["doc_id"].to_pylist())


def test_distance_feature_query(idx):
    """LongDistanceFeatureQuery.java:43 semantics: matches every live doc
    with the field, scored weight * pivot / (pivot + |v - origin|); as a
    should clause it adds to the must clause's BM25."""
    from lucene_solr_ray.search.query import Bool, DistanceFeature

    out, pop = idx
    s = IndexSearcher(out, dtype=np.float64)
    feat = DistanceFeature("pop", origin=3.0, pivot=2.0, weight=1.5)
    alone = s.match_all(feat)
    assert len(alone) == len(pop)  # every doc carries the field
    got = dict(zip(alone["doc_id"].to_pylist(), alone["score"].to_pylist()))
    for d, v in got.items():
        assert v == pytest.approx(1.5 * 2.0 / (2.0 + abs(pop[d] - 3.0)),
                                  rel=1e-12)
    # top hits are exactly the pop==3 docs (distance 0)
    top = s.search(feat, k=len(pop))
    best = max(got.values())
    exact = {d for d, v in got.items() if v == best}
    assert {d for d, v in zip(top["doc_id"].to_pylist(),
                              top["score"].to_pylist()) if v == best} == exact

    base = s.match_all(Term("apple"))
    b = dict(zip(base["doc_id"].to_pylist(), base["score"].to_pylist()))
    summed = s.match_all(Bool(must=[Term("apple")], should=[feat]))
    sm = dict(zip(summed["doc_id"].to_pylist(), summed["score"].to_pylist()))
    assert set(sm) == set(b)
    for d, v in sm.items():
        assert v == pytest.approx(b[d] + got[d], rel=1e-12)


def test_distance_feature_respects_deletes(idx, tmp_path):
    from lucene_solr_ray.index.maintenance import delete_by_ids
    from lucene_solr_ray.search.query import DistanceFeature
    import shutil

    out, pop = idx
    out2 = str(tmp_path / "idx_del")
    shutil.copytree(out, out2)
    delete_by_ids(out2, [0, 1, 2])
    s = IndexSearcher(out2, dtype=np.float64)
    alone = s.match_all(DistanceFeature("pop", origin=3.0, pivot=2.0))
    ids = set(alone["doc_id"].to_pylist())
    assert len(alone) == len(pop) - 3 and not ids & {0, 1, 2}


def test_infix_and_completion_suggest(idx):
    from lucene_solr_ray.search.services import (
        CompletionSuggester, infix_suggest)

    out, _ = idx
    s = IndexSearcher(out)
    got = infix_suggest(s, "rumb", k=3)
    assert got and got[0][0] == "crumble"
    cs = CompletionSuggester([
        ("Apple Pie", 10), ("apple crumble", 30), ("apple pie recipe", 20),
        ("banana bread", 40),
    ])
    assert cs.suggest("apple") == [("apple crumble", 30),
                                   ("apple pie recipe", 20), ("Apple Pie", 10)]
    assert cs.suggest("apple p") == [("apple pie recipe", 20), ("Apple Pie", 10)]
    assert cs.suggest("zzz") == []


def test_completion_suggester_non_ascii():
    from lucene_solr_ray.search.services import CompletionSuggester

    cs = CompletionSuggester([("café au lait", 5), ("cat food", 3),
                              ("日本語 入力", 7)])
    assert cs.suggest("café") == [("café au lait", 5)]
    assert cs.suggest("日本語") == [("日本語 入力", 7)]
    assert cs.suggest("cat") == [("cat food", 3)]
    assert cs.suggest("") == []
