"""SpellCheckCollator and expression-SortField tests."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.services import (
    search_sorted_by_expression,
    spell_collate,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("col_idx"))
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4, batch_size=256)
    build_index(DOCS, d, key_col="doc_id", text_col="text", cfg=cfg)
    return d


@pytest.fixture(scope="module")
def raw():
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(),
                    [s.split(" ") for s in t["text"].to_pylist()]))


def test_spell_collate_fixes_misspellings(idx, raw):
    s = IndexSearcher(idx, dtype=np.float64)
    got = spell_collate(s, "fsat AND qeury")
    assert got.num_rows >= 1
    top = got["collation"].to_pylist()[0]
    assert top == "fast AND query"
    want_hits = sum(1 for _, toks in raw
                    if "fast" in toks and "query" in toks)
    assert got["hits"].to_pylist()[0] == want_hits


def test_spell_collate_no_misspellings(idx):
    s = IndexSearcher(idx, dtype=np.float64)
    got = spell_collate(s, "fast AND query")
    assert got.num_rows == 0


def test_spell_collate_hits_sorted_desc(idx):
    s = IndexSearcher(idx, dtype=np.float64)
    got = spell_collate(s, "fsat", max_collations=3)
    hits = got["hits"].to_pylist()
    assert hits == sorted(hits, reverse=True) and all(h > 0 for h in hits)


def test_expression_sort(idx, raw):
    s = IndexSearcher(idx, dtype=np.float64)
    got = search_sorted_by_expression(s, "fast", "doclen + doc_id / 1000.0",
                                      k=5)
    matching = [(d, toks) for d, toks in raw if "fast" in toks]
    vals = sorted(((len(t) + d / 1000.0, d) for d, t in matching),
                  key=lambda x: (-x[0], x[1]))[:5]
    assert got["doc_id"].to_pylist() == [d for _, d in vals]
    np.testing.assert_allclose(got["sort_value"].to_pylist(),
                               [v for v, _ in vals])


def test_expression_sort_uses_score(idx):
    s = IndexSearcher(idx, dtype=np.float64)
    # expr == score reproduces relevance order on distinct scores
    a = search_sorted_by_expression(s, "dup", "score", k=10)
    b = s.search("dup", k=10)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()


def test_word_break_suggest(idx, raw):
    from lucene_solr_ray.search.services import word_break_suggest

    s = IndexSearcher(idx, dtype=np.float64)
    got = word_break_suggest(s, "fastquery")
    assert got["suggestion"].to_pylist() == ["fast query"]
    assert got["breaks"].to_pylist() == [1]
    from collections import Counter

    dfc = Counter()
    for _, toks in raw:
        dfc.update(set(toks))
    assert got["freq"].to_pylist() == [max(dfc["fast"], dfc["query"])]
    # unknown word: no suggestions
    assert word_break_suggest(s, "zzzzyy").num_rows == 0


def test_word_break_two_changes(tmp_path, ray_session):
    import pyarrow as pa
    from lucene_solr_ray.search.services import word_break_suggest

    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], "int64"),
        "text": pa.array(["air port note", "book note air"]),
    }), p)
    d = str(tmp_path / "idx")
    from lucene_solr_ray.index import IndexBuildConfig, build_index

    build_index(p, d, cfg=IndexBuildConfig(num_shards=1, num_buckets=2))
    s = IndexSearcher(d)
    got = word_break_suggest(s, "airportnote", max_changes=2)
    assert "air port note" in got["suggestion"].to_pylist()
    # one change is not enough for a 3-word split
    got1 = word_break_suggest(s, "airportnote", max_changes=1)
    assert got1.num_rows == 0


def test_word_combine_suggest(tmp_path, ray_session):
    import pyarrow as pa
    from lucene_solr_ray.search.services import word_combine_suggest

    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], "int64"),
        "text": pa.array(["airport is big", "airport gate"]),
    }), p)
    d = str(tmp_path / "idx")
    from lucene_solr_ray.index import IndexBuildConfig, build_index

    build_index(p, d, cfg=IndexBuildConfig(num_shards=1, num_buckets=2))
    s = IndexSearcher(d)
    got = word_combine_suggest(s, ["air", "port", "gate"])
    assert got["combined"].to_pylist() == ["airport"]
    assert got["start"].to_pylist() == [0] and got["end"].to_pylist() == [1]
    assert got["freq"].to_pylist() == [2]


def test_function_range(idx, raw):
    from lucene_solr_ray.search.query import Bool, FunctionRange, Term

    s = IndexSearcher(idx, dtype=np.float64)
    fr = FunctionRange("doclen * 2 + 1", lower=41.0, upper=61.0)
    got = s.match_all(fr)
    exp = sorted(d for d, toks in raw
                 if 41.0 <= len(toks) * 2 + 1 <= 61.0)
    assert got["doc_id"].to_pylist() == exp
    assert set(got["score"].to_pylist()) == {1.0}
    # exclusive bounds
    fr2 = FunctionRange("doclen * 2 + 1", lower=41.0, upper=61.0,
                        include_lower=False, include_upper=False)
    got2 = s.match_all(fr2)
    exp2 = sorted(d for d, toks in raw
                  if 41.0 < len(toks) * 2 + 1 < 61.0)
    assert got2["doc_id"].to_pylist() == exp2
    # composes as a FILTER clause
    both = s.match_all(Bool(must=[Term("fast")], filter=[fr]))
    expb = sorted(d for d, toks in raw
                  if "fast" in toks and 41.0 <= len(toks) * 2 + 1 <= 61.0)
    assert both["doc_id"].to_pylist() == expb
