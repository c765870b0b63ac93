"""CJKBigramFilter (analysis/cjk/CJKBigramFilter.java:52, CJKAnalyzer
role): character bigrams over position-adjacent all-CJK tokens, unigram
for isolated chars, query-side mirror."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.analysis.analyzers import cjk_bigram_stream
from lucene_solr_ray.search.query import (Phrase, Term,
                                          rewrite_cjk_bigrams)


def test_han_run_bigrams_and_shift():
    # standard tokenizer gives single Han chars at consecutive positions
    terms, pos = cjk_bigram_stream(
        ["中", "国", "人", "hello", "世", "界"], [0, 1, 2, 3, 4, 5])
    assert terms == ["中国", "国人", "hello", "世界"]
    # 3-char run -> 2 positions; following tokens shift left by 1
    assert pos == [0, 1, 2, 3]


def test_isolated_char_stays_unigram():
    terms, pos = cjk_bigram_stream(["中", "single"], [0, 1])
    assert terms == ["中", "single"]
    assert pos == [0, 1]


def test_katakana_word_bigrams():
    # katakana arrives as one multi-char token; its chars still bigram
    terms, pos = cjk_bigram_stream(["カタカナ"], [0])
    assert terms == ["カタ", "タカ", "カナ"]
    assert pos == [0, 1, 2]


def test_stop_hole_breaks_run():
    # positions 0 and 2 are not adjacent: two separate (isolated) chars
    terms, pos = cjk_bigram_stream(["中", "国"], [0, 2])
    assert terms == ["中", "国"]
    assert pos == [0, 2]


def test_query_rewrite():
    from lucene_solr_ray.search.query import parse_query

    out = rewrite_cjk_bigrams(Term("中国"))
    assert isinstance(out, Term) and out.text == "中国"
    out = rewrite_cjk_bigrams(Term("中国人"))
    assert isinstance(out, Phrase) and out.terms == ("中国", "国人")
    out = rewrite_cjk_bigrams(Phrase(("hello", "中国人")))
    assert out.terms == ("hello", "中国", "国人")
    out = rewrite_cjk_bigrams(Term("中"))
    assert isinstance(out, Term) and out.text == "中"
    # parser splits a CJK run into single-char SHOULD terms; the mirror
    # re-merges the run into bigram terms (autoGeneratePhraseQueries=false
    # semantics: 中国人 -> 中国 OR 国人)
    out = rewrite_cjk_bigrams(parse_query("中国人"))
    assert [t.text for t in out.should] == ["中国", "国人"]
    # quoted run -> exact bigram phrase
    out = rewrite_cjk_bigrams(parse_query('"中国人"'))
    assert out.terms == ("中国", "国人")


def test_index_and_search_cjk(tmp_path, ray_session):
    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher

    texts = [
        "we discussed 中国人 yesterday",
        "unrelated text entirely",
        "the 中 character alone",
        "中国 pair only",
    ]
    f = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(4, dtype=np.int64)),
        "text": pa.array(texts),
    }), f)
    idx = str(tmp_path / "idx")
    build_index(f, idx, cfg=IndexBuildConfig(num_shards=1, num_buckets=2,
                                             cjk_bigrams=True))
    s = IndexSearcher(idx)
    # 2-char query = one bigram term: matches the 3-char run's prefix and
    # the standalone pair
    assert sorted(s.match_all("中国")["doc_id"].to_pylist()) == [0, 3]
    # unquoted 3-char query = OR of bigrams (reference default):
    # doc 0 has both, doc 3 has 中国
    assert sorted(s.match_all("中国人")["doc_id"].to_pylist()) == [0, 3]
    # quoted = exact phrase of consecutive bigrams: only the full run
    assert sorted(s.match_all('"中国人"')["doc_id"].to_pylist()) == [0]
    # isolated unigram matches only the isolated occurrence
    assert sorted(s.match_all("中")["doc_id"].to_pylist()) == [2]
    # non-CJK terms unaffected, positions shifted consistently
    assert sorted(s.match_all('"中国人 yesterday"')["doc_id"].to_pylist()) \
        == [0]
