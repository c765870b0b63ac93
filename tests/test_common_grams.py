"""CommonGramsFilter / CommonGramsQueryFilter
(commongrams/CommonGramsFilter.java:51, CommonGramsQueryFilter.java:64).

Query-rewrite golden layouts ported from the reference's
CommonGramsFilterTest.testCommonGramsQueryFilter (s=common, n=not), plus
index-level phrase matching through the bigram terms.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.search.query import (Phrase, Term, parse_query,
                                          rewrite_common_grams)

C = frozenset(["of", "the", "s"])


def _rw(terms):
    out = rewrite_common_grams(Phrase(tuple(terms)), C)
    if isinstance(out, Term):
        return [out.text]
    return list(out.terms)


@pytest.mark.parametrize("terms,expected", [
    (["brown", "fox"], ["brown", "fox"]),
    (["the", "fox"], ["the_fox"]),
    (["fox", "of"], ["fox_of"]),
    (["of", "the"], ["of_the"]),
    (["n", "n", "n"], ["n", "n", "n"]),
    (["n", "n", "s"], ["n", "n_s"]),
    (["n", "s", "n"], ["n_s", "s_n"]),
    (["n", "s", "s"], ["n_s", "s_s"]),
    (["s", "n", "n"], ["s_n", "n", "n"]),
    (["s", "n", "s"], ["s_n", "n_s"]),
    (["s", "s", "n"], ["s_s", "s_n"]),
    (["fox", "of", "the"], ["fox_of", "of_the"]),
    (["the", "fox", "of"], ["the_fox", "fox_of"]),
])
def test_query_filter_reference_layouts(terms, expected):
    assert _rw(terms) == expected


def test_sloppy_phrase_not_rewritten():
    out = rewrite_common_grams(Phrase(("the", "fox"), slop=2), C)
    assert out.terms == ("the", "fox")


def test_rewrite_recurses_into_bool():
    node = parse_query('"the fox" AND brown')
    out = rewrite_common_grams(node, C)
    phrases = out.must if hasattr(out, "must") else []
    assert any(isinstance(c, Term) and c.text == "the_fox"
               for c in phrases), out


def test_index_phrase_through_bigrams(tmp_path, ray_session):
    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher

    f = str(tmp_path / "c.parquet")
    texts = [
        "the rain in spain falls mainly",
        "rain falls in the night",
        "no common words here",
        "spain rain the",
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(4, dtype=np.int64)),
        "text": pa.array(texts),
    }), f)
    idx = str(tmp_path / "idx")
    cfg = IndexBuildConfig(num_shards=1, num_buckets=2,
                           common_grams=("the", "in"))
    build_index(f, idx, cfg=cfg)
    s = IndexSearcher(idx)
    # phrase with common words matches via bigram terms at aligned positions
    assert sorted(s.match_all('"the rain in spain"')["doc_id"].to_pylist()) \
        == [0]
    assert sorted(s.match_all('"in the night"')["doc_id"].to_pylist()) == [1]
    # unigrams still indexed: plain term queries unaffected
    assert sorted(s.match_all("rain")["doc_id"].to_pylist()) == [0, 1, 3]
    assert sorted(s.match_all("the")["doc_id"].to_pylist()) == [0, 1, 3]
    # bigram term exists directly
    assert sorted(s.match_all("the_rain")["doc_id"].to_pylist()) == [0]
    # longer mixed phrase: trailing non-common unigrams keep their shifted
    # positions ("falls mainly" sits after the bigram chain)
    assert sorted(s.match_all(
        '"the rain in spain falls mainly"')["doc_id"].to_pylist()) == [0]


def test_common_grams_rejects_conflicting_config():
    from lucene_solr_ray.index import IndexBuildConfig

    with pytest.raises(ValueError):
        IndexBuildConfig(common_grams=("the",), stemmer="porter")
    with pytest.raises(ValueError):
        IndexBuildConfig(common_grams=("the",), word_delimiter_graph=True)
