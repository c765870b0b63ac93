"""Hunspell affix-rule stemming (hunspell/Dictionary.java:73 +
Stemmer.java:47). Golden expectations ported from the reference's own
hunspell test suite; the .aff/.dic fixtures are read from the reference
tree (skipped when absent)."""

import os
from collections import Counter

import pytest

from lucene_solr_ray.analysis.hunspell import HunspellStemmer

_DIR = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/hunspell")

pytestmark = pytest.mark.skipif(not os.path.isdir(_DIR),
                                reason="reference fixtures not available")


def load(aff, dic):
    with open(os.path.join(_DIR, aff), encoding="utf-8",
              errors="replace") as f:
        a = f.read()
    with open(os.path.join(_DIR, dic), encoding="utf-8",
              errors="replace") as f:
        d = f.read()
    return HunspellStemmer(a, d)


def assert_stems(st, word, *expected):
    assert Counter(st.stem(word)) == Counter(expected), (
        word, st.stem(word), expected)


def test_simple_fixture():
    # TestStemmer.java over simple.aff/simple.dic — every case
    st = load("simple.aff", "simple.dic")
    assert_stems(st, "lucene", "lucene", "lucen")
    assert_stems(st, "mahoute", "mahout")
    assert_stems(st, "solr", "olr")
    assert_stems(st, "abcd")            # no continuation: no recursion
    assert_stems(st, "ab", "ab")
    assert_stems(st, "abc", "ab")
    assert_stems(st, "apach", "apach")
    assert_stems(st, "apache", "apach")
    assert_stems(st, "foo", "foo", "foo")
    assert_stems(st, "food", "foo")
    assert_stems(st, "foos", "foo")
    assert_stems(st, "lucen", "lucen")
    assert_stems(st, "mahout", "mahout")
    assert_stems(st, "moo", "moo")
    assert_stems(st, "mood", "moo")
    assert_stems(st, "olr", "olr")


def test_condition_fixture():
    # TestCondition.java: prefix/suffix cross product with conditions
    st = load("condition.aff", "condition.dic")
    assert_stems(st, "hello", "hello")
    assert_stems(st, "try", "try")
    assert_stems(st, "tried", "try")
    assert_stems(st, "work", "work")
    assert_stems(st, "worked", "work")
    assert_stems(st, "rework", "work")
    assert_stems(st, "reworked", "work")
    assert_stems(st, "retried")
    assert_stems(st, "workied")
    assert_stems(st, "tryed")
    assert_stems(st, "tryied")
    assert_stems(st, "helloed")


def test_condition2_fixture():
    st = load("condition2.aff", "condition2.dic")
    assert_stems(st, "monopolies", "monopoly")


def test_optional_condition_fixture():
    st = load("optional-condition.aff", "condition.dic")
    assert_stems(st, "tried", "try")
    assert_stems(st, "reworked", "work")
    assert_stems(st, "tryed")


def test_two_suffixes_fixture():
    # TestTwoSuffixes.java: same-flag rule groups merge
    st = load("twosuffixes.aff", "twosuffixes.dic")
    assert_stems(st, "drink", "drink")
    assert_stems(st, "drinkable", "drink")
    assert_stems(st, "drinks", "drink")
    assert_stems(st, "drinkableable")
    assert_stems(st, "drinkss")


def test_twofold_fixture():
    # TestTwoFold.java: inner suffix needs the outer flag in its
    # continuation classes
    st = load("twofold.aff", "morph.dic")
    assert_stems(st, "drink", "drink")
    assert_stems(st, "drinkable", "drink")
    assert_stems(st, "drinkables", "drink")
    assert_stems(st, "drinksable")
    assert_stems(st, "drinkableable")
    assert_stems(st, "drinks")


def test_flag_modes():
    st = load("flaglong.aff", "flaglong.dic")
    assert_stems(st, "foo", "foo")
    assert_stems(st, "foos", "foo")
    assert_stems(st, "fooss")
    assert_stems(st, "foobogus")
    st = load("flagnum.aff", "flagnum.dic")
    assert_stems(st, "foo", "foo")
    assert_stems(st, "foos", "foo")
    assert_stems(st, "fooss")


def test_zero_affix_and_fullstrip():
    st = load("zeroaffix.aff", "zeroaffix.dic")
    assert_stems(st, "drink", "drinksierranevada")
    st = load("fullstrip.aff", "fullstrip.dic")
    assert_stems(st, "tasty", "beer")


def test_filter_fn():
    st = load("simple.aff", "simple.dic")
    fn = st.filter_fn()
    assert fn("mahoute") == "mahout"
    assert fn("lucene") == "lucene"     # longest of {lucen, lucene}
    assert fn("unknownword") == "unknownword"


def test_index_roundtrip_with_hunspell_stemmer(tmp_path, ray_session):
    """End-to-end: an index built with stemmer='hunspell:<aff>:<dic>'
    stems both sides, so 'mahoute' and 'mahout' hit the same postings."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher

    f = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(3, dtype=np.int64)),
        "text": pa.array(["mahoute rocks", "mahout rides", "solr搜索 none"]),
    }), f)
    idx = str(tmp_path / "idx")
    spec = f"hunspell:{_DIR}/simple.aff:{_DIR}/simple.dic"
    build_index(f, idx, cfg=IndexBuildConfig(num_shards=1, num_buckets=2,
                                             stemmer=spec))
    s = IndexSearcher(idx)
    assert sorted(s.match_all("mahout")["doc_id"].to_pylist()) == [0, 1]
    assert sorted(s.match_all("mahoute")["doc_id"].to_pylist()) == [0, 1]
