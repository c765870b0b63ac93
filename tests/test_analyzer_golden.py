"""Golden tokenizer cases mirrored from the reference's TestStandardAnalyzer
(lucene/core/src/test/.../standard/TestStandardAnalyzer.java) — the tokenizer
output (before lowercasing) must match the reference's expected arrays."""

import pytest

from lucene_solr_ray.analysis import standard_tokenize
from lucene_solr_ray.analysis.analyzers import analyze_fast

GOLDEN = [
    # testAlphanumericSA (:228-229)
    ("B2B", ["B2B"]),
    ("2B", ["2B"]),
    # testDelimitersSA (:234-236)
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("dogs,chase,cats", ["dogs", "chase", "cats"]),
    ("ac/dc", ["ac", "dc"]),
    # testApostrophesSA (:241-246)
    ("O'Reilly", ["O'Reilly"]),
    ("you're", ["you're"]),
    ("she's", ["she's"]),
    ("Jim's", ["Jim's"]),
    ("don't", ["don't"]),
    ("O'Reilly's", ["O'Reilly's"]),
    # testNumericSA (:251-254)
    ("21.35", ["21.35"]),
    ("R2D2 C3PO", ["R2D2", "C3PO"]),
    ("216.239.63.104", ["216.239.63.104"]),
    # testTextWithNumbersSA (:259)
    ("David has 5000 bones", ["David", "has", "5000", "bones"]),
    # testVariousTextSA (:264-268)
    ("C embedded developers wanted", ["C", "embedded", "developers", "wanted"]),
    ("foo bar FOO BAR", ["foo", "bar", "FOO", "BAR"]),
    ("foo      bar .  FOO <> BAR", ["foo", "bar", "FOO", "BAR"]),
    ('"QUOTED" word', ["QUOTED", "word"]),
    # testKoreanSA (:272)
    ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),
    ("훈민정음", ["훈민정음"]),
    # testSupplementary (:294): supplementary-plane ideographs, one per token
    ("𩬅艱鍟䇹愯瀛", ["𩬅", "艱", "鍟", "䇹", "愯", "瀛"]),
    # testEmpty-ish (:209-211)
    ("", []),
    (".", []),
    (" ", []),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden(text, expected):
    toks, _ = standard_tokenize(text)
    assert toks == expected


def test_fast_path_agrees_on_ascii_golden():
    for text, expected in GOLDEN:
        if text.isascii():
            fast = analyze_fast(text)
            assert fast == [t.lower() for t in expected], text
