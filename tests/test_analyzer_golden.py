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


# Emoji golden cases ported from the reference's TestStandardAnalyzer.java
# (testEmoji:366, testEmojiSequence:373, testEmojiSequenceWithModifier:380,
# testEmojiRegionalIndicator:387, testEmojiVariationSequence:394,
# testEmojiTagSequence:417, testEmojiTokenization:423). Token TEXT is
# asserted (the reference also types them <EMOJI>; we don't carry types).
EMOJI_GOLDEN = [
    ("\U0001F4A9 \U0001F4A9\U0001F4A9", ["\U0001F4A9"] * 3),
    # ZWJ sequence stays one token
    ("\U0001F469‍❤️‍\U0001F469",
     ["\U0001F469‍❤️‍\U0001F469"]),
    # fitzpatrick modifier absorbed
    ("\U0001F468\U0001F3FC‍⚕️",
     ["\U0001F468\U0001F3FC‍⚕️"]),
    # regional-indicator pairs: two flags, not one 4-char token
    ("\U0001F1FA\U0001F1F8\U0001F1FA\U0001F1F8",
     ["\U0001F1FA\U0001F1F8"] * 2),
    # keycaps, fully- and non-fully-qualified
    ("#️⃣", ["#️⃣"]),
    ("3️⃣", ["3️⃣"]),
    # tag sequence (flag of England)
    ("\U0001F3F4\U000E0067\U000E0062\U000E0065\U000E006E\U000E0067\U000E007F",
     ["\U0001F3F4\U000E0067\U000E0062\U000E0065\U000E006E\U000E0067"
      "\U000E007F"]),
    # emoji between latin / ideographs split cleanly
    ("poo\U0001F4A9poo", ["poo", "\U0001F4A9", "poo"]),
    ("\U0001F4A9中國\U0001F4A9",
     ["\U0001F4A9", "中", "國", "\U0001F4A9"]),
    # text-presentation selector: bare keycap base drops, pictographic keeps
    # (token text excludes the FE0E, as the reference's does)
    ("#︎", []),
    ("⭕︎", ["⭕"]),
    ("⭕︎‍⭕︎", ["⭕", "‍⭕"]),
]


@pytest.mark.parametrize("text,expected", EMOJI_GOLDEN)
def test_emoji_golden(text, expected):
    toks, _ = standard_tokenize(text)
    assert toks == expected


def test_emoji_positions_count_like_tokens():
    toks, pos = standard_tokenize("a \U0001F4A9 b")
    assert toks == ["a", "\U0001F4A9", "b"]
    assert pos == [0, 1, 2]


def test_emoji_end_to_end(tmp_path, ray_session):
    """Emoji tokens flow through build -> postings -> query parser -> BM25
    (the reference's <EMOJI> tokens are searchable like any term)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher

    texts = ["I love \U0001F355 pizza", "pizza is fine",
             "\U0001F355 \U0001F355 double", "no emoji here"]
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(np.arange(4), pa.int64()),
                             "text": pa.array(texts, pa.string())}), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    s = IndexSearcher(idx)
    t = s.search("\U0001F355", k=10)
    assert t["doc_id"].to_pylist() == [2, 0]  # tf=2 doc first
