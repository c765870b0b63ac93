from lucene_solr_ray.analysis import (
    html_to_text,
    java_lower,
    standard_analyzer,
    standard_tokenize,
)


def test_basic_tokens():
    toks, pos = standard_tokenize("The quick brown fox.")
    assert toks == ["The", "quick", "brown", "fox"]
    assert pos == [0, 1, 2, 3]


def test_medial_punctuation():
    # golden cases mirrored from the reference's TestStandardAnalyzer
    assert standard_tokenize("U.S.A.")[0] == ["U.S.A"]
    assert standard_tokenize("don't say no")[0] == ["don't", "say", "no"]
    assert standard_tokenize("3.14 and 1,000 points")[0] == ["3.14", "and", "1,000", "points"]
    assert standard_tokenize("a,b")[0] == ["a", "b"]


def test_cjk_single_char():
    toks, _ = standard_tokenize("我购买了道具")
    assert toks == list("我购买了道具")


def test_katakana_run():
    toks, _ = standard_tokenize("コンピュータ abc")
    assert toks == ["コンピュータ", "abc"]


def test_overlong_token_dropped_not_truncated():
    long_tok = "x" * 256
    toks, pos = standard_tokenize(f"aa {long_tok} bb")
    assert toks == ["aa", "bb"]
    # dropped token consumed a position slot (hole)
    assert pos == [0, 2]
    # boundary: exactly 255 chars survives
    ok = "y" * 255
    toks, pos = standard_tokenize(f"aa {ok} bb")
    assert toks == ["aa", ok, "bb"]


def test_java_lower():
    assert java_lower("HeLLo") == "hello"
    assert java_lower("İstanbul") == "istanbul"  # dotted capital I -> plain i
    assert java_lower("ΣΟΦΟΣ") == "σοφοσ"


def test_standard_analyzer_chain():
    terms, pos = standard_analyzer("The QUICK <brown> Fox")
    assert terms == ["the", "quick", "brown", "fox"]
    terms, _ = standard_analyzer("the quick fox", stopwords=frozenset({"the"}))
    assert terms == ["quick", "fox"]


def test_html_strip():
    text = "Hello & <world> — fast search"
    html = (
        "<!DOCTYPE html><html><head><script>var x=1<2;</script>"
        "<style>p{color:red}</style></head>"
        "<body><!-- a comment --><p>Hello &amp; &lt;world&gt; — fast"
        " search</p></body></html>"
    )
    assert html_to_text(html).strip() == text
    assert html_to_text(html.encode()).strip() == text


def test_html_cdata():
    assert html_to_text("<p><![CDATA[a <raw> & b]]></p>").strip() == "a <raw> & b"
