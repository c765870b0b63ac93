"""Robustness fuzz for the hand-written HTML stripper scanner: arbitrary
byte/str input — including truncated tags, unterminated comments/CDATA,
nested script/style, and random angle-bracket soup — must never raise,
must be deterministic, and must never leak tag markup or script/style
bodies into the text output."""

from hypothesis import assume, given, settings
from hypothesis import strategies as st

from lucene_solr_ray.analysis.htmlstrip import html_to_text

soup_st = st.text(
    alphabet=st.sampled_from(list("<>/!-&;#abCD =\"'[]?\n\tscriptyle")),
    max_size=300,
)
frag_st = st.lists(
    st.sampled_from([
        "<p>", "</p>", "<br>", "<script>", "</script>", "<style>",
        "</style>", "<!--", "-->", "<![CDATA[", "]]>", "&amp;", "&lt;",
        "&#65;", "&#x41;", "<a href='x'>", "</a>", "<!", "<", ">", "txt",
        " ", "\n", "<div", "junk<", "&bogus;", "<!-",
    ]),
    max_size=40,
).map("".join)


@settings(max_examples=200, deadline=None)
@given(st.one_of(soup_st, frag_st))
def test_stripper_never_crashes_and_is_deterministic(src):
    out = html_to_text(src)
    assert isinstance(out, str)
    assert html_to_text(src) == out


@settings(max_examples=200, deadline=None)
@given(frag_st)
def test_stripper_drops_wellformed_tags_and_script_bodies(frag):
    # CDATA bodies are kept as LITERAL text (reference semantics), so a
    # fragment opening a CDATA section may legitimately emit tag-looking
    # text — exclude it from this markup-free assertion
    assume("<![CDATA[" not in frag)
    body = f"<html><body><p>KEEP</p><script>var DROP=1;</script>{frag}</body>"
    out = html_to_text(body)
    assert "KEEP" in out
    assert "DROP" not in out
    # no well-formed tag markup survives
    for marker in ("<p>", "</p>", "<script>", "<body>"):
        assert marker not in out


@settings(max_examples=100, deadline=None)
@given(soup_st)
def test_stripper_accepts_bytes(src):
    assert html_to_text(src.encode("utf-8", "ignore")) == html_to_text(
        src.encode("utf-8", "ignore").decode("utf-8", "replace"))
