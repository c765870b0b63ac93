"""Property tests for the analysis chain's structural invariants over
arbitrary unicode text (golden fixtures pin the UAX#29 rules; these pin
the contracts every consumer relies on):

- offsets slice the source text exactly to the raw token
  (OffsetAttribute contract: filters never change offsets),
- positions are strictly increasing,
- the offsets variant and the plain variant agree,
- java_lower is idempotent and length-stable on the BMP fast path."""

from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.analysis.lowercase import java_lower
from lucene_solr_ray.analysis.tokenizer import (
    standard_tokenize,
    standard_tokenize_offsets,
)

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # no lone surrogates
    max_size=200,
)


@settings(max_examples=150, deadline=None)
@given(text_st)
def test_offsets_slice_source_text(text):
    tokens, positions, starts, ends = standard_tokenize_offsets(text)
    assert len(tokens) == len(positions) == len(starts) == len(ends)
    for tok, s, e in zip(tokens, starts, ends):
        assert text[s:e] == tok
    # positions strictly increase (holes allowed, never repeats/regress)
    assert all(b > a for a, b in zip(positions, positions[1:]))
    # offsets are non-overlapping and ordered
    assert all(b >= a for a, b in zip(ends, starts[1:]))


@settings(max_examples=150, deadline=None)
@given(text_st)
def test_offsets_variant_agrees_with_plain(text):
    t1, p1 = standard_tokenize(text)
    t2, p2, _, _ = standard_tokenize_offsets(text)
    assert t1 == t2
    assert p1 == p2


@settings(max_examples=150, deadline=None)
@given(text_st)
def test_java_lower_idempotent(text):
    once = java_lower(text)
    assert java_lower(once) == once


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 30), st.text(alphabet="ab", min_size=1, max_size=60))
def test_overlength_tokens_dropped_but_bump_position(maxlen, word):
    # one over-length token between two short ones: dropped, leaves a hole
    text = f"x {word} y"
    tokens, positions = standard_tokenize(text, max_token_length=maxlen)
    if len(word) > maxlen:
        assert tokens == ["x", "y"]
        assert positions == [0, 2]  # the dropped token consumed slot 1
    else:
        assert tokens == ["x", word, "y"]
        assert positions == [0, 1, 2]
