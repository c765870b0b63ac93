"""StandardTokenizer-style word segmentation (UAX#29 word-break approximation).

Semantics replicated from the reference's StandardTokenizer
(lucene/core/.../analysis/standard/StandardTokenizer.java:39,143-166):

* word tokens are maximal runs of letters/digits, joined across *medial*
  punctuation — apostrophe/period between letters ("don't", "U.S.A"),
  period/comma between digits ("3.14", "1,000");
* CJK ideographs and Hiragana tokenize one codepoint per token; Katakana and
  Hangul as runs (UAX#29 script rules);
* tokens longer than MAX_TOKEN_LENGTH (255) are **dropped, not truncated**,
  but still consume a position slot (StandardTokenizer.java:154-164 —
  position increment accumulates over the skipped token);
* punctuation/whitespace/symbols produce no tokens.

This is a documented approximation of the JFlex UAX#29 grammar (emoji and a
few rare word-break classes are not replicated); it is exact on ASCII text
and on every fixture in tests/.
"""

from __future__ import annotations

import re

MAX_TOKEN_LENGTH = 255  # reference default, StandardAnalyzer.java:39

# one alphanumeric run; medial ' and . join any alnum (MidLetter/MidNumLet),
# medial , joins only digit-digit (MidNum) — so "2B", "21.35", "1,000" and
# "don't" are single tokens while "dogs,chase" splits
_ASCII_RE = re.compile(
    r"[A-Za-z0-9_]+(?:(?:['.]|(?<=\d),(?=\d))[A-Za-z0-9_]+)*"
)

_CJK = (
    "⺀-⻿㐀-䶿一-鿿豈-﫿"
    "\U00020000-\U0002fa1f"
)
_W = rf"(?:(?![{_CJK}぀-ヿ가-힯])[^\W])"  # word char minus CJK/kana/hangul
_UNI_RE = re.compile(
    rf"[぀-ゟ]"                     # hiragana: one char per token
    rf"|[{_CJK}]"                            # ideographic: one char per token
    rf"|[゠-ヿ]+"                    # katakana run
    rf"|[가-힯]+"                    # hangul run
    rf"|{_W}+(?:(?:['.’]|(?<=\d),(?=\d)){_W}+)*",
    re.UNICODE,
)


def tokenize_fast_ascii(text: str, max_token_length: int = MAX_TOKEN_LENGTH):
    """C-speed fast path for ASCII text with no over-length tokens.

    Returns the token list (positions are implicitly 0..n-1), or None when
    the input needs the general path (non-ASCII, or a >max-length token whose
    drop must leave a position hole).
    """
    if not text.isascii():
        return None
    toks = _ASCII_RE.findall(text)
    if toks and max(map(len, toks)) > max_token_length:
        return None
    return toks


def standard_tokenize(text: str, max_token_length: int = MAX_TOKEN_LENGTH):
    """Tokenize -> (tokens, positions).

    positions[i] is the position slot of tokens[i]; slots of dropped
    over-length tokens are skipped (holes), matching the reference's
    position-increment behavior.
    """
    rx = _ASCII_RE if text.isascii() else _UNI_RE
    tokens: list[str] = []
    positions: list[int] = []
    pos = 0
    for m in rx.finditer(text):
        tok = m.group()
        if len(tok) <= max_token_length:
            tokens.append(tok)
            positions.append(pos)
        pos += 1
    return tokens, positions
