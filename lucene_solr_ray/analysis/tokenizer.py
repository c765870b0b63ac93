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

Emoji are tokenized per the reference's UTS#51 emoji_sequence rule
(StandardTokenizerImpl.jflex:212-221, <EMOJI> type): an Extended_Pictographic
char (optional skin-tone modifier, optional VS16) chained by ZWJ, or a tag
sequence (flag-of-England), or a keycap ([0-9#*] FE0F? 20E3 — the
non-fully-qualified form without FE0F is accepted, per the grammar's note),
or a regional-indicator pair. EmojiChar there is Extended_Pictographic |
(Emoji minus RI/keycap/accidental/modifier); for emoji-data 11.0 that second
set is a subset of the first (verified), so the class below is exactly
Extended_Pictographic. Standalone (C)/(R)/TM are emoji tokens, as in the
reference ("AccidentalEmoji" are excluded only from the Emoji-property side).

This is a documented approximation of the JFlex UAX#29 grammar (a few rare
word-break classes are not replicated; Extend/Format absorption into
ALPHANUM/NUM tokens is not — "3︎" tokenizes to "3", the reference keeps
the selector in the token text); it is exact on ASCII text and on every
fixture in tests/.
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
# Extended_Pictographic, Unicode emoji-data 11.0 (the set the reference's
# grammar includes via UnicodeEmojiProperties.jflex)
_EP = (
    "\u00A9\u00AE\u203C\u2049\u2122\u2139\u2194-\u2199\u21A9-\u21AA"
    "\u231A-\u231B\u2328\u2388\u23CF\u23E9-\u23F3\u23F8-\u23FA\u24C2"
    "\u25AA-\u25AB\u25B6\u25C0\u25FB-\u25FE\u2600-\u2605\u2607-\u2612"
    "\u2614-\u2685\u2690-\u2705\u2708-\u2712\u2714\u2716\u271D\u2721"
    "\u2728\u2733-\u2734\u2744\u2747\u274C\u274E\u2753-\u2755\u2757"
    "\u2763-\u2767\u2795-\u2797\u27A1\u27B0\u27BF\u2934-\u2935"
    "\u2B05-\u2B07\u2B1B-\u2B1C\u2B50\u2B55\u3030\u303D\u3297\u3299"
    "\U0001F000-\U0001F0FF\U0001F10D-\U0001F10F\U0001F12F"
    "\U0001F16C-\U0001F171\U0001F17E-\U0001F17F\U0001F18E"
    "\U0001F191-\U0001F19A\U0001F1AD-\U0001F1E5\U0001F201-\U0001F20F"
    "\U0001F21A\U0001F22F\U0001F232-\U0001F23A\U0001F23C-\U0001F23F"
    "\U0001F249-\U0001F3FA\U0001F400-\U0001F53D\U0001F546-\U0001F64F"
    "\U0001F680-\U0001F6FF\U0001F774-\U0001F77F\U0001F7D5-\U0001F7FF"
    "\U0001F80C-\U0001F80F\U0001F848-\U0001F84F\U0001F85A-\U0001F85F"
    "\U0001F888-\U0001F88F\U0001F8AE-\U0001F8FF\U0001F90C-\U0001F93A"
    "\U0001F93C-\U0001F945\U0001F947-\U0001FFFD"
)
_MOD = "\U0001F3FB-\U0001F3FF"   # Emoji_Modifier (skin tones)
_ZWJ = "\u200D"
_VS16 = "\uFE0F"
# EmojiCharOrPresSeqOrModSeq (StandardTokenizerImpl.jflex:87): ZWJ*
# pictographic + absorbed skin modifiers + optional VS16, or a bare modifier
# (ModifierSequence branch; Emoji_Modifier_Base is a subset of _EP)
_E1 = rf"(?:{_ZWJ}*[{_EP}][{_MOD}]*{_VS16}?|{_ZWJ}*[{_MOD}])"
# the EMOJI_TYPE rule (jflex:218-220): ZWJ-chained sequence or tag sequence,
# keycap ([0-9#*] FE0F? 20E3 -- the non-fully-qualified form without FE0F is
# accepted per the grammar's note), or a regional-indicator (flag) pair
_EMOJI = (
    rf"{_E1}(?:(?:{_ZWJ}{_E1})+|[\U000E0020-\U000E007E]+\U000E007F)?"
    rf"|[0-9#*]{_VS16}?\u20E3"
    rf"|[\U0001F1E6-\U0001F1FF]{{2}}"
)

_W = rf"(?:(?![{_CJK}぀-ヿ가-힯])[^\W])"  # word char minus CJK/kana/hangul
_UNI_RE = re.compile(
    rf"{_EMOJI}"                     # emoji (win over keycap digits)
    rf"|[぀-ゟ]"                     # hiragana: one char per token
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


def standard_tokenize_offsets(text: str,
                              max_token_length: int = MAX_TOKEN_LENGTH):
    """Tokenize -> (tokens, positions, starts, ends).

    starts[i]/ends[i] are the token's char offsets into ``text`` (the
    reference's OffsetAttribute, analysis/tokenattributes/
    OffsetAttribute.java:26 — there UTF-16 code units; here Python code
    points, identical on BMP-only text). Same position-hole semantics as
    standard_tokenize.
    """
    rx = _ASCII_RE if text.isascii() else _UNI_RE
    tokens: list[str] = []
    positions: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    pos = 0
    for m in rx.finditer(text):
        tok = m.group()
        if len(tok) <= max_token_length:
            tokens.append(tok)
            positions.append(pos)
            starts.append(m.start())
            ends.append(m.end())
        pos += 1
    return tokens, positions, starts, ends
