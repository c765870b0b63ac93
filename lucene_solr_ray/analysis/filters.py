"""Token-filter library (the reference's analysis/common filter zoo,
lucene/analysis/common/src/java/org/apache/lucene/analysis/*).

Each filter is a plain ``str -> str | None`` function (None = drop the
token, leaving a position hole exactly like StopFilter / the reference's
FilteringTokenFilter with enablePositionIncrements). A configured chain
(`IndexBuildConfig.token_filters`) composes them in declared order and
runs BETWEEN the stop filter and the stemmer, index- and query-side alike.

Spec grammar (JSON-manifest-safe: tuples or lists):

    token_filters=("trim", "english_possessive",
                   ("length", 2, 64),
                   ("pattern_replace", r"[0-9]+", "#"),
                   ("truncate", 12))

Edge n-grams are NOT in the 1:1 chain — they multiply tokens, so they run
as posInc-0 stacked insertions at assembly time (`IndexBuildConfig.
edge_ngram`); see build.py.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Callable

# EnglishPossessiveFilter.java:54 — trailing 's / ’s / ＇s removed
# (apostrophe variants U+0027, U+2019, U+FF07)
_POSSESSIVE = ("'s", "’s", "＇s")


def trim_filter(w: str) -> str:
    """TrimFilter.java:36 — strip leading/trailing whitespace."""
    return w.strip()


def english_possessive(w: str) -> str:
    """EnglishPossessiveFilter.java:54 — drop a trailing possessive 's."""
    if len(w) >= 2 and w[-1] in "sS" and w[-2] in "'’＇":
        return w[:-2]
    return w


def decimal_digit(w: str) -> str:
    """DecimalDigitFilter.java:42 — fold any Unicode decimal digit to
    its 0-9 equivalent (Arabic-Indic, Devanagari, fullwidth, ...)."""
    if w.isascii():
        return w
    out = []
    for ch in w:
        d = unicodedata.decimal(ch, None)
        out.append(chr(ord("0") + d) if d is not None else ch)
    return "".join(out)


def reverse_filter(w: str) -> str:
    """ReverseStringFilter.java:54 — reverse the token (the leading-
    wildcard trick: index reversed terms, rewrite *foo -> oof*)."""
    return w[::-1]


def make_length(min_len: int, max_len: int) -> Callable[[str], str | None]:
    """LengthFilter.java:41 — drop tokens outside [min_len, max_len];
    position holes are kept (FilteringTokenFilter semantics)."""
    def length_filter(w: str) -> str | None:
        return w if min_len <= len(w) <= max_len else None
    return length_filter


def make_truncate(length: int) -> Callable[[str], str]:
    """TruncateTokenFilter.java:39 — cut tokens to a fixed prefix."""
    def truncate_filter(w: str) -> str:
        return w[:length]
    return truncate_filter


def make_keep_words(words) -> Callable[[str], str | None]:
    """KeepWordFilter.java:33 — the inverse stop filter: drop every token
    NOT in the keep set (position holes kept)."""
    keep = frozenset(
        w.strip() for w in (words.split(",") if isinstance(words, str)
                            else words) if w.strip())

    def keep_words(w: str) -> str | None:
        return w if w in keep else None
    return keep_words


def make_pattern_replace(pattern: str, repl: str,
                         all_matches: bool = True) -> Callable[[str], str]:
    """PatternReplaceFilter.java:46 — regex replace within each token."""
    rx = re.compile(pattern)
    def pattern_replace(w: str) -> str:
        return rx.sub(repl, w) if all_matches else rx.sub(repl, w, count=1)
    return pattern_replace


_SOUNDEX_MAP = {}
for _chars, _d in (("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
                   ("l", "4"), ("mn", "5"), ("r", "6")):
    for _c in _chars:
        _SOUNDEX_MAP[_c] = _d
        _SOUNDEX_MAP[_c.upper()] = _d


def double_metaphone_filter(w: str) -> str:
    """DoubleMetaphoneFilter with inject=false, primary code only
    (analysis/phonetic/.../DoubleMetaphoneFilter.java:31, maxCodeLength 4;
    the full (primary, alternate) encoder is analysis.metaphone
    .double_metaphone — the 1:1 chain contract keeps the primary here;
    unencodable tokens pass through, as the reference's filter keeps
    non-convertible tokens)."""
    from .metaphone import double_metaphone

    p, _ = double_metaphone(w)
    return p if p else w


def soundex_filter(w: str) -> str:
    """American Soundex (the reference's PhoneticFilter + commons-codec
    Soundex, analysis/phonetic/PhoneticFilter.java:36, in replace mode):
    first letter + 3 digits; h/w transparent between same codes, vowels
    separate. Tokens with no letter pass through unchanged."""
    letters = [c for c in w if c.isalpha()]
    if not letters:
        return w
    first = letters[0]
    prev = _SOUNDEX_MAP.get(first, "")
    codes: list[str] = []
    for ch in letters[1:]:
        if ch in "hwHW":
            continue                    # transparent: prev code persists
        d = _SOUNDEX_MAP.get(ch)
        if d is None:                   # vowel (or non-ASCII): separator
            prev = ""
            continue
        if d != prev:
            codes.append(d)
        prev = d
    return (first.lower() + "".join(codes) + "000")[:4]


def apostrophe_filter(w: str) -> str:
    """tr/ApostropheFilter.java:36 — strip everything from the first
    apostrophe (ASCII or U+2019) on, the apostrophe included (Turkish
    proper-name suffix separation)."""
    for i, ch in enumerate(w):
        if ch in "'\u2019":
            return w[:i]
    return w


def german_normalization(w: str) -> str:
    """de/GermanNormalizationFilter.java:41 — the German2-snowball fold:
    ß→ss; ä/ö/ü→a/o/u; and 'e' deleted after an a/o/u that opened the
    umlaut state (so 'ae'→'a', 'ue'→'u' unless following a vowel or q),
    replicated as the same 3-state FSM (N/V/U)."""
    N, V, U = 0, 1, 2
    state = N
    out: list[str] = []
    for c in w:
        if c in "ao":
            out.append(c)
            state = U
        elif c == "u":
            out.append(c)
            state = U if state == N else V
        elif c == "e":
            if state == U:
                state = V
                continue          # delete the 'e' of the digraph
            out.append(c)
            state = V
        elif c in "iqy":
            out.append(c)
            state = V
        elif c == "ä":
            out.append("a")
            state = V
        elif c == "ö":
            out.append("o")
            state = V
        elif c == "ü":
            out.append("u")
            state = V
        elif c == "ß":
            out.append("ss")
            state = N
        else:
            out.append(c)
            state = N
    return "".join(out)


def scandinavian_fold(w: str) -> str:
    """miscellaneous/ScandinavianFoldingFilter.java:79 — å/ä/æ→a, ö/ø→o,
    plus single-pass digraph collapse (a[aeo]→a, o[eo]→o), same
    left-to-right scan-with-delete as the reference (so 'aaa'→'aa')."""
    buf = list(w)
    i = 0
    while i < len(buf):
        c = buf[i]
        if c in "åäæ":
            buf[i] = "a"
        elif c in "ÅÄÆ":
            buf[i] = "A"
        elif c in "öø":
            buf[i] = "o"
        elif c in "ÖØ":
            buf[i] = "O"
        elif i < len(buf) - 1:
            nxt = buf[i + 1]
            if c in "aA" and nxt in "aAeEoO":
                del buf[i + 1]
            elif c in "oO" and nxt in "eEoO":
                del buf[i + 1]
        i += 1
    return "".join(buf)


def ascii_fold_filter(w: str) -> str:
    """ASCIIFoldingFilter role (delegates to the existing fold)."""
    from .analyzers import ascii_fold

    return ascii_fold(w)


def unicode_fold(w: str) -> str:
    """ICUFoldingFilter role (analysis/icu/ICUFoldingFilter.java:51 —
    that impl applies UTR#30 foldings via an ICU data file; no ICU in
    this env, so this is the stdlib equivalent of its main foldings):
    NFKC compatibility decomposition, combining-mark (Mn) removal
    (accent fold), then full case fold. Covers the diacritic /
    fullwidth / ligature cases ICU's table covers for the scripts the
    UAX#29 tokenizer emits; language-specific tailorings are out."""
    if w.isascii():
        return w.casefold()
    decomposed = unicodedata.normalize("NFKD", w)
    stripped = "".join(
        c for c in decomposed if unicodedata.category(c) != "Mn")
    return unicodedata.normalize("NFKC", stripped).casefold()


# name -> (factory?, n_args). Plain functions take no config args.
_PLAIN = {
    "trim": trim_filter,
    "english_possessive": english_possessive,
    "decimal_digit": decimal_digit,
    "reverse": reverse_filter,
    "ascii_fold": ascii_fold_filter,
    "soundex": soundex_filter,
    "double_metaphone": double_metaphone_filter,
    "apostrophe": apostrophe_filter,
    "german_normalization": german_normalization,
    "scandinavian_fold": scandinavian_fold,
    "unicode_fold": unicode_fold,
}
_FACTORY = {
    "length": make_length,
    "keep_words": make_keep_words,
    "truncate": make_truncate,
    "pattern_replace": make_pattern_replace,
}
# filters that can return None (drop): used to pick the vectorized
# uniques-only application (1:1 chains) vs the in-loop drop path
_DROPPING = {"length", "keep_words"}


def build_chain(spec) -> tuple[Callable[[str], str | None] | None, bool]:
    """Compose a filter spec -> (chain_fn, has_drops).

    chain_fn is None for an empty spec. has_drops is True when any filter
    may emit None (token removal -> doclen/positions must be re-derived,
    the slow per-doc path)."""
    if not spec:
        return None, False
    fns = []
    has_drops = False
    for entry in spec:
        if isinstance(entry, str):
            name, args = entry, ()
        else:
            name, args = entry[0], tuple(entry[1:])
        if name in _PLAIN:
            if args:
                raise ValueError(f"filter {name!r} takes no arguments")
            fns.append(_PLAIN[name])
        elif name in _FACTORY:
            fns.append(_FACTORY[name](*args))
        else:
            raise ValueError(
                f"unknown token filter {name!r}; options: "
                f"{sorted(_PLAIN) + sorted(_FACTORY)}")
        has_drops = has_drops or name in _DROPPING
    if len(fns) == 1:
        return fns[0], has_drops

    def chain(w: str) -> str | None:
        for f in fns:
            w = f(w)
            if w is None:
                return None
        return w
    return chain, has_drops


def edge_grams(term: str, min_gram: int, max_gram: int) -> list[str]:
    """EdgeNGramTokenFilter.java:39 grams of one token, EXCLUDING the full
    term itself (the original token is always kept — preserveOriginal
    semantics, the standard search-as-you-type config; all grams stack at
    the token's position as posInc-0 insertions)."""
    hi = min(max_gram, len(term) - 1)
    return [term[:g] for g in range(min_gram, hi + 1)]
