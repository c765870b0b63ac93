"""Analyzer chains (the reference's Analyzer/TokenFilter composition).

``standard_analyzer`` = StandardTokenizer -> LowerCaseFilter -> (no stop
words), matching the reference default (StandardAnalyzer.java:81-88; the
default stop set is CharArraySet.EMPTY_SET, StandardAnalyzer.java:51-53).

Filters are plain callables over (tokens, positions) so custom chains can be
composed config-style (the reference's Analyzer.createComponents extension
surface, SURVEY.md §2.15).
"""

from __future__ import annotations

from .lowercase import java_lower
from .tokenizer import MAX_TOKEN_LENGTH, standard_tokenize, tokenize_fast_ascii


def standard_analyzer(text: str, stopwords: frozenset[str] | None = None,
                      max_token_length: int = MAX_TOKEN_LENGTH):
    """Returns (terms, positions) for one document field."""
    tokens, positions = standard_tokenize(text, max_token_length)
    terms = [java_lower(t) for t in tokens]
    if stopwords:
        # StopFilter keeps position holes (FilteringTokenFilter.java:48-57)
        kept = [(t, p) for t, p in zip(terms, positions) if t not in stopwords]
        terms = [t for t, _ in kept]
        positions = [p for _, p in kept]
    return terms, positions


def standard_analyzer_offsets(text: str,
                              stopwords: frozenset[str] | None = None,
                              max_token_length: int = MAX_TOKEN_LENGTH):
    """standard_analyzer + char offsets: (terms, positions, starts, ends).

    Offsets index into ``text`` exactly as tokenized (LowerCaseFilter and
    stemmers never change offsets, the reference's filter contract)."""
    from .tokenizer import standard_tokenize_offsets

    tokens, positions, starts, ends = standard_tokenize_offsets(
        text, max_token_length)
    terms = [java_lower(t) for t in tokens]
    if stopwords:
        kept = [(t, p, s, e) for t, p, s, e
                in zip(terms, positions, starts, ends) if t not in stopwords]
        terms = [t for t, _, _, _ in kept]
        positions = [p for _, p, _, _ in kept]
        starts = [s for _, _, s, _ in kept]
        ends = [e for _, _, _, e in kept]
    return terms, positions, starts, ends


def analyze_fast(text: str, max_token_length: int = MAX_TOKEN_LENGTH):
    """ASCII fast path: lowercase the whole string once (ASCII lowercase
    never moves UAX#29 word boundaries), tokenize with one C findall.
    Returns the term list with implicit positions 0..n-1, or None when the
    general path is required. Output is identical to standard_analyzer on
    texts it accepts (property-tested)."""
    toks = tokenize_fast_ascii(text.lower(), max_token_length)
    return toks


def tokenize_batch(texts, stopwords: frozenset[str] | None = None):
    """Analyze a batch of strings -> list of (terms, positions) pairs."""
    return [standard_analyzer(t or "", stopwords) for t in texts]


# --- extension filters (SURVEY.md §2.2 token filter library, subset) -------

def shingle_filter(terms: list[str], n: int = 2, sep: str = " ") -> list[str]:
    """ShingleFilter: word n-grams over the token stream."""
    return [sep.join(terms[i:i + n]) for i in range(len(terms) - n + 1)]


def ngram_filter(term: str, min_n: int = 3, max_n: int = 3) -> list[str]:
    """NGramTokenFilter: character n-grams of one token."""
    out = []
    for n in range(min_n, max_n + 1):
        out.extend(term[i:i + n] for i in range(len(term) - n + 1))
    return out


def ascii_fold(term: str) -> str:
    """ASCIIFoldingFilter (approximation): NFKD-strip combining marks."""
    import unicodedata
    d = unicodedata.normalize("NFKD", term)
    return "".join(c for c in d if not unicodedata.combining(c))


import re as _re

# case-change + letter/digit boundaries: acronym runs stay whole
# ("XMLHttpRequest" -> XML, Http, Request; "PowerShot500" -> Power, Shot, 500)
_WDG_RUN = _re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]+|[a-z]+|[0-9]+")


def word_delimiter_parts(token: str) -> list[str]:
    """WordDelimiterGraphFilter subset
    (analysis/miscellaneous/WordDelimiterGraphFilter.java:63, default flags
    GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE |
    SPLIT_ON_NUMERICS, plus CATENATE_WORDS and PRESERVE_ORIGINAL): the
    lowercase word/number parts of a mixed-case / alphanumeric token, plus
    the catenated word form when it differs. Returns [] for tokens that
    don't split (the original always stays in the stream). Index-side the
    parts stack at the original token's position (posInc-0, a documented
    flattening of the reference's position graph: term/boolean recall works
    across parts; intra-word phrase positions are not modeled)."""
    runs = _WDG_RUN.findall(token)
    if len(runs) <= 1:
        return []
    parts = [r.lower() for r in runs]
    cat = "".join(p for p, r in zip(parts, runs) if not r.isdigit())
    out = list(parts)  # every part occurrence counts toward tf
    if cat and cat not in parts:
        out.append(cat)
    return out


def word_delimiter_graph_stream(
    raw_tokens: list[str], positions: list[int],
    offsets: list[int] | None = None,
    catenate_words: bool = True, catenate_numbers: bool = False,
    catenate_all: bool = False, preserve_original: bool = True,
):
    """WordDelimiterGraphFilter WITH graph semantics, pre-flattened
    (miscellaneous/WordDelimiterGraphFilter.java:99 + FlattenGraphFilter
    .java:32): parts of a split token occupy CONSECUTIVE positions and
    every following token shifts right, so a phrase query matches across
    the split ("wi-fi" indexes wi@p fi@p+1 and the phrase "wi fi" hits) —
    the behavior the posInc-0 subset (word_delimiter_parts) cannot give.

    Catenations (adjacent word runs / number runs / everything) and the
    preserved original stack at the FIRST part's position with posInc 0,
    exactly where the reference's graph arcs land after flattening
    (TestWordDelimiterGraphFilter.testLotsOfConcatenating's increments
    1,0,0,1,1,0,1 for "abc-def-123-456").

    Input tokens keep their ORIGINAL case (case change drives the split);
    output terms are lowercased. `offsets` (packed (start<<32)|end per
    token) are sliced to real per-part character ranges; catenations and
    originals span the whole token, as in the reference.

    Returns (terms, out_positions, out_offsets, overlaps) — the base
    stream holds one token per occupied position; `overlaps` is a list of
    (term, position, packed_offset_or_-1) posInc-0 insertions. Overlap
    tokens do not count toward document length (Lucene's default
    discountOverlaps norm accounting, search/similarity/BM25Similarity
    .java discountOverlaps=true)."""
    from .lowercase import java_lower

    terms: list[str] = []
    out_pos: list[int] = []
    out_off: list[int] = []
    overlaps: list[tuple] = []
    shift = 0
    for i, tok in enumerate(raw_tokens):
        p = positions[i] + shift
        packed = offsets[i] if offsets is not None else -1
        t_start = (packed >> 32) if packed >= 0 else 0
        spans = list(_WDG_RUN.finditer(tok))
        low = java_lower(tok)
        if len(spans) <= 1:
            part = java_lower(spans[0].group()) if spans else low
            terms.append(part)
            out_pos.append(p)
            out_off.append(packed)
            if preserve_original and part != low:
                overlaps.append((low, p, packed))
            continue
        parts = [java_lower(m.group()) for m in spans]
        if preserve_original:
            overlaps.append((low, p, packed))
        if catenate_all:
            overlaps.append(("".join(parts), p, packed))
        if catenate_words or catenate_numbers:
            # group ADJACENT runs of the same kind; a group of >= 2 runs
            # catenates at its first part's position
            gi = 0
            while gi < len(spans):
                is_num = spans[gi].group()[0].isdigit()
                gj = gi
                while (gj + 1 < len(spans)
                       and spans[gj + 1].group()[0].isdigit() == is_num):
                    gj += 1
                want = catenate_numbers if is_num else catenate_words
                if want and gj > gi:
                    cat = "".join(parts[gi:gj + 1])
                    if not (catenate_all and cat == "".join(parts)):
                        overlaps.append((cat, p + gi, packed))
                gi = gj + 1
        for d, (m, part) in enumerate(zip(spans, parts)):
            terms.append(part)
            out_pos.append(p + d)
            if packed >= 0:
                out_off.append(((t_start + m.start()) << 32)
                               | (t_start + m.end()))
            else:
                out_off.append(-1)
        shift += len(spans) - 1
    return terms, out_pos, out_off, overlaps


def _is_cjk_char(ch: str) -> bool:
    o = ord(ch)
    return (0x4E00 <= o <= 0x9FFF      # Han
            or 0x3400 <= o <= 0x4DBF   # Han ext A
            or 0xF900 <= o <= 0xFAFF   # Han compat
            or 0x3040 <= o <= 0x309F   # Hiragana
            or 0x30A0 <= o <= 0x30FF   # Katakana
            or 0xAC00 <= o <= 0xD7AF)  # Hangul syllables


def cjk_bigram_stream(terms: list[str], positions: list[int]):
    """CJKBigramFilter (analysis/cjk/CJKBigramFilter.java:52, the
    CJKAnalyzer role — the dictionary-less 80% substitute for morphological
    CJK analysis): position-adjacent tokens made entirely of CJK
    characters (Han / Hiragana / Katakana / Hangul) flatten into one char
    buffer and re-emit as overlapping character BIGRAMS at consecutive
    positions; an isolated single character stays a unigram. A run of m
    chars occupies max(1, m-1) positions, so following tokens shift left —
    the same stream-length change the reference's posInc-1 bigrams
    produce. Non-CJK tokens pass through untouched."""
    out_t: list[str] = []
    out_p: list[int] = []
    delta = 0
    i = 0
    n = len(terms)
    while i < n:
        t = terms[i]
        if not all(_is_cjk_char(c) for c in t):
            out_t.append(t)
            out_p.append(positions[i] + delta)
            i += 1
            continue
        # extend the run over position-adjacent all-CJK tokens (a stop
        # hole breaks the run, like the reference's non-CJK boundary)
        j = i
        chars = list(t)
        while (j + 1 < n and positions[j + 1] == positions[j] + 1
               and all(_is_cjk_char(c) for c in terms[j + 1])):
            j += 1
            chars.extend(terms[j])
        base = positions[i] + delta
        m = len(chars)
        if m == 1:
            out_t.append(chars[0])
            out_p.append(base)
        else:
            for b in range(m - 1):
                out_t.append(chars[b] + chars[b + 1])
                out_p.append(base + b)
        delta += max(1, m - 1) - (j - i + 1)
        i = j + 1
    return out_t, out_p


def whitespace_payload_analyzer(text: str, delimiter: str = "|",
                                stopwords: frozenset[str] | None = None):
    """WhitespaceTokenizer -> DelimitedPayloadTokenFilter(IntegerEncoder)
    -> LowerCaseFilter (analysis/core/WhitespaceTokenizer.java:32 +
    analysis/payloads/DelimitedPayloadTokenFilter.java:33).

    Splits on whitespace runs; a token of the form `term<delim>int` carries
    the integer as its payload, any other token carries -1 (no payload).
    Returns (terms, positions, payloads) — positions leave StopFilter-style
    holes when stopwords drop tokens.
    """
    terms: list[str] = []
    positions: list[int] = []
    payloads: list[int] = []
    pos = -1
    for raw in (text or "").split():
        pos += 1
        term, _, tail = raw.rpartition(delimiter)
        if term and tail and (tail.isdigit()
                              or (tail[0] == "-" and tail[1:].isdigit())):
            pay = int(tail)
        else:
            term, pay = raw, -1
        term = java_lower(term)
        if stopwords is not None and term in stopwords:
            continue
        terms.append(term)
        positions.append(pos)
        payloads.append(pay)
    return terms, positions, payloads
