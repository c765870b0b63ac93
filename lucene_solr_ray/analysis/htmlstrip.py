"""HTML -> text extraction (the reference's HTMLStripCharFilter role).

Replicates the observable behavior of the reference's html stripper
(lucene/analysis/common/.../charfilter/HTMLStripCharFilter.jflex) as a
single left-to-right pass:

* block-level tags emit "\\n"; the inline elements (the grammar's
  InlineElment set, HTMLStripCharFilter.jflex:117-142) emit nothing;
* <script>/<style> drop tag AND content (one "\\n"), with the grammar's
  comment state: a <!-- ... --> inside the element hides any </script>
  it contains, and single/double-quoted strings inside that comment hide
  "-->" (backslash escapes honored);
* tags may carry quoted attribute values containing '>' / '<' / comments
  (the server-side-include shapes from HTMLStripCharFilterTest.java:423);
* comments (including "<!--- ... --->") are dropped; an UNTERMINATED
  comment drops the rest of the input; "<!"/"<?" markup declarations and
  processing instructions drop through the first '>' and are echoed
  verbatim when unterminated ("<![endif]" stays);
* CDATA content is kept verbatim (no tag-strip, no entity decode); an
  unterminated "<![CDATA[" keeps the rest verbatim;
* character entities decode (named incl. uppercase variants, decimal,
  hex); a bare '&' or '<' that opens no construct passes through;
* `escaped_tags` (the constructor option) emits the listed tags verbatim
  while still processing everything around them (script/style content is
  still dropped).

Offset bookkeeping (the JFlex charfilter's reason for existing) is
unnecessary here — downstream stages consume the extracted string itself.

The per-row contract (BASELINE.json input_hint) is byte-identical
extracted text per url; tests pin extract(synthesize_html(text)).strip()
== text over the deterministic corpus generator's template space (the
strip removes only the block-tag newlines framing the body text).
"""

from __future__ import annotations

import html as _html
import re

# InlineElment, HTMLStripCharFilter.jflex:117-142 — these tags emit
# nothing; every other element emits "\n"
_INLINE = frozenset((
    "a", "b", "i", "q", "s", "u", "abbr", "acronym", "basefont", "bdo",
    "big", "cite", "code", "dfn", "em", "font", "img", "input", "kbd",
    "label", "samp", "select", "small", "span", "strike", "strong", "sub",
    "sup", "textarea", "tt", "var",
))

# open/close tag with attributes; quoted values may contain <, > and
# comment-looking text (SSI shapes). Name = unicode letter start.
_TAG_RE = re.compile(
    r"<(/?)\s*([^\W\d][-.:\w]*)"
    r"((?:\"[^\"]*\"|'[^']*'|[^<>\"'])*)"
    r">",
    re.UNICODE,
)

_COMMENT_EVT = re.compile(r"-->|['\"]")

# the reference's entity table maps the NAMED entity nbsp to a plain ASCII
# space (HTMLCharacterEntities.jflex:124), unlike HTML5's U+00A0; numeric
# &#160; still decodes to U+00A0
_NBSP_RE = re.compile(r"&nbsp;")


def _unescape(seg: str) -> str:
    if "&" not in seg:
        return seg
    return _html.unescape(_NBSP_RE.sub(" ", seg))


def _scan_comment(s: str, i: int) -> int:
    """Inside a script/style <!-- comment: find its end, treating quoted
    strings (with backslash escapes) as opaque. Returns index after -->,
    or len(s) when unterminated."""
    n = len(s)
    while True:
        m = _COMMENT_EVT.search(s, i)
        if m is None:
            return n
        if m.group() == "-->":
            return m.end()
        q = m.group()
        k = m.end()
        while True:
            k2 = s.find(q, k)
            if k2 < 0:
                return n
            b = k2 - 1
            while b >= 0 and s[b] == "\\":
                b -= 1
            if (k2 - 1 - b) % 2 == 0:  # even backslashes: real close quote
                i = k2 + 1
                break
            k = k2 + 1


def _skip_scripted(s: str, i: int, which: str) -> tuple[int, str]:
    """Skip <script>/<style> content from i: returns (index after the
    closing tag, the closing tag's text) — ('' and len(s) if unterminated).
    Comments inside hide any closing tag they contain."""
    evt = re.compile(rf"<!--|</\s*{which}\s*>", re.IGNORECASE)
    n = len(s)
    while True:
        m = evt.search(s, i)
        if m is None:
            return n, ""
        if m.group() == "<!--":
            i = _scan_comment(s, m.end())
        else:
            return m.end(), m.group()


def html_to_text(raw: str | bytes,
                 escaped_tags: set[str] | frozenset[str] | None = None) -> str:
    """Strip markup and decode entities; keep text content bytes unchanged."""
    if isinstance(raw, (bytes, bytearray, memoryview)):
        raw = bytes(raw).decode("utf-8")
    s = raw
    esc = frozenset(t.lower() for t in escaped_tags) if escaped_tags else ()
    out: list[str] = []
    i, n = 0, len(s)
    find = s.find
    unescape = _unescape
    while i < n:
        j = find("<", i)
        if j < 0:
            out.append(unescape(s[i:]))
            break
        if j > i:
            out.append(unescape(s[i:j]))
        if s.startswith("!--", j + 1):
            k = find("-->", j + 4)
            if k < 0:
                break  # unterminated comment: rest of input dropped
            i = k + 3
            continue
        if s.startswith("![CDATA[", j + 1):
            k = find("]]>", j + 9)
            if k < 0:
                out.append(s[j + 9:])  # unterminated: content verbatim
                break
            out.append(s[j + 9:k])
            i = k + 3
            continue
        nxt = s[j + 1:j + 2]
        if nxt in ("!", "?"):
            k = find(">", j)
            if k < 0:
                out.append(s[j:])  # unclosed angle bang: echoed as-is
                break
            i = k + 1
            continue
        m = _TAG_RE.match(s, j)
        if m is None:
            out.append("<")  # bare '<' in text
            i = j + 1
            continue
        closing, name = m.group(1), m.group(2).lower()
        if not closing and name in ("script", "style"):
            end_i, close_text = _skip_scripted(s, m.end(), name)
            if name in esc:
                out.append(m.group(0))
                out.append(close_text)
            else:
                out.append("\n")
            i = end_i
            continue
        if name in esc:
            out.append(m.group(0))
        elif name not in _INLINE:
            out.append("\n")
        i = m.end()
    return "".join(out)
