"""HTML -> text extraction (the reference's HTMLStripCharFilter role).

Replicates the observable behavior of the reference's html stripper
(lucene/analysis/common/.../charfilter/HTMLStripCharFilter.java, generated
from HTMLStripCharFilter.jflex): drop <script>/<style> elements *including*
their content, drop comments and CDATA wrappers and processing instructions,
drop all tags, and decode character entities. Offset bookkeeping (the JFlex
charfilter's reason for existing) is unnecessary here — downstream stages
consume the extracted string itself.

The per-row contract (BASELINE.json input_hint) is byte-identical extracted
text per url; tests pin extract(synthesize_html(text)) == text over the
deterministic corpus generator's template space.
"""

from __future__ import annotations

import html as _html
import re

_SCRIPT_RE = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE_RE = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_CDATA_RE = re.compile(r"<!\[CDATA\[(.*?)\]\]>", re.DOTALL)
_PI_RE = re.compile(r"<\?.*?\?>", re.DOTALL)
_DOCTYPE_RE = re.compile(r"<!DOCTYPE[^>]*>", re.IGNORECASE)
_TAG_RE = re.compile(r"</?[A-Za-z][^>]*>")


def html_to_text(raw: str | bytes) -> str:
    """Strip markup and decode entities; keep text content bytes unchanged."""
    if isinstance(raw, (bytes, bytearray, memoryview)):
        raw = bytes(raw).decode("utf-8")
    s = _SCRIPT_RE.sub("", raw)
    s = _STYLE_RE.sub("", s)
    s = _COMMENT_RE.sub("", s)
    # CDATA content is kept verbatim: no tag-stripping, no entity decoding
    stash: list[str] = []

    def _stash(m: re.Match) -> str:
        stash.append(m.group(1))
        return f"\x00{len(stash) - 1}\x00"

    s = _CDATA_RE.sub(_stash, s)
    s = _PI_RE.sub("", s)
    s = _DOCTYPE_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    if stash:
        s = re.sub(r"\x00(\d+)\x00", lambda m: stash[int(m.group(1))], s)
    return s
