"""Java-compatible simple (per-codepoint) lowercasing.

The reference's LowerCaseFilter applies ``Character.toLowerCase(int)`` per
codepoint (lucene/core/.../analysis/LowerCaseFilter.java:42 via
CharacterUtils.java:48-60) — Unicode *simple* lowercase, locale-free.
Python's ``str.lower()`` applies the *full* mapping from SpecialCasing.txt,
which differs in two observable ways:

* U+0130 (LATIN CAPITAL LETTER I WITH DOT ABOVE): full mapping is "i" +
  COMBINING DOT ABOVE (two codepoints); Java's simple mapping is plain "i".
* Final sigma: ``str.lower`` is context-sensitive on whole strings; applied
  per codepoint (as here) it always yields U+03C3, matching Java.

We therefore lowercase per codepoint with an override table.
"""

from __future__ import annotations

_OVERRIDES = {
    0x0130: "i",  # Java Character.toLowerCase(U+0130) == 'i'
}


class _LowerTable(dict):
    """Lazy per-codepoint lowercase table for str.translate."""

    def __missing__(self, cp: int) -> str:
        if cp in _OVERRIDES:
            low = _OVERRIDES[cp]
        else:
            low = chr(cp).lower()
            if len(low) != 1:
                # full mapping expands (SpecialCasing) -> simple mapping keeps
                # the original codepoint, except the overrides above
                low = chr(cp)
        self[cp] = low
        return low


_TABLE = _LowerTable()


def java_lower(s: str) -> str:
    """Simple per-codepoint lowercase, matching Java Character.toLowerCase."""
    if s.isascii():
        return s.lower()
    return s.translate(_TABLE)
