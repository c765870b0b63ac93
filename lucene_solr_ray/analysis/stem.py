"""Stemming filters.

* porter_stem — the Porter algorithm, implemented from the published
  description (M.F. Porter, "An algorithm for suffix stripping", Program
  14(3) 1980; martin.porter's public vocabulary is the golden fixture).
  Reference role: analysis/common/.../en/PorterStemFilter.java:56.
* english_minimal_stem — Savoy's minimal English plural stemmer
  (J. Savoy, CLEF light stemmers). Reference role:
  analysis/common/.../en/EnglishMinimalStemFilter.java. Chosen for the
  oracle-checked driver entry because its suffix rules are expressible as
  one SQL CASE (sql_minimal_stem below mirrors it branch for branch).
"""

from __future__ import annotations

_VOWELS = "aeiou"


def english_minimal_stem(w: str) -> str:
    """Plural-only stemming: strip a final 's' unless the suffix shape says
    otherwise; '(C)ies' -> '(C)y'."""
    n = len(w)
    if n < 3 or w[-1] != "s":
        return w
    c2 = w[-2]
    if c2 in ("u", "s"):
        return w
    if c2 == "e":
        if n > 3 and w[-3] == "i" and w[-4] not in ("a", "e"):
            return w[:-3] + "y"
        if w[-3] in ("i", "a", "o", "u"):
            return w
    return w[:-1]


def sql_minimal_stem(expr: str) -> str:
    """DuckDB CASE expression equal to english_minimal_stem({expr})."""
    w = expr
    return f"""CASE
      WHEN length({w}) < 3 OR {w} NOT LIKE '%s' THEN {w}
      WHEN {w} LIKE '%us' OR {w} LIKE '%ss' THEN {w}
      WHEN length({w}) > 3 AND {w} LIKE '%ies'
           AND substr({w}, length({w}) - 3, 1) NOT IN ('a', 'e')
        THEN substr({w}, 1, length({w}) - 3) || 'y'
      WHEN {w} LIKE '%ies' OR {w} LIKE '%aes' OR {w} LIKE '%oes'
           OR {w} LIKE '%ues' THEN {w}
      ELSE substr({w}, 1, length({w}) - 1)
    END"""


# --- Porter ----------------------------------------------------------------

def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: the number of VC alternations."""
    m = 0
    i = 0
    n = len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _ends_cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    if not (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1)):
        return False
    return w[-1] not in "wxy"


def porter_stem(w: str) -> str:  # noqa: C901 (the algorithm IS a rule list)
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w = w + "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
        ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
        ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
        ("iviti", "ive"), ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


STEMMERS = {
    "porter": porter_stem,
    "minimal_english": english_minimal_stem,
}


def get_stemmer(name: str | None):
    if not name:
        return None
    try:
        return STEMMERS[name]
    except KeyError:
        raise ValueError(f"unknown stemmer {name!r}; options: {sorted(STEMMERS)}")


def get_stemmer_cfg(cfg: dict):
    """Stemmer from a build-config dict, honoring ``protected_words`` —
    the (Set)KeywordMarkerFilter role (miscellaneous/
    SetKeywordMarkerFilter.java:32: marked tokens skip every stemmer
    downstream). Used by the build AND both query-side mirrors so a
    protected word round-trips identically."""
    stem = get_stemmer(cfg.get("stemmer"))
    prot = frozenset(cfg.get("protected_words") or ())
    if stem is None or not prot:
        return stem

    def protected_stem(w: str) -> str:
        return w if w in prot else stem(w)
    return protected_stem
