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


def _kstem(w: str) -> str:
    # lazy import: the ~28k-word lexicon loads only when a schema asks for
    # kstem (KStemFilter.java:49 role; see analysis/kstem.py)
    from .kstem import kstem as _k

    return _k(w)


STEMMERS["kstem"] = _kstem


_HUNSPELL_CACHE: dict = {}


def get_stemmer(name: str | None):
    if not name:
        return None
    if name.startswith("hunspell:"):
        # "hunspell:<aff_path>:<dic_path>" — HunspellStemFilter role
        # (hunspell/HunspellStemFilter.java:51, dedup + longestOnly);
        # parsed once per worker process per dictionary pair
        if name not in _HUNSPELL_CACHE:
            _, aff, dic = name.split(":", 2)
            from .hunspell import HunspellStemmer

            with open(aff, encoding="utf-8", errors="replace") as f:
                a = f.read()
            with open(dic, encoding="utf-8", errors="replace") as f:
                d = f.read()
            _HUNSPELL_CACHE[name] = HunspellStemmer(a, d).filter_fn()
        return _HUNSPELL_CACHE[name]
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


# --- Snowball English (Porter2) --------------------------------------------
# SnowballFilter + EnglishStemmer role (analysis/snowball/SnowballFilter
# .java:44; the algorithm is the public Snowball "english" spec,
# snowballstem.org/algorithms/english/stemmer.html). Implemented from the
# published spec, not the generated Java.

_P2_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_P2_EXC2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"))
_P2_VOWELS = frozenset("aeiouy")
_P2_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_P2_LI_END = frozenset("cdeghkmnrt")

_P2_STEP2 = [  # longest-first
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", "og"), ("li", ""),
]
_P2_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", ""), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
]
_P2_STEP4 = [
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
]


def _p2_is_vowel(c: str) -> bool:
    return c in _P2_VOWELS   # marked 'Y' is a consonant


def _p2_regions(w: str) -> tuple[int, int]:
    n = len(w)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if not _p2_is_vowel(w[i]) and _p2_is_vowel(w[i - 1]):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _p2_is_vowel(w[i]) and _p2_is_vowel(w[i - 1]):
            r2 = i + 1
            break
    return r1, r2


def _p2_short_syllable_at_end(w: str) -> bool:
    n = len(w)
    if n == 2:
        return _p2_is_vowel(w[0]) and not _p2_is_vowel(w[1])
    if n >= 3:
        return (not _p2_is_vowel(w[-3]) and _p2_is_vowel(w[-2])
                and not _p2_is_vowel(w[-1]) and w[-1] not in "wxY")
    return False


def porter2_stem(w: str) -> str:  # noqa: C901 (the algorithm IS a rule list)
    if len(w) <= 2:
        return w
    if w[0] == "'":
        w = w[1:]
    if w in _P2_EXC1:
        return _P2_EXC1[w]
    if len(w) <= 2:
        return w
    # prelude: mark consonant y as Y
    chars = list(w)
    for i, c in enumerate(chars):
        if c == "y" and (i == 0 or _p2_is_vowel(chars[i - 1])):
            chars[i] = "Y"
    w = "".join(chars)
    r1, r2 = _p2_regions(w)

    # step 0
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        if any(_p2_is_vowel(c) for c in w[:-2]):
            w = w[:-1]
    if w in _P2_EXC2:
        return w.replace("Y", "y")
    # step 1b
    if w.endswith(("eed", "eedly")):
        suf = "eedly" if w.endswith("eedly") else "eed"
        if len(w) - len(suf) >= r1:
            w = w[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if any(_p2_is_vowel(c) for c in stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_P2_DOUBLES):
                        w = w[:-1]
                    elif r1 >= len(w) and _p2_short_syllable_at_end(w):
                        # short word: null R1 + ends in a short syllable
                        w += "e"
                break
    # step 1c
    if (len(w) > 2 and w[-1] in "yY"
            and not _p2_is_vowel(w[-2])):
        w = w[:-1] + "i"
    # step 2 (suffix must lie in R1)
    for suf, rep in _P2_STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if len(w) > 3 and w[-4] == "l":
                        w = w[:-1]
                elif suf == "li":
                    if len(w) > 2 and w[-3] in _P2_LI_END:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break
    # step 3 (in R1; ative needs R2)
    for suf, rep in _P2_STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break
    # step 4 (in R2)
    for suf in _P2_STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break
    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
                len(w) - 1 >= r1
                and not _p2_short_syllable_at_end(w[:-1])):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) > 1 and w[-2] == "l":
        w = w[:-1]
    return w.replace("Y", "y")


# --- Savoy light stemmers ---------------------------------------------------
# Behavior of the reference's CLEF light stemmers (published algorithms,
# Jacques Savoy; de/GermanLightStemmer.java:64, es/SpanishLightStemmer.java:64,
# fr/FrenchMinimalStemmer.java:63).

_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
_DE_ST = frozenset("bdfghklmnt")


def german_light_stem(w: str) -> str:
    """GermanLightStemmer.java:64: accent/umlaut fold + two plural/case
    suffix passes ('ern', 'em/en/er/es', 'e', consonant+'s'; then 'est',
    'er/en', consonant+'st')."""
    w = w.translate(_DE_FOLD)
    n = len(w)
    if n > 5 and w.endswith("ern"):
        w, n = w[:-3], n - 3
    elif n > 4 and w[-2] == "e" and w[-1] in "mnrs":
        w, n = w[:-2], n - 2
    elif n > 3 and w[-1] == "e":
        w, n = w[:-1], n - 1
    elif n > 3 and w[-1] == "s" and w[-2] in _DE_ST:
        w, n = w[:-1], n - 1
    if n > 5 and w.endswith("est"):
        w = w[:-3]
    elif n > 4 and (w.endswith("er") or w.endswith("en")):
        w = w[:-2]
    elif n > 4 and w.endswith("st") and w[-3] in _DE_ST:
        w = w[:-2]
    return w


_ES_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")


def spanish_light_stem(w: str) -> str:
    """SpanishLightStemmer.java:64: accent fold + final vowel / plural
    strip ('o/a/e', 'os/as/es', 'eses'->'es', 'ces'->'z')."""
    if len(w) < 5:
        return w
    w = w.translate(_ES_FOLD)
    if w[-1] in "oae":
        return w[:-1]
    if w[-1] == "s":
        if w.endswith("eses"):
            return w[:-2]
        if w.endswith("ces"):
            return w[:-3] + "z"
        if w[-2] in "oae":
            return w[:-2]
    return w


def french_minimal_stem(w: str) -> str:
    """FrenchMinimalStemmer.java:63: plural 'x' ('aux'->'al'), then one
    each of s/r/e/é, then final doubled letter."""
    if len(w) < 6:
        return w
    if w[-1] == "x":
        if w[-3] == "a" and w[-2] == "u":
            return w[:-2] + "l"
        return w[:-1]
    if w[-1] == "s":
        w = w[:-1]
    if w[-1] == "r":
        w = w[:-1]
    if w[-1] == "e":
        w = w[:-1]
    if w[-1] == "é":
        w = w[:-1]
    if len(w) > 1 and w[-1] == w[-2] and w[-1].isalpha():
        w = w[:-1]
    return w


STEMMERS["english_snowball"] = porter2_stem
STEMMERS["german_light"] = german_light_stem
STEMMERS["spanish_light"] = spanish_light_stem
STEMMERS["french_minimal"] = french_minimal_stem


_FR_FOLD = {"à": "a", "á": "a", "â": "a", "ô": "o", "è": "e", "é": "e",
            "ê": "e", "ù": "u", "û": "u", "î": "i", "ç": "c"}


def _fr_norm(s: list, L: int) -> str:
    """FrenchLightStemmer.java:229 norm(): accent fold + consecutive
    duplicate-letter collapse (len > 4), strip 'ie', then one r / e / e /
    doubled letter off the end."""
    if L > 4:
        for i in range(L):
            s[i] = _FR_FOLD.get(s[i], s[i])
        out = [s[0]]
        for i in range(1, L):
            if s[i] == out[-1] and s[i].isalpha():
                continue
            out.append(s[i])
        s[:len(out)] = out
        L = len(out)
    if L > 4 and s[L - 2:L] == ["i", "e"]:
        L -= 2
    if L > 4:
        if s[L - 1] == "r":
            L -= 1
        if s[L - 1] == "e":
            L -= 1
        if s[L - 1] == "e":
            L -= 1
        if L > 1 and s[L - 1] == s[L - 2] and s[L - 1].isalpha():
            L -= 1
    return "".join(s[:L])


def french_light_stem(w: str) -> str:  # noqa: C901 (the algorithm IS a rule list)
    """Full UniNE French light stemmer (fr/FrenchLightStemmer.java:66,
    Savoy's 'Light Stemming Approaches...'); the shorter
    french_minimal_stem remains as the minimal variant."""
    s = list(w)
    L = len(s)

    def ends(suf: str) -> bool:
        return L >= len(suf) and s[L - len(suf):L] == list(suf)

    if L > 5 and s[L - 1] == "x":
        if s[L - 3] == "a" and s[L - 2] == "u" and s[L - 4] != "e":
            s[L - 2] = "l"
        L -= 1
    if L > 3 and s[L - 1] == "x":
        L -= 1
    if L > 3 and s[L - 1] == "s":
        L -= 1
    if L > 9 and ends("issement"):
        L -= 6
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 8 and ends("issant"):
        L -= 4
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 6 and ends("ement"):
        L -= 4
        if L > 3 and ends("ive"):
            L -= 1
            s[L - 1] = "f"
        return _fr_norm(s, L)
    if L > 11 and ends("ficatrice"):
        L -= 5
        s[L - 2] = "e"
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 10 and ends("ficateur"):
        L -= 4
        s[L - 2] = "e"
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 9 and ends("catrice"):
        L -= 3
        s[L - 4] = "q"
        s[L - 3] = "u"
        s[L - 2] = "e"
        return _fr_norm(s, L)
    if L > 8 and ends("cateur"):
        L -= 2
        s[L - 4] = "q"
        s[L - 3] = "u"
        s[L - 2] = "e"
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 8 and ends("atrice"):
        L -= 4
        s[L - 2] = "e"
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 7 and ends("ateur"):
        L -= 3
        s[L - 2] = "e"
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 6 and ends("trice"):
        L -= 1
        s[L - 3] = "e"
        s[L - 2] = "u"
        s[L - 1] = "r"
    if L > 5 and ends("ième"):
        return _fr_norm(s, L - 4)
    if L > 7 and ends("teuse"):
        L -= 2
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 6 and ends("teur"):
        L -= 1
        s[L - 1] = "r"
        return _fr_norm(s, L)
    if L > 5 and ends("euse"):
        return _fr_norm(s, L - 2)
    if L > 8 and ends("ère"):
        L -= 1
        s[L - 2] = "e"
        return _fr_norm(s, L)
    if L > 7 and ends("ive"):
        L -= 1
        s[L - 1] = "f"
        return _fr_norm(s, L)
    if L > 4 and (ends("folle") or ends("molle")):
        L -= 2
        s[L - 1] = "u"
        return _fr_norm(s, L)
    if L > 9 and ends("nnelle"):
        return _fr_norm(s, L - 5)
    if L > 9 and ends("nnel"):
        return _fr_norm(s, L - 3)
    if L > 4 and ends("ète"):
        L -= 1
        s[L - 2] = "e"
    if L > 8 and ends("ique"):
        L -= 4
    if L > 8 and ends("esse"):
        return _fr_norm(s, L - 3)
    if L > 7 and ends("inage"):
        return _fr_norm(s, L - 3)
    if L > 9 and ends("isation"):
        L -= 7
        if L > 5 and ends("ual"):
            s[L - 2] = "e"
        return _fr_norm(s, L)
    if L > 9 and ends("isateur"):
        return _fr_norm(s, L - 7)
    if L > 8 and ends("ation"):
        return _fr_norm(s, L - 5)
    if L > 8 and ends("ition"):
        return _fr_norm(s, L - 5)
    return _fr_norm(s, L)


STEMMERS["french_light"] = french_light_stem


# --- Hungarian / Portuguese light (UniNE, Savoy) ---------------------------

_HU_FOLD = {"á": "a", "ë": "e", "é": "e", "í": "i", "ó": "o", "ő": "o",
            "õ": "o", "ö": "o", "ú": "u", "ű": "u", "ũ": "u", "û": "u",
            "ü": "u"}
_HU_VOWELS = frozenset("aeiouy")


def hungarian_light_stem(w: str) -> str:  # noqa: C901 (rule list)
    """hu/HungarianLightStemmer.java:64 (UniNE): accent fold, then case /
    possessive / plural suffix removal and a final vowel normalize."""
    s = [_HU_FOLD.get(c, c) for c in w]
    L = len(s)

    def ends(suf: str) -> bool:
        return L >= len(suf) and s[L - len(suf):L] == list(suf)

    def vowel(c: str) -> bool:
        return c in _HU_VOWELS

    # removeCase
    if L > 6 and ends("kent"):
        L -= 4
    else:
        done = False
        if L > 5:
            for suf in ("nak", "nek", "val", "vel", "ert", "rol", "ban",
                        "ben", "bol", "nal", "nel", "hoz", "hez", "tol"):
                if ends(suf):
                    L -= 3
                    done = True
                    break
            if not done and (ends("al") or ends("el")):
                if not vowel(s[L - 3]) and s[L - 3] == s[L - 4]:
                    L -= 3
                    done = True
        if not done and L > 4:
            for suf in ("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                        "be", "ul", "ig"):
                if ends(suf):
                    L -= 2
                    done = True
                    break
            if not done and (ends("on") or ends("en")) \
                    and not vowel(s[L - 3]):
                L -= 2
                done = True
            if not done:
                c = s[L - 1]
                if c in "tn":
                    L -= 1
                elif c in "ae" and s[L - 2] == s[L - 3] \
                        and not vowel(s[L - 2]):
                    L -= 2
    # removePossessive
    if L > 6 and not vowel(s[L - 5]) and (
            ends("atok") or ends("otok") or ends("etek")):
        L -= 4
    elif L > 6 and (ends("itek") or ends("itok")):
        L -= 4
    elif L > 5 and not vowel(s[L - 4]) and (
            ends("unk") or ends("tok") or ends("tek")):
        L -= 3
    elif L > 5 and vowel(s[L - 4]) and ends("juk"):
        L -= 3
    elif L > 5 and ends("ink"):
        L -= 3
    elif L > 4 and not vowel(s[L - 3]) and (
            ends("am") or ends("em") or ends("om") or ends("ad")
            or ends("ed") or ends("od") or ends("uk")):
        L -= 2
    elif L > 4 and vowel(s[L - 3]) and (
            ends("nk") or ends("ja") or ends("je")):
        L -= 2
    elif L > 4 and (ends("im") or ends("id") or ends("ik")):
        L -= 2
    elif L > 3:
        c = s[L - 1]
        if c in "ae" and not vowel(s[L - 2]):
            L -= 1
        elif c in "md" and vowel(s[L - 2]):
            L -= 1
        elif c == "i":
            L -= 1
    # removePlural ('k' after a/o/e drops two when len > 4, else one)
    if L > 3 and s[L - 1] == "k":
        if s[L - 2] in "aoe" and L > 4:
            L -= 2
        else:
            L -= 1
    # normalize: strip one trailing a/e/i/o
    if L > 3 and s[L - 1] in "aeio":
        L -= 1
    return "".join(s[:L])


_PT_FOLD = {"à": "a", "á": "a", "â": "a", "ä": "a", "ã": "a",
            "ò": "o", "ó": "o", "ô": "o", "ö": "o", "õ": "o",
            "è": "e", "é": "e", "ê": "e", "ë": "e",
            "ù": "u", "ú": "u", "û": "u", "ü": "u",
            "ì": "i", "í": "i", "î": "i", "ï": "i", "ç": "c"}


def portuguese_light_stem(w: str) -> str:  # noqa: C901 (rule list)
    """pt/PortugueseLightStemmer.java:64 (UniNE): plural/adverb suffix
    removal (with the ns->m / is->il / ões->ão re-writes), feminine ->
    masculine normalization, final vowel strip, accent fold."""
    s = list(w)
    L = len(s)
    if L < 4:
        return w

    def ends(suf: str) -> bool:
        return L >= len(suf) and s[L - len(suf):L] == list(suf)

    # removeSuffix
    if L > 4 and ends("es") and s[L - 3] in "rslz":
        L -= 2
    elif L > 3 and ends("ns"):
        s[L - 2] = "m"
        L -= 1
    elif L > 4 and (ends("eis") or ends("éis")):
        s[L - 3] = "e"
        s[L - 2] = "l"
        L -= 1
    elif L > 4 and ends("ais"):
        s[L - 2] = "l"
        L -= 1
    elif L > 4 and ends("óis"):
        s[L - 3] = "o"
        s[L - 2] = "l"
        L -= 1
    elif L > 4 and ends("is"):
        s[L - 1] = "l"
    elif L > 3 and (ends("ões") or ends("ães")):
        L -= 1
        s[L - 2] = "ã"
        s[L - 1] = "o"
    elif L > 6 and ends("mente"):
        L -= 5
    elif L > 3 and s[L - 1] == "s":
        L -= 1
    # normFeminine
    if L > 3 and s[L - 1] == "a":
        if L > 7 and (ends("inha") or ends("iaca") or ends("eira")):
            s[L - 1] = "o"
        elif L > 6 and (ends("osa") or ends("ica") or ends("ida")
                        or ends("ada") or ends("iva") or ends("ama")):
            s[L - 1] = "o"
        elif L > 6 and ends("ona"):
            s[L - 3] = "ã"
            s[L - 2] = "o"
            L -= 1
        elif L > 6 and ends("ora"):
            L -= 1
        elif L > 6 and ends("esa"):
            s[L - 3] = "ê"
            L -= 1
        elif L > 6 and ends("na"):
            s[L - 1] = "o"
    # final vowel strip + accent fold
    if L > 4 and s[L - 1] in "eao":
        L -= 1
    return "".join(_PT_FOLD.get(c, c) for c in s[:L])


STEMMERS["hungarian_light"] = hungarian_light_stem
STEMMERS["portuguese_light"] = portuguese_light_stem
