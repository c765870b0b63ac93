"""KStem — Bob Krovetz's dictionary-validated English stemmer.

Role parity: analysis/common/src/java/org/apache/lucene/analysis/en/
KStemFilter.java:49 + KStemmer.java:71 (the most common English stemmer in
real Solr schemas). Unlike Porter, every candidate transformation is
validated against a ~28k-word lexicon, so the output is (almost always) a
real word: "indices"->"index" stays, "sses" over-stripping never happens.

The lexicon (the KStemData1..8 word lists plus the exception /
direct-conflation / country-nationality tables from KStemmer.java:75-225)
ships as data in ``data/kstem_lexicon.json.gz`` — it is the published CIIR
lexicon, i.e. WHAT to compute, and loads lazily once per process. The
algorithm below is a fresh Python implementation of the published rule
sequence (plural -> past tense -> aspect -> derivational endings, each step
dictionary-checked), mirroring KStemmer.java's step order and its j/k
stem-boundary state machine because that order IS the algorithm's
semantics.

Per-process memoization makes the per-token cost one dict hit for repeated
tokens (the reference's commented-out cache, always worth it in a
map_batches loop over Zipfian text).
"""

from __future__ import annotations

import gzip
import json
import os

_MAX_WORD_LEN = 50

_LEXICON_PATH = os.path.join(os.path.dirname(__file__), "data",
                             "kstem_lexicon.json.gz")

# entry: (root or None, is_exception). None root = the word itself is the
# stem. Exception entries (KStemmer.java exceptionWords) keep themselves as
# root but make pastTense/aspect reject the bare-"e" dictionary hit.
_DICT: dict[str, tuple] | None = None
_CACHE: dict[str, str] = {}


def _load() -> dict[str, tuple]:
    global _DICT
    if _DICT is None:
        with gzip.open(_LEXICON_PATH, "rt") as f:
            raw = json.load(f)
        d: dict[str, tuple] = {}
        for w in raw["dict"]:
            d[w] = (None, False)
        for a, b in raw["nationality"]:
            d[a] = (b, False)
        for a, b in raw["conflations"]:
            d[a] = (b, False)
        for w in raw["exception"]:
            d[w] = (w, True)
        _DICT = d
    return _DICT


_VOWELS = frozenset("aeiou")


class _Buf:
    """OpenStringBuilder semantics: set_length only moves the logical end,
    so growing it back re-exposes the previous characters — several rule
    paths (the -eer restore, doubled-consonant restores) depend on that."""

    __slots__ = ("b", "n")

    def __init__(self, s: str):
        self.b = list(s)
        self.n = len(s)

    def __getitem__(self, i: int) -> str:
        return self.b[i]

    def __setitem__(self, i: int, c: str) -> None:
        self.b[i] = c

    def __len__(self) -> int:
        return self.n

    def set_length(self, n: int) -> None:
        self.n = n

    def append(self, s: str) -> None:
        for c in s:
            if self.n < len(self.b):
                self.b[self.n] = c
            else:
                self.b.append(c)
            self.n += 1

    def value(self) -> str:
        return "".join(self.b[:self.n])


class _KStem:
    """One stemming run's mutable state: the char buffer plus the j (last
    stem char) / k (last word char) indices of the reference algorithm."""

    __slots__ = ("w", "j", "k", "matched", "dict")

    def __init__(self, dct):
        self.dict = dct

    # --- primitives --------------------------------------------------------

    def _s(self) -> str:
        return self.w.value()

    def is_cons(self, i: int) -> bool:
        ch = self.w[i]
        if ch in _VOWELS:
            return False
        if ch != "y" or i == 0:
            return True
        return not self.is_cons(i - 1)

    def vowel_in_stem(self) -> bool:
        return any(not self.is_cons(i) for i in range(self.j + 1))

    def double_c(self, i: int) -> bool:
        return i >= 1 and self.w[i] == self.w[i - 1] and self.is_cons(i)

    def ends_in(self, s: str) -> bool:
        """Fixed-length suffix check. For suffixes of length 2..4 the
        reference leaves j untouched on failure; the char[] overload
        (length >= 5 here) sets j=k before comparing (so j stays k on a
        comparison failure) — both mirrored."""
        n = len(s)
        if n > self.k:
            return False
        if n >= 5:
            self.j = self.k
        r = len(self.w) - n
        for i in range(n):
            if self.w[r + i] != s[i]:
                return False
        self.j = r - 1
        return True

    def set_length(self, n: int) -> None:
        self.w.set_length(n)

    def append(self, s: str) -> None:
        self.w.append(s)

    def set_suffix(self, s: str) -> None:
        self.set_length(self.j + 1)
        self.append(s)
        self.k = self.j + len(s)

    def lookup(self) -> bool:
        self.matched = self.dict.get(self._s())
        return self.matched is not None

    def word_in_dict(self):
        if self.matched is not None:
            return self.matched
        e = self.dict.get(self._s())
        if e is not None and not e[1]:
            self.matched = e
        return e

    # --- rule steps (KStemmer.java order) ----------------------------------

    def plural(self) -> None:
        if self.w[self.k] != "s":
            return
        if self.ends_in("ies"):
            self.set_length(self.j + 3)
            self.k -= 1
            if self.lookup():       # calories -> calorie
                return
            self.k += 1
            self.append("s")
            self.set_suffix("y")
            self.lookup()
        elif self.ends_in("es"):
            self.set_length(self.j + 2)
            self.k -= 1
            # no exception check: aides -> aide but crosses !-> crosse
            try_e = (self.j > 0
                     and not (self.w[self.j] == "s"
                              and self.w[self.j - 1] == "s"))
            if try_e and self.lookup():
                return
            self.set_length(self.j + 1)
            self.k -= 1
            if self.lookup():
                return
            self.append("e")
            self.k += 1
            if not try_e:
                self.lookup()
        else:
            if (len(self.w) > 3 and self.w[self.k - 1] != "s"
                    and not self.ends_in("ous")):
                # not "ous"/double-s: drop the final "s"
                self.set_length(self.k)
                self.k -= 1
                self.lookup()

    def past_tense(self) -> None:
        if len(self.w) <= 4:        # fled must not become fl
            return
        if self.ends_in("ied"):
            self.set_length(self.j + 3)
            self.k -= 1
            if self.lookup():       # died -> die, not dy
                return
            self.k += 1
            self.append("d")
            self.set_suffix("y")
            self.lookup()
            return
        if self.ends_in("ed") and self.vowel_in_stem():
            self.set_length(self.j + 2)
            self.k = self.j + 1
            entry = self.word_in_dict()
            if entry is not None and not entry[1]:
                return              # root ends in e, and it's no exception
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            if self.double_c(self.k):
                self.set_length(self.k)
                self.k -= 1
                if self.lookup():   # backfilled -> backfill
                    return
                self.append(self.w[self.k])
                self.k += 1
                self.lookup()
                return
            if self.w[0] == "u" and self.w[1] == "n":
                self.append("ed")
                self.k += 2         # un- prefix: leave the word alone
                return
            self.set_length(self.j + 1)
            self.append("e")        # microcoded -> microcode
            self.k = self.j + 1

    def aspect(self) -> None:
        if len(self.w) <= 5:        # aging -> age via the conflation table
            return
        if self.ends_in("ing") and self.vowel_in_stem():
            self.w[self.j + 1] = "e"
            self.set_length(self.j + 2)
            self.k = self.j + 1
            entry = self.word_in_dict()
            if entry is not None and not entry[1]:
                return
            self.set_length(self.k)
            self.k -= 1             # the "e" (and "ing") are gone now
            if self.lookup():
                return
            if self.double_c(self.k):
                self.k -= 1
                self.set_length(self.k + 1)
                if self.lookup():
                    return
                self.append(self.w[self.k])  # fingerspelling -> fingerspell
                self.k += 1
                self.lookup()
                return
            if self.j > 0 and self.is_cons(self.j) and self.is_cons(self.j - 1):
                self.k = self.j
                self.set_length(self.k + 1)  # footstamping -> footstamp
                return
            self.set_length(self.j + 1)
            self.append("e")        # microcoding -> microcode
            self.k = self.j + 1

    def ity_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ity"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            self.append("e")
            self.k = self.j + 1
            if self.lookup():
                return
            self.w[self.j + 1] = "i"
            self.append("ty")
            self.k = old_k
            if (self.j > 0 and self.w[self.j - 1] == "i"
                    and self.w[self.j] == "l"):
                self.set_length(self.j - 1)
                self.append("le")   # -ability/-ibility -> -ble
                self.k = self.j
                self.lookup()
                return
            if (self.j > 0 and self.w[self.j - 1] == "i"
                    and self.w[self.j] == "v"):
                self.set_length(self.j + 1)
                self.append("e")    # -ivity -> -ive
                self.k = self.j + 1
                self.lookup()
                return
            if (self.j > 0 and self.w[self.j - 1] == "a"
                    and self.w[self.j] == "l"):
                self.set_length(self.j + 1)  # -ality: drop the -ity
                self.k = self.j
                self.lookup()
                return
            if self.lookup():       # immunity -> immune, capacity stays
                return
            self.set_length(self.j + 1)
            self.k = self.j

    def ness_endings(self) -> None:
        if self.ends_in("ness"):    # productive: always accept
            self.set_length(self.j + 1)
            self.k = self.j
            if self.w[self.j] == "i":
                self.w[self.j] = "y"
            self.lookup()

    def ion_endings(self) -> None:
        old_k = self.k
        if not self.ends_in("ion"):
            return
        if self.ends_in("ization"):  # always convert to -ize
            self.set_length(self.j + 3)
            self.append("e")
            self.k = self.j + 3
            self.lookup()
            return
        if self.ends_in("ition"):
            self.set_length(self.j + 1)
            self.append("e")
            self.k = self.j + 1
            if self.lookup():       # definition -> define
                return
            self.set_length(self.j + 1)
            self.append("ition")
            self.k = old_k
        elif self.ends_in("ation"):
            self.set_length(self.j + 3)
            self.append("e")
            self.k = self.j + 3
            if self.lookup():       # elimination -> eliminate
                return
            self.set_length(self.j + 1)
            self.append("e")
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():       # resignation -> resign
                return
            self.set_length(self.j + 1)
            self.append("ation")
            self.k = old_k
        if self.ends_in("ication"):
            self.set_length(self.j + 1)
            self.append("y")
            self.k = self.j + 1
            if self.lookup():       # amplification -> amplify
                return
            self.set_length(self.j + 1)
            self.append("ication")
            self.k = old_k
        self.j = self.k - 3         # plain -ion (YCS restructuring)
        self.set_length(self.j + 1)
        self.append("e")
        self.k = self.j + 1
        if self.lookup():
            return
        self.set_length(self.j + 1)
        self.k = self.j
        if self.lookup():
            return
        self.set_length(self.j + 1)
        self.append("ion")
        self.k = old_k

    def er_and_or_endings(self) -> None:
        old_k = self.k
        if self.w[self.k] != "r":
            return
        if self.ends_in("izer"):    # -ize is productive: accept as root
            self.set_length(self.j + 4)
            self.k = self.j + 3
            self.lookup()
            return
        if self.ends_in("er") or self.ends_in("or"):
            word_char = self.w[self.j + 1]
            if self.double_c(self.j):
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.append(self.w[self.j - 1])
            if self.w[self.j] == "i":   # -ier
                self.w[self.j] = "y"
                self.set_length(self.j + 1)
                self.k = self.j
                if self.lookup():
                    return
                self.w[self.j] = "i"
                self.append("e")
            if self.w[self.j] == "e":   # -eer
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.append("e")
            self.set_length(self.j + 2)
            self.k = self.j + 1
            if self.lookup():       # drop just the -r
                return
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():       # drop -er/-or
                return
            self.append("e")
            self.k = self.j + 1
            if self.lookup():       # -or -> -e
                return
            self.set_length(self.j + 1)
            self.append(word_char + "r")
            self.k = old_k

    def ly_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ly"):
            self.w[self.j + 2] = "e"    # -ly -> -le
            if self.lookup():
                return
            self.w[self.j + 2] = "y"
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            if (self.j > 0 and self.w[self.j - 1] == "a"
                    and self.w[self.j] == "l"):
                return              # -ally always becomes -al
            self.append("ly")
            self.k = old_k
            if (self.j > 0 and self.w[self.j - 1] == "a"
                    and self.w[self.j] == "b"):
                self.w[self.j + 2] = "e"    # -ably always becomes -able
                self.k = self.j + 2
                return
            if self.w[self.j] == "i":   # militarily -> military
                self.set_length(self.j)
                self.append("y")
                self.k = self.j
                if self.lookup():
                    return
                self.set_length(self.j)
                self.append("ily")
                self.k = old_k
            self.set_length(self.j + 1)
            self.k = self.j

    def al_endings(self) -> None:
        old_k = self.k
        if len(self.w) < 4:
            return
        if self.ends_in("al"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            if self.double_c(self.j):
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.append(self.w[self.j - 1])
            self.set_length(self.j + 1)
            self.append("e")        # -al -> -e
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("um")       # optimal -> optimum
            self.k = self.j + 2
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("al")
            self.k = old_k
            if (self.j > 0 and self.w[self.j - 1] == "i"
                    and self.w[self.j] == "c"):
                self.set_length(self.j - 1)     # drop -ical
                self.k = self.j - 2
                if self.lookup():
                    return
                self.set_length(self.j - 1)
                self.append("y")    # bibliographical -> bibliography
                self.k = self.j - 1
                if self.lookup():
                    return
                self.set_length(self.j - 1)
                self.append("ic")   # default: -ical -> -ic
                self.k = self.j
                self.lookup()
                return
            if self.w[self.j] == "i":   # -ial sometimes drops
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.append("ial")
                self.k = old_k
                self.lookup()

    def ive_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ive"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            self.append("e")
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("ive")
            if (self.j > 0 and self.w[self.j - 1] == "a"
                    and self.w[self.j] == "t"):
                self.w[self.j - 1] = "e"
                self.set_length(self.j)     # determinative -> determine
                self.k = self.j - 1
                if self.lookup():
                    return
                self.set_length(self.j - 1)  # drop -ative
                if self.lookup():
                    return
                self.append("ative")
                self.k = old_k
            self.w[self.j + 2] = "o"    # injunctive -> injunction
            self.w[self.j + 3] = "n"
            if self.lookup():
                return
            self.w[self.j + 2] = "v"
            self.w[self.j + 3] = "e"
            self.k = old_k

    def ize_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ize"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            self.append("i")
            if self.double_c(self.j):
                self.set_length(self.j)
                self.k = self.j - 1
                if self.lookup():
                    return
                self.append(self.w[self.j - 1])
            self.set_length(self.j + 1)
            self.append("e")
            self.k = self.j + 1
            if self.lookup():
                return
            self.set_length(self.j + 1)
            self.append("ize")
            self.k = old_k

    def ment_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ment"):
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():
                return
            self.append("ment")
            self.k = old_k

    def ble_endings(self) -> None:
        old_k = self.k
        if self.ends_in("ble"):
            if self.w[self.j] not in ("a", "i"):
                return
            word_char = self.w[self.j]
            self.set_length(self.j)
            self.k = self.j - 1
            if self.lookup():
                return
            if self.double_c(self.k):
                self.set_length(self.k)
                self.k -= 1
                if self.lookup():
                    return
                self.k += 1
                self.append(self.w[self.k - 1])
            self.set_length(self.j)
            self.append("e")        # -a/ible -> -e
            self.k = self.j
            if self.lookup():
                return
            self.set_length(self.j)
            self.append("ate")      # compensable -> compensate
            self.k = self.j + 2
            if self.lookup():
                return
            self.set_length(self.j)
            self.append(word_char + "ble")
            self.k = old_k

    def ism_endings(self) -> None:
        if self.ends_in("ism"):     # productive: always accept
            self.set_length(self.j + 1)
            self.k = self.j
            self.lookup()

    def ic_endings(self) -> None:
        if self.ends_in("ic"):
            self.set_length(self.j + 3)
            self.append("al")       # canonic -> canonical
            self.k = self.j + 4
            if self.lookup():
                return
            self.w[self.j + 1] = "y"
            self.set_length(self.j + 2)
            self.k = self.j + 1
            if self.lookup():       # -ic -> -y
                return
            self.w[self.j + 1] = "e"
            if self.lookup():       # -ic -> -e
                return
            self.set_length(self.j + 1)
            self.k = self.j
            if self.lookup():       # drop -ic
                return
            self.append("ic")
            self.k = self.j + 2

    def ncy_endings(self) -> None:
        if self.ends_in("ncy"):
            if self.w[self.j] not in ("e", "a"):
                return
            self.w[self.j + 2] = "t"    # -ncy -> -nt
            self.set_length(self.j + 3)
            self.k = self.j + 2
            if self.lookup():
                return
            self.w[self.j + 2] = "c"    # default -> -nce
            self.append("e")
            self.k = self.j + 3
            self.lookup()

    def nce_endings(self) -> None:
        old_k = self.k
        if self.ends_in("nce"):
            word_char = self.w[self.j]
            if word_char not in ("e", "a"):
                return
            self.set_length(self.j)
            self.append("e")        # adherance -> adhere
            self.k = self.j
            if self.lookup():
                return
            self.set_length(self.j)     # disappearance -> disappear
            self.k = self.j - 1
            if self.lookup():
                return
            self.append(word_char + "nce")
            self.k = old_k

    # --- driver -------------------------------------------------------------

    def stem(self, term: str) -> str:
        k = len(term) - 1
        if k <= 1 or k >= _MAX_WORD_LEN - 1:
            return term
        entry = self.dict.get(term)
        if entry is not None:
            return entry[0] if entry[0] is not None else term
        if not term.isascii() or not term.isalpha() or not term.islower():
            return term             # must be pre-lowercased a-z
        self.w = _Buf(term)
        self.j = 0
        self.k = k
        self.matched = None
        while True:
            self.plural()
            if self.matched is not None:
                break
            self.past_tense()
            if self.matched is not None:
                break
            self.aspect()
            if self.matched is not None:
                break
            self.ity_endings()
            if self.matched is not None:
                break
            self.ness_endings()
            if self.matched is not None:
                break
            self.ion_endings()
            if self.matched is not None:
                break
            self.er_and_or_endings()
            if self.matched is not None:
                break
            self.ly_endings()
            if self.matched is not None:
                break
            self.al_endings()
            if self.matched is not None:
                break
            self.word_in_dict()     # catches the current form itself
            self.ive_endings()
            if self.matched is not None:
                break
            self.ize_endings()
            if self.matched is not None:
                break
            self.ment_endings()
            if self.matched is not None:
                break
            self.ble_endings()
            if self.matched is not None:
                break
            self.ism_endings()
            if self.matched is not None:
                break
            self.ic_endings()
            if self.matched is not None:
                break
            self.ncy_endings()
            if self.matched is not None:
                break
            self.nce_endings()
            break
        if self.matched is not None and self.matched[0] is not None:
            return self.matched[0]  # Italians -> Italy via the tables
        return self._s()


def kstem(word: str) -> str:
    """Stem one (lowercased) token; memoized per process."""
    try:
        return _CACHE[word]
    except KeyError:
        out = _KStem(_load()).stem(word)
        if len(_CACHE) < 1_000_000:  # Zipf head; bounded
            _CACHE[word] = out
        return out
