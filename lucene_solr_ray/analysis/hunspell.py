"""Hunspell dictionary stemming — the affix-rule subset of the reference's
hunspell package (analysis/common/src/java/org/apache/lucene/analysis/
hunspell/Dictionary.java:73 parsing + Stemmer.java:47 stemming).

Parses standard .aff/.dic sources and stems by affix removal validated
against the dictionary, mirroring the reference's semantics:

- SFX/PFX rule groups (same-flag groups merge), zero strip/affix ('0'),
  per-rule condition (hunspell char-class patterns anchored at the
  attachment edge), cross-product prefix+suffix application;
- twofold suffix stripping: a SECOND suffix may come off only when the
  inner rule's affix carries the outer rule's flag in its continuation
  classes (Stemmer.java applyAffix recursion — TestTwoFold/TestTwoSuffixes
  golden behavior);
- FLAG long / FLAG num / single-char flag modes; FULLSTRIP.

Out of scope (documented): compounding, REP/ICONV/OCONV conversion tables,
KEEPCASE/CIRCUMFIX/NEEDAFFIX special flags, morphological aliases — the
reference's spell-check surface rather than the stemming path. No
dictionary files ship in this environment; the engine is exercised against
the reference's own test fixtures (tests/test_hunspell.py reads the .aff/
.dic files under the reference tree).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class _Rule:
    flag: str
    strip: str
    affix: str
    cond: "re.Pattern | None"
    cont: frozenset
    cross: bool


def _cond_pattern(cond: str, suffix: bool) -> "re.Pattern | None":
    if cond in (".", ""):
        return None
    # hunspell conditions are char-class patterns; anchor at the edge the
    # affix attaches to
    pat = cond + "$" if suffix else "^" + cond
    try:
        return re.compile(pat)
    except re.error:
        return None


class HunspellStemmer:
    """One parsed (aff, dic) pair; stem() returns every dictionary stem
    (with the reference's per-homonym multiplicity)."""

    def __init__(self, aff_text: str, dic_text: str):
        self.flag_mode = "char"
        self.fullstrip = False
        self.sfx: dict[str, list[_Rule]] = {}
        self.pfx: dict[str, list[_Rule]] = {}
        self._parse_aff(aff_text)
        self.words: dict[str, list[frozenset]] = {}
        self._parse_dic(dic_text)

    # --- parsing ------------------------------------------------------------

    def _flags(self, s: str) -> frozenset:
        if not s:
            return frozenset()
        if self.flag_mode == "long":
            return frozenset(s[i:i + 2] for i in range(0, len(s) - 1, 2))
        if self.flag_mode == "num":
            return frozenset(x.strip() for x in s.split(",") if x.strip())
        return frozenset(s)

    def _parse_aff(self, text: str) -> None:
        lines = text.splitlines()
        i = 0
        while i < len(lines):
            parts = lines[i].split()
            i += 1
            if not parts:
                continue
            if parts[0] == "FLAG" and len(parts) > 1:
                if parts[1] in ("long", "num"):
                    self.flag_mode = parts[1]
                continue
            if parts[0] == "FULLSTRIP":
                self.fullstrip = True
                continue
            if parts[0] in ("SFX", "PFX") and len(parts) >= 4 \
                    and parts[3].isdigit():
                kind, flag, cross = parts[0], parts[1], parts[2] == "Y"
                count = int(parts[3])
                table = self.sfx if kind == "SFX" else self.pfx
                rules = table.setdefault(flag, [])
                for _ in range(count):
                    if i >= len(lines):
                        break
                    rp = lines[i].split()
                    i += 1
                    if len(rp) < 4 or rp[0] != kind:
                        continue
                    strip = "" if rp[2] == "0" else rp[2]
                    affix_spec = rp[3]
                    affix, _, conts = affix_spec.partition("/")
                    if affix == "0":
                        affix = ""
                    cond = rp[4] if len(rp) > 4 else "."
                    rules.append(_Rule(
                        flag, strip, affix,
                        _cond_pattern(cond, suffix=(kind == "SFX")),
                        self._flags(conts), cross))

    def _parse_dic(self, text: str) -> None:
        lines = text.splitlines()
        for ln in lines[1:]:            # first line = entry count
            ln = ln.split("\t")[0].strip()   # drop morph annotations
            if not ln:
                continue
            # escaped slash inside the word ("a\/b/FLAGS")
            word, flags = ln, ""
            m = re.match(r"^((?:[^/\\]|\\.)*)(?:/(.*))?$", ln)
            if m:
                word = m.group(1).replace("\\/", "/")
                flags = m.group(2) or ""
            self.words.setdefault(word, []).append(self._flags(flags))

    # --- stemming -----------------------------------------------------------

    def _strip_sfx(self, word: str, r: _Rule) -> str | None:
        if r.affix:
            if not word.endswith(r.affix):
                return None
            base = word[:len(word) - len(r.affix)]
        else:
            base = word
        if not base and not self.fullstrip:
            return None          # stripping the whole word needs FULLSTRIP
        cand = base + r.strip
        if not cand:
            return None
        if r.cond is not None and not r.cond.search(cand):
            return None
        return cand

    def _strip_pfx(self, word: str, r: _Rule) -> str | None:
        if r.affix:
            if not word.startswith(r.affix):
                return None
            base = word[len(r.affix):]
        else:
            base = word
        cand = r.strip + base
        if not cand:
            return None
        if not base and not self.fullstrip:
            return None
        if r.cond is not None and not r.cond.search(cand):
            return None
        return cand

    def _lookup(self, cand: str, need: str) -> int:
        return sum(1 for fl in self.words.get(cand, ()) if need in fl)

    def stem(self, word: str) -> list[str]:
        res: list[str] = []
        for _ in self.words.get(word, ()):
            res.append(word)            # bare dictionary hit, per homonym
        # suffixes (with the twofold continuation chain)
        for flag, rules in self.sfx.items():
            for r in rules:
                cand = self._strip_sfx(word, r)
                if cand is None:
                    continue
                res.extend([cand] * self._lookup(cand, flag))
                # inner strip: r2's affix must carry OUR flag in its
                # continuation classes
                for flag2, rules2 in self.sfx.items():
                    for r2 in rules2:
                        if flag not in r2.cont:
                            continue
                        cand2 = self._strip_sfx(cand, r2)
                        if cand2 is not None:
                            res.extend([cand2]
                                       * self._lookup(cand2, flag2))
        # prefixes (+ cross-product suffix)
        for flag, rules in self.pfx.items():
            for r in rules:
                cand = self._strip_pfx(word, r)
                if cand is None:
                    continue
                res.extend([cand] * self._lookup(cand, flag))
                if not r.cross:
                    continue
                for flag2, rules2 in self.sfx.items():
                    for r2 in rules2:
                        if not r2.cross:
                            continue
                        cand2 = self._strip_sfx(cand, r2)
                        if cand2 is None:
                            continue
                        n = sum(1 for fl in self.words.get(cand2, ())
                                if flag in fl and flag2 in fl)
                        res.extend([cand2] * n)
        return res

    def filter_fn(self, longest_only: bool = True):
        """1:1 token-filter form (HunspellStemFilter.java:51 with
        dedup+longestOnly): the longest stem, ties broken
        lexicographically; unknown words pass through unchanged."""
        def fn(w: str) -> str:
            stems = self.stem(w)
            if not stems:
                return w
            key = (max if longest_only else min)
            return key(sorted(set(stems)), key=lambda s: (len(s), s))
        return fn
