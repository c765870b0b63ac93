"""Randomized multi-term expansion parity: expand_terms (searchsorted
ranges, prefix-narrowed regex scan, banded Damerau) vs brute-force
reference implementations over random term dictionaries. Pure numpy —
no Ray, no index build.

The brute oracles are deliberately naive: fnmatch for wildcards, full
O(nm) Damerau-Levenshtein DP for fuzzy, linear scans for ranges."""

import fnmatch
import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.search.multiterm import expand_terms
from lucene_solr_ray.search.query import Fuzzy, Prefix, TermRange, Wildcard

ALPHA = "abcxyz"
term_st = st.text(alphabet=ALPHA, min_size=1, max_size=7)
dict_st = st.lists(term_st, min_size=1, max_size=120, unique=True)


def _damerau(a: str, b: str) -> int:
    # full restricted Damerau-Levenshtein (adjacent transposition = 1 edit)
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = a[i - 1] != b[j - 1]
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                    and a[i - 2] == b[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[la][lb]


def _sorted(terms):
    return np.sort(np.asarray(terms, dtype=object))


@settings(max_examples=80, deadline=None)
@given(dict_st, term_st)
def test_prefix_expansion(terms, pre):
    got = set(expand_terms(_sorted(terms), Prefix(pre)))
    assert got == {t for t in terms if t.startswith(pre)}


@settings(max_examples=80, deadline=None)
@given(dict_st, st.text(alphabet=ALPHA + "*?", min_size=1, max_size=7))
def test_wildcard_expansion(terms, pat):
    got = set(expand_terms(_sorted(terms), Wildcard(pat)))
    # fnmatch's * and ? match the reference's WildcardQuery semantics here
    # (no char classes in the generated patterns)
    exp = {t for t in terms if fnmatch.fnmatchcase(t, pat)}
    assert got == exp


@settings(max_examples=80, deadline=None)
@given(dict_st, term_st, st.integers(1, 2))
def test_fuzzy_expansion(terms, query, k):
    got = set(expand_terms(_sorted(terms), Fuzzy(query, max_edits=k)))
    exp = {t for t in terms if _damerau(t, query) <= k}
    assert got == exp


@settings(max_examples=80, deadline=None)
@given(dict_st, term_st, term_st, st.booleans(), st.booleans())
def test_range_expansion(terms, lo, hi, inc_lo, inc_hi):
    if lo > hi:
        lo, hi = hi, lo
    got = set(expand_terms(
        _sorted(terms),
        TermRange(lo, hi, include_lower=inc_lo, include_upper=inc_hi)))
    exp = {t for t in terms
           if (t > lo or (inc_lo and t == lo))
           and (t < hi or (inc_hi and t == hi))}
    assert got == exp
