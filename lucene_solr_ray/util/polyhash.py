"""Deterministic, SQL-replicable string hashing.

A polynomial codepoint hash mod 2^64: h(s) = sum_j cp[j] * B^(L-1-j), with
B the FNV-64 prime and cp the Unicode codepoints of s. Two properties make
it the engine-wide signature hash (simhash / fingerprints / minhash base):

* vectorized: one numpy pass over the concatenated codepoints of a whole
  batch of strings (uint64 wraparound is the mod-2^64);
* oracle-checkable: DuckDB reproduces it bit-exactly with
  list_reduce + HUGEINT arithmetic (see sql_poly_hash), so every signature
  operator gets a real value-level SQL oracle instead of a frozen fixture.
"""

from __future__ import annotations

import numpy as np

POLY_B = 1099511628211  # FNV-64 prime; fits 41 bits so HUGEINT never overflows
_MOD_2_64 = 18446744073709551616


def poly_hash_strings(strs: list[str]) -> np.ndarray:
    """uint64 polynomial codepoint hash per string (vectorized).

    Empty strings hash to 0 (the SQL list_reduce over an empty list returns
    the seed). None is treated as empty.
    """
    n = len(strs)
    out = np.zeros(n, dtype=np.uint64)
    if not n:
        return out
    strs = [s if s is not None else "" for s in strs]
    lens = np.fromiter((len(s) for s in strs), np.int64, n)
    total = int(lens.sum())
    if not total:
        return out
    cat = "".join(strs)
    cp = np.frombuffer(cat.encode("utf-32-le"), np.uint32).astype(np.uint64)
    ends = np.cumsum(lens)
    starts = ends - lens
    maxlen = int(lens.max())
    # B^k mod 2^64 via uint64 cumprod wraparound
    powers = np.empty(maxlen, dtype=np.uint64)
    powers[0] = 1
    if maxlen > 1:
        powers[1:] = np.cumprod(np.full(maxlen - 1, POLY_B, dtype=np.uint64))
    pos_from_end = np.repeat(ends, lens) - 1 - np.arange(total)
    terms = cp * powers[pos_from_end]
    nonempty = lens > 0
    seg_starts = starts[nonempty]
    out[nonempty] = np.add.reduceat(terms, seg_starts)
    return out


def sql_poly_hash(expr: str) -> str:
    """DuckDB expression computing poly_hash_strings({expr}) as HUGEINT.

    (?s) lets '.' match newlines so every codepoint is included, matching
    the Python side's full-string pass."""
    return (
        "list_reduce(list_prepend(0::HUGEINT, "
        f"list_transform(regexp_extract_all({expr}, '(?s).'), "
        "x -> unicode(x)::HUGEINT)), "
        f"(h, c) -> (h * {POLY_B}::HUGEINT + c) % {_MOD_2_64})"
    )
