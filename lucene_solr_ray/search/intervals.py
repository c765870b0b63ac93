"""Minimal-interval query algebra (lucene/queries/.../intervals/
Intervals.java:46 role).

Interval sources yield MINIMAL intervals per doc as (start, end, k) triples
(k = number of matched leaf positions, the unit count maxgaps needs);
combinators compose and filter them:

  term(t)                 one (p, p, 1) per position
  ordered(a, b, ...)      a before b before ... (non-overlapping, minimal)
  unordered(a, b, ...)    all present in any order (smallest covering ranges)
  phrase(a, b, ...)       ordered with zero gaps (consecutive)
  maxgaps(n, src)         keep intervals with (width - k) <= n
  maxwidth(w, src)        keep intervals with width <= w
  containing(big, small)  big intervals containing >= 1 small interval
  contained_by(s, big)    small intervals inside >= 1 big interval
  or_(a, b, ...)          union

Execution shape mirrors spans.py: candidate docs come from vectorized
postings set ops (intersection for ordered/unordered, union for or_), and
only surviving docs run the per-doc interval logic. freq(doc) = number of
minimal intervals, scored through a blended multi-term weight — the same
documented simplification the span scorers use.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class ITerm:
    text: str


@dataclass(frozen=True)
class IOr:
    sources: tuple


@dataclass(frozen=True)
class IOrdered:
    sources: tuple


@dataclass(frozen=True)
class IUnordered:
    sources: tuple


@dataclass(frozen=True)
class IPhrase:
    sources: tuple


@dataclass(frozen=True)
class IMaxgaps:
    gaps: int
    source: object


@dataclass(frozen=True)
class IMaxwidth:
    width: int
    source: object


@dataclass(frozen=True)
class IContaining:
    big: object
    small: object


@dataclass(frozen=True)
class IContainedBy:
    small: object
    big: object


@dataclass(frozen=True)
class INotContaining:
    big: object
    small: object


@dataclass(frozen=True)
class INotContainedBy:
    small: object
    big: object


@dataclass(frozen=True)
class IOverlapping:
    source: object
    reference: object


@dataclass(frozen=True)
class INonOverlapping:
    source: object
    reference: object


@dataclass(frozen=True)
class IBefore:
    """Intervals.before(source, reference): source intervals ending before
    the start of SOME reference interval (intervals/Intervals.java:before,
    OffsetIntervalsSource role)."""
    source: object
    reference: object


@dataclass(frozen=True)
class IAfter:
    """Intervals.after(source, reference): source intervals starting after
    the end of SOME reference interval."""
    source: object
    reference: object


@dataclass(frozen=True)
class IPrefix:
    """Intervals.prefix (intervals/Intervals.java multi-term sources):
    expands to IOr over matching dictionary terms BEFORE weight resolution
    (multiterm.rewrite -> expand_multiterm), like the reference's
    MultiTermIntervalsSource with its expansion cap."""
    prefix: str


@dataclass(frozen=True)
class IWildcard:
    pattern: str


def stem_source(src, st):
    """Rewrite every leaf ITerm through the query-side analysis fn ``st``
    (the stemmer/chain mirror applied to Term nodes in query.apply_stemmer)."""
    if isinstance(src, ITerm):
        return ITerm(st(src.text))
    if isinstance(src, (IOr, IOrdered, IUnordered, IPhrase)):
        return type(src)(tuple(stem_source(s, st) for s in src.sources))
    if isinstance(src, IMaxgaps):
        return IMaxgaps(src.gaps, stem_source(src.source, st))
    if isinstance(src, IMaxwidth):
        return IMaxwidth(src.width, stem_source(src.source, st))
    if isinstance(src, IContaining):
        return IContaining(stem_source(src.big, st), stem_source(src.small, st))
    if isinstance(src, IContainedBy):
        return IContainedBy(stem_source(src.small, st), stem_source(src.big, st))
    if isinstance(src, INotContaining):
        return INotContaining(stem_source(src.big, st),
                              stem_source(src.small, st))
    if isinstance(src, INotContainedBy):
        return INotContainedBy(stem_source(src.small, st),
                               stem_source(src.big, st))
    if isinstance(src, IOverlapping):
        return IOverlapping(stem_source(src.source, st),
                            stem_source(src.reference, st))
    if isinstance(src, (IBefore, IAfter)):
        return type(src)(stem_source(src.source, st),
                         stem_source(src.reference, st))
    if isinstance(src, INonOverlapping):
        return INonOverlapping(stem_source(src.source, st),
                               stem_source(src.reference, st))
    # IPrefix/IWildcard patterns pass through un-analyzed (the reference
    # never runs the analyzer on multi-term patterns)
    return src


# --- convenience constructors (the Intervals.java static-factory surface) --

def term(t: str) -> ITerm:
    return ITerm(t)


def _coerce(x):
    return ITerm(x) if isinstance(x, str) else x


def ordered(*sources) -> IOrdered:
    return IOrdered(tuple(_coerce(s) for s in sources))


def unordered(*sources) -> IUnordered:
    return IUnordered(tuple(_coerce(s) for s in sources))


def phrase(*sources) -> IPhrase:
    return IPhrase(tuple(_coerce(s) for s in sources))


def maxgaps(gaps: int, source) -> IMaxgaps:
    return IMaxgaps(gaps, _coerce(source))


def maxwidth(width: int, source) -> IMaxwidth:
    return IMaxwidth(width, _coerce(source))


def containing(big, small) -> IContaining:
    return IContaining(_coerce(big), _coerce(small))


def not_containing(big, small) -> INotContaining:
    """Intervals.notContaining: big intervals containing NO small interval."""
    return INotContaining(_coerce(big), _coerce(small))


def not_contained_by(small, big) -> INotContainedBy:
    """Intervals.notContainedBy: small intervals inside NO big interval."""
    return INotContainedBy(_coerce(small), _coerce(big))


def overlapping(source, reference) -> IOverlapping:
    """Intervals.overlapping: source intervals overlapping >= 1 reference."""
    return IOverlapping(_coerce(source), _coerce(reference))


def non_overlapping(source, reference) -> INonOverlapping:
    """Intervals.nonOverlapping: source intervals meeting NO reference."""
    return INonOverlapping(_coerce(source), _coerce(reference))


def before(source, reference) -> IBefore:
    return IBefore(_coerce(source), _coerce(reference))


def after(source, reference) -> IAfter:
    return IAfter(_coerce(source), _coerce(reference))


def prefix(p: str) -> IPrefix:
    return IPrefix(p)


def wildcard(pattern: str) -> IWildcard:
    return IWildcard(pattern)


def expand_multiterm(src, expander):
    """Replace IPrefix/IWildcard leaves with IOr(ITerm...) via the searcher's
    global expander (runs before weight resolution; an empty expansion
    becomes IOr(()) which yields no intervals)."""
    from .query import Prefix as QPrefix
    from .query import Wildcard as QWildcard

    if isinstance(src, IPrefix):
        return IOr(tuple(ITerm(t) for t in expander(QPrefix(src.prefix))))
    if isinstance(src, IWildcard):
        return IOr(tuple(ITerm(t) for t in expander(QWildcard(src.pattern))))
    if isinstance(src, (IOr, IOrdered, IUnordered, IPhrase)):
        return type(src)(tuple(expand_multiterm(s, expander)
                               for s in src.sources))
    if isinstance(src, IMaxgaps):
        return IMaxgaps(src.gaps, expand_multiterm(src.source, expander))
    if isinstance(src, IMaxwidth):
        return IMaxwidth(src.width, expand_multiterm(src.source, expander))
    if isinstance(src, IContaining):
        return IContaining(expand_multiterm(src.big, expander),
                           expand_multiterm(src.small, expander))
    if isinstance(src, INotContaining):
        return INotContaining(expand_multiterm(src.big, expander),
                              expand_multiterm(src.small, expander))
    if isinstance(src, IContainedBy):
        return IContainedBy(expand_multiterm(src.small, expander),
                            expand_multiterm(src.big, expander))
    if isinstance(src, INotContainedBy):
        return INotContainedBy(expand_multiterm(src.small, expander),
                               expand_multiterm(src.big, expander))
    if isinstance(src, IOverlapping):
        return IOverlapping(expand_multiterm(src.source, expander),
                            expand_multiterm(src.reference, expander))
    if isinstance(src, (IBefore, IAfter)):
        return type(src)(expand_multiterm(src.source, expander),
                         expand_multiterm(src.reference, expander))
    if isinstance(src, INonOverlapping):
        return INonOverlapping(expand_multiterm(src.source, expander),
                               expand_multiterm(src.reference, expander))
    return src


def contained_by(small, big) -> IContainedBy:
    return IContainedBy(_coerce(small), _coerce(big))


def or_(*sources) -> IOr:
    return IOr(tuple(_coerce(s) for s in sources))


# --- structure helpers -------------------------------------------------------

def terms_of(src) -> list[str]:
    """All leaf terms of a source (weights + candidate-doc resolution)."""
    if isinstance(src, ITerm):
        return [src.text]
    if isinstance(src, (IOr, IOrdered, IUnordered, IPhrase)):
        return [t for s in src.sources for t in terms_of(s)]
    if isinstance(src, (IMaxgaps, IMaxwidth)):
        return terms_of(src.source)
    if isinstance(src, (IContaining, IContainedBy, INotContaining,
                        INotContainedBy)):
        return terms_of(src.big) + terms_of(src.small)
    if isinstance(src, (IOverlapping, INonOverlapping, IBefore, IAfter)):
        return terms_of(src.source) + terms_of(src.reference)
    raise TypeError(f"unsupported interval source {src!r}")


def source_key(src) -> str:
    """Canonical string form (weights-dict key)."""
    if isinstance(src, ITerm):
        return src.text
    if isinstance(src, (IOr, IOrdered, IUnordered, IPhrase)):
        tag = type(src).__name__
        return f"{tag}({','.join(source_key(s) for s in src.sources)})"
    if isinstance(src, IMaxgaps):
        return f"IMaxgaps({src.gaps},{source_key(src.source)})"
    if isinstance(src, IMaxwidth):
        return f"IMaxwidth({src.width},{source_key(src.source)})"
    if isinstance(src, IContaining):
        return f"IContaining({source_key(src.big)},{source_key(src.small)})"
    if isinstance(src, IContainedBy):
        return f"IContainedBy({source_key(src.small)},{source_key(src.big)})"
    if isinstance(src, INotContaining):
        return f"INotContaining({source_key(src.big)},{source_key(src.small)})"
    if isinstance(src, INotContainedBy):
        return (f"INotContainedBy({source_key(src.small)},"
                f"{source_key(src.big)})")
    if isinstance(src, IOverlapping):
        return (f"IOverlapping({source_key(src.source)},"
                f"{source_key(src.reference)})")
    if isinstance(src, (IBefore, IAfter)):
        return (f"{type(src).__name__}({source_key(src.source)},"
                f"{source_key(src.reference)})")
    if isinstance(src, INonOverlapping):
        return (f"INonOverlapping({source_key(src.source)},"
                f"{source_key(src.reference)})")
    raise TypeError(f"unsupported interval source {src!r}")


# --- doc-level candidates ----------------------------------------------------

def _docs_of(src, term_docs: dict) -> np.ndarray:
    """Sorted candidate doc ids that could yield >= 1 interval."""
    if isinstance(src, ITerm):
        return term_docs[src.text]
    if isinstance(src, IOr):
        parts = [_docs_of(s, term_docs) for s in src.sources]
        return np.unique(np.concatenate(parts)) if parts else np.zeros(0, np.int64)
    if isinstance(src, (IOrdered, IUnordered, IPhrase)):
        out = None
        for s in src.sources:
            d = _docs_of(s, term_docs)
            out = d if out is None else out[np.isin(out, d, assume_unique=True)]
            if not len(out):
                break
        return out if out is not None else np.zeros(0, np.int64)
    if isinstance(src, (IMaxgaps, IMaxwidth)):
        return _docs_of(src.source, term_docs)
    if isinstance(src, IContaining):
        a = _docs_of(src.big, term_docs)
        b = _docs_of(src.small, term_docs)
        return a[np.isin(a, b, assume_unique=True)]
    if isinstance(src, IContainedBy):
        a = _docs_of(src.small, term_docs)
        b = _docs_of(src.big, term_docs)
        return a[np.isin(a, b, assume_unique=True)]
    if isinstance(src, INotContaining):
        # the exclusion may be absent: every big doc is a candidate
        return _docs_of(src.big, term_docs)
    if isinstance(src, INotContainedBy):
        return _docs_of(src.small, term_docs)
    if isinstance(src, IOverlapping):
        a = _docs_of(src.source, term_docs)
        b = _docs_of(src.reference, term_docs)
        return a[np.isin(a, b, assume_unique=True)]
    if isinstance(src, (IBefore, IAfter)):
        a = _docs_of(src.source, term_docs)
        b = _docs_of(src.reference, term_docs)
        return a[np.isin(a, b, assume_unique=True)]
    if isinstance(src, INonOverlapping):
        # the reference may be absent: every source doc is a candidate
        return _docs_of(src.source, term_docs)
    raise TypeError(f"unsupported interval source {src!r}")


# --- per-doc interval kernels ------------------------------------------------

_EMPTY = np.zeros((0, 3), dtype=np.int64)


def _minimalize(iv: np.ndarray) -> np.ndarray:
    """Drop intervals that contain another interval (minimal-set contract)."""
    if len(iv) <= 1:
        return iv
    order = np.lexsort((iv[:, 1], iv[:, 0]))
    iv = iv[order]
    # same start: only the shortest survives (later ones contain it)
    first = np.ones(len(iv), dtype=bool)
    first[1:] = iv[1:, 0] != iv[:-1, 0]
    iv = iv[first]
    if len(iv) <= 1:
        return iv
    # starts strictly ascending now: i contains a later j iff e_j <= e_i
    e = iv[:, 1]
    suff_min = np.minimum.accumulate(e[::-1])[::-1]
    keep = np.ones(len(iv), dtype=bool)
    keep[:-1] = e[:-1] < suff_min[1:]
    return iv[keep]


def _ordered_iv(children: list[np.ndarray], consecutive: bool) -> np.ndarray:
    """Greedy chain from every anchor interval of child 0, minimalized."""
    if any(not len(c) for c in children):
        return _EMPTY
    anchors = children[0]
    start = anchors[:, 0].copy()
    cur_e = anchors[:, 1].copy()
    ks = anchors[:, 2].copy()
    alive = np.ones(len(anchors), dtype=bool)
    for ch in children[1:]:
        s_arr = ch[:, 0]
        idx = np.searchsorted(s_arr, cur_e + 1, side="left")
        ok = idx < len(ch)
        idx_c = np.minimum(idx, len(ch) - 1)
        if consecutive:
            ok &= s_arr[idx_c] == cur_e + 1
        alive &= ok
        cur_e = np.where(alive, ch[idx_c, 1], cur_e)
        ks = ks + np.where(alive, ch[idx_c, 2], 0)
    if not alive.any():
        return _EMPTY
    out = np.stack([start[alive], cur_e[alive], ks[alive]], axis=1)
    return _minimalize(out)


def _unordered_iv(children: list[np.ndarray]) -> np.ndarray:
    """Smallest covering ranges holding one interval per child, minimalized."""
    if any(not len(c) for c in children):
        return _EMPTY
    k = len(children)
    ptrs = [0] * k
    out = []
    while True:
        starts = [children[j][ptrs[j], 0] for j in range(k)]
        ends = [children[j][ptrs[j], 1] for j in range(k)]
        kk = sum(int(children[j][ptrs[j], 2]) for j in range(k))
        lo_j = int(np.argmin(starts))
        out.append((int(min(starts)), int(max(ends)), kk))
        ptrs[lo_j] += 1
        if ptrs[lo_j] >= len(children[lo_j]):
            break
    return _minimalize(np.asarray(out, dtype=np.int64).reshape(-1, 3))


def _intervals(src, pos_of: dict, doc: int) -> np.ndarray:
    """Minimal intervals of `src` in one doc: (m, 3) int64 sorted by start."""
    if isinstance(src, ITerm):
        p = pos_of[src.text].get(doc)
        if p is None or not len(p):
            return _EMPTY
        return np.stack([p, p, np.ones(len(p), np.int64)], axis=1).astype(np.int64)
    if isinstance(src, IOr):
        parts = [_intervals(s, pos_of, doc) for s in src.sources]
        parts = [p for p in parts if len(p)]
        if not parts:
            return _EMPTY
        return _minimalize(np.concatenate(parts))
    if isinstance(src, (IOrdered, IPhrase)):
        return _ordered_iv([_intervals(s, pos_of, doc) for s in src.sources],
                           consecutive=isinstance(src, IPhrase))
    if isinstance(src, IUnordered):
        return _unordered_iv([_intervals(s, pos_of, doc) for s in src.sources])
    if isinstance(src, IMaxgaps):
        iv = _intervals(src.source, pos_of, doc)
        if not len(iv):
            return iv
        gaps = iv[:, 1] - iv[:, 0] + 1 - iv[:, 2]
        return iv[gaps <= src.gaps]
    if isinstance(src, IMaxwidth):
        iv = _intervals(src.source, pos_of, doc)
        if not len(iv):
            return iv
        return iv[iv[:, 1] - iv[:, 0] + 1 <= src.width]
    if isinstance(src, IContaining):
        big = _intervals(src.big, pos_of, doc)
        small = _intervals(src.small, pos_of, doc)
        if not len(big) or not len(small):
            return _EMPTY
        # big [s,e] contains some small [s2,e2] iff min e2 among s2 >= s is <= e
        suff_min = np.minimum.accumulate(small[::-1, 1])[::-1]
        idx = np.searchsorted(small[:, 0], big[:, 0], side="left")
        ok = idx < len(small)
        idx_c = np.minimum(idx, len(small) - 1)
        ok &= suff_min[idx_c] <= big[:, 1]
        return big[ok]
    if isinstance(src, IContainedBy):
        small = _intervals(src.small, pos_of, doc)
        big = _intervals(src.big, pos_of, doc)
        if not len(big) or not len(small):
            return _EMPTY
        # small [s2,e2] inside some big [s,e] iff max e among s <= s2 is >= e2
        pref_max = np.maximum.accumulate(big[:, 1])
        idx = np.searchsorted(big[:, 0], small[:, 0], side="right") - 1
        ok = idx >= 0
        idx_c = np.maximum(idx, 0)
        ok &= pref_max[idx_c] >= small[:, 1]
        return small[ok]
    if isinstance(src, INotContaining):
        big = _intervals(src.big, pos_of, doc)
        if not len(big):
            return _EMPTY
        small = _intervals(src.small, pos_of, doc)
        if not len(small):
            return big
        suff_min = np.minimum.accumulate(small[::-1, 1])[::-1]
        idx = np.searchsorted(small[:, 0], big[:, 0], side="left")
        has = idx < len(small)
        idx_c = np.minimum(idx, len(small) - 1)
        has &= suff_min[idx_c] <= big[:, 1]
        return big[~has]
    if isinstance(src, INotContainedBy):
        small = _intervals(src.small, pos_of, doc)
        if not len(small):
            return _EMPTY
        big = _intervals(src.big, pos_of, doc)
        if not len(big):
            return small
        pref_max = np.maximum.accumulate(big[:, 1])
        idx = np.searchsorted(big[:, 0], small[:, 0], side="right") - 1
        inside = idx >= 0
        idx_c = np.maximum(idx, 0)
        inside &= pref_max[idx_c] >= small[:, 1]
        return small[~inside]
    if isinstance(src, IOverlapping):
        sv = _intervals(src.source, pos_of, doc)
        rf = _intervals(src.reference, pos_of, doc)
        if not len(sv) or not len(rf):
            return _EMPTY
        # [s,e] overlaps some ref [s2,e2] iff max e2 among s2 <= e is >= s
        pref_max = np.maximum.accumulate(rf[:, 1])
        idx = np.searchsorted(rf[:, 0], sv[:, 1], side="right") - 1
        ok = idx >= 0
        idx_c = np.maximum(idx, 0)
        ok &= pref_max[idx_c] >= sv[:, 0]
        return sv[ok]
    if isinstance(src, IBefore):
        sv = _intervals(src.source, pos_of, doc)
        rf = _intervals(src.reference, pos_of, doc)
        if not len(sv) or not len(rf):
            return _EMPTY
        # exists a reference interval starting after the source's end
        return sv[sv[:, 1] < int(rf[:, 0].max())]
    if isinstance(src, IAfter):
        sv = _intervals(src.source, pos_of, doc)
        rf = _intervals(src.reference, pos_of, doc)
        if not len(sv) or not len(rf):
            return _EMPTY
        return sv[sv[:, 0] > int(rf[:, 1].min())]
    if isinstance(src, INonOverlapping):
        sv = _intervals(src.source, pos_of, doc)
        if not len(sv):
            return _EMPTY
        rf = _intervals(src.reference, pos_of, doc)
        if not len(rf):
            return sv
        pref_max = np.maximum.accumulate(rf[:, 1])
        idx = np.searchsorted(rf[:, 0], sv[:, 1], side="right") - 1
        hit = idx >= 0
        idx_c = np.maximum(idx, 0)
        hit &= pref_max[idx_c] >= sv[:, 0]
        return sv[~hit]
    raise TypeError(f"unsupported interval source {src!r}")


# --- shard-level evaluation --------------------------------------------------

def _term_positions(shard, t: str):
    """(sorted doc ids, {doc -> sorted positions}) for one term."""
    docs, freqs, pos = shard.postings(t, with_positions=True)
    per_doc: dict[int, np.ndarray] = {}
    if len(docs):
        cum = np.concatenate([[0], np.cumsum(freqs.astype(np.int64))])
        dl = docs.tolist()
        for i in range(len(dl)):
            per_doc[dl[i]] = pos[cum[i]:cum[i + 1]].astype(np.int64)
    return docs, per_doc


def eval_interval_query(shard, node, weights, dtype):
    """Evaluate an IntervalQuery against one shard -> (docs, scores)."""
    from .bm25 import score_postings

    src = node.source
    term_docs: dict[str, np.ndarray] = {}
    pos_of: dict[str, dict] = {}
    for t in set(terms_of(src)):
        d, p = _term_positions(shard, t)
        term_docs[t] = d
        pos_of[t] = p
    cand = _docs_of(src, term_docs)
    docs_out, freqs_out = [], []
    for d in cand.tolist():
        iv = _intervals(src, pos_of, d)
        if len(iv):
            docs_out.append(d)
            freqs_out.append(len(iv))
    if not docs_out:
        return np.zeros(0, np.int64), np.zeros(0, dtype)
    docs = np.asarray(docs_out, dtype=np.int64)
    freqs = np.asarray(freqs_out, dtype=np.int32)
    tw = weights[("\x1fIV\x1f" + source_key(src), node.boost)]
    norms = shard.norms_for(docs)
    return docs, score_postings(tw, freqs, norms, dtype)
