"""Per-shard query execution kernels (vectorized, block-at-a-time).

The reference executes doc-at-a-time scorers (TermScorer, WANDScorer,
BlockMaxConjunctionScorer — search/*.java); here every kernel is a numpy
array program over decoded posting blocks: unions are concat+sort+reduceat,
conjunctions are sorted intersections, and the top-level disjunction path
implements block-max WAND pruning at 128-doc block granularity using the
per-block (max_freq, min_norm) impacts stored at build time.

Parity contract (tested): WAND-pruned results == exhaustive results,
including float-exact scores and the lower-doc-id tie break.
"""

from __future__ import annotations

import numpy as np

from ..index.reader import IndexReader, ShardReader
from .bm25 import TermWeight, score_postings
from .query import (
    Bool,
    ConstantScore,
    DisMax,
    FeatureQuery,
    FunctionScore,
    IntervalQuery,
    MatchAll,
    MultiPhrase,
    NumericInSet,
    NumericRange,
    Phrase,
    Synonym,
    Term,
    TermInSet,
)


def _is_span(n) -> bool:
    from .query import SpanFirst, SpanNear, SpanNot

    return isinstance(n, (SpanNear, SpanFirst, SpanNot))


def _field_of(reader: IndexReader, text: str) -> str | None:
    """Analyzed-field prefix of a term ('title:ray' -> 'title'), or None
    for text-field / keyword-field terms."""
    i = text.find(":")
    if i > 0 and text[:i] in reader.analyzed_fields:
        return text[:i]
    return None


def resolve_weights(reader: IndexReader, node, params, dtype) -> dict:
    """Global-stats Weight resolution (the reference's createWeight step):
    df summed across shards once per query, then broadcast to every shard.
    ``params`` is a BM25Params (legacy) or any Similarity instance.

    Analyzed-field terms resolve against the FIELD's collection stats
    (docCount(field), sumTotalTermFreq(field)) and are tagged with
    norm_field so every kernel scores them against the field's norms."""
    from .similarity import as_similarity

    sim = as_similarity(params)
    weights: dict = {}
    N = reader.doc_count
    sum_ttf = reader.sum_total_term_freq

    def _ctx(first_term: str) -> tuple[int, int, str | None]:
        fld = _field_of(reader, first_term)
        if hasattr(sim, "set_field"):
            # PerFieldSimilarityWrapper routing: the wrapper resolves the
            # delegate before weight construction (its createWeight step)
            sim.set_field(fld)
        if fld is None:
            return N, sum_ttf, None
        fn, fttf = reader.field_stats(fld)
        return fn, fttf, fld

    def walk(n):
        if n is None:
            return
        if isinstance(n, Term):
            key = (n.text, n.boost)
            if key not in weights:
                df, ttf = reader.term_stats(n.text)
                fN, fttf, fld = _ctx(n.text)
                w = sim.weight(df, ttf, fN, fttf, n.boost, dtype)
                w.norm_field = fld
                weights[key] = w
        elif isinstance(n, Phrase):
            key = ("\x1f".join(n.terms), n.boost)
            if key not in weights:
                st = [reader.term_stats(t) for t in n.terms]
                fN, fttf, fld = _ctx(n.terms[0])
                w = sim.multi_weight(
                    [s[0] for s in st], [s[1] for s in st], fN, fttf,
                    n.boost, dtype)
                w.norm_field = fld
                weights[key] = w
        elif isinstance(n, Synonym):
            # SynonymQuery blends stats: df = max over members, scored as one
            # pseudo-term over the summed freqs (SynonymQuery.java:55)
            key = ("\x1fSYN\x1f".join(n.terms), n.boost)
            if key not in weights:
                st = [reader.term_stats(t) for t in n.terms]
                df = max((s[0] for s in st), default=0)
                ttf = sum(s[1] for s in st)
                fN, fttf, fld = _ctx(n.terms[0])
                w = sim.weight(df, ttf, fN, fttf, n.boost, dtype)
                w.norm_field = fld
                weights[key] = w
        elif isinstance(n, MultiPhrase):
            key = ("\x1fMP\x1f".join("|".join(p) for p in n.positions), n.boost)
            if key not in weights:
                st = [[reader.term_stats(t) for t in pos] for pos in n.positions]
                fN, fttf, fld = _ctx(n.positions[0][0]) if n.positions and n.positions[0] else (N, sum_ttf, None)
                w = sim.multi_weight(
                    [max((s[0] for s in pos), default=0) for pos in st],
                    [sum(s[1] for s in pos) for pos in st],
                    fN, fttf, n.boost, dtype)
                w.norm_field = fld
                weights[key] = w
        elif _is_span(n):
            from .spans import _span_key, span_clause_terms
            from .query import SpanNear as _SN

            key = _span_key(n)
            if key not in weights:
                from .query import SpanNot as _SNOT

                if isinstance(n, _SN):
                    clauses = n.clauses
                elif isinstance(n, _SNOT):
                    clauses = (n.include,)  # exclude only filters
                else:
                    clauses = (n.clause,)
                st = [[reader.term_stats(t) for t in span_clause_terms(c)]
                      for c in clauses]
                if hasattr(sim, "set_field"):
                    sim.set_field(None)  # spans score the main text field
                weights[key] = sim.multi_weight(
                    [max((s[0] for s in c), default=0) for c in st],
                    [sum(s[1] for s in c) for c in st],
                    N, sum_ttf, n.boost, dtype)
        elif isinstance(n, IntervalQuery):
            from .intervals import source_key, terms_of

            key = ("\x1fIV\x1f" + source_key(n.source), n.boost)
            if key not in weights:
                st = [reader.term_stats(t) for t in set(terms_of(n.source))]
                if hasattr(sim, "set_field"):
                    sim.set_field(None)  # intervals score the text field
                weights[key] = sim.multi_weight(
                    [s[0] for s in st], [s[1] for s in st], N, sum_ttf,
                    n.boost, dtype)
        elif isinstance(n, ConstantScore):
            walk(n.query)
        elif isinstance(n, FunctionScore):
            walk(n.query)
        elif isinstance(n, DisMax):
            for c in n.clauses:
                walk(c)
        else:
            from .query import BlendedTerm as _BT
            from .query import CombinedField as _CF
            from .query import Covering as _Cov
            from .query import TermAutomaton as _TA

            if isinstance(n, _Cov):
                for c in n.clauses:
                    walk(c)
            elif isinstance(n, _TA):
                key = _ta_key(n)
                if key not in weights:
                    # summed idf over matched terms only (df > 0),
                    # TermAutomatonWeight:357-374
                    st = [reader.term_stats(t) for t in n.terms()]
                    st = [s for s in st if s[0] > 0]
                    if hasattr(sim, "set_field"):
                        sim.set_field(None)
                    weights[key] = sim.multi_weight(
                        [s[0] for s in st], [s[1] for s in st], N, sum_ttf,
                        n.boost, dtype)
            elif isinstance(n, _BT):
                # blended artificial stats: df = max, ttf = sum (:276-281);
                # each member keeps its OWN field context and norms
                stats = [reader.term_stats(t) for t, _ in n.term_boosts]
                bdf = max((s[0] for s in stats), default=0)
                bttf = sum(s[1] for s in stats)
                for t, b in n.term_boosts:
                    key = _bt_key(n, t, b * n.boost)
                    if key not in weights:
                        fN, fttf, fld = _ctx(t)
                        w = sim.weight(bdf, max(1, bttf), fN, fttf,
                                       b * n.boost, dtype)
                        w.norm_field = fld
                        weights[key] = w
            elif isinstance(n, _CF):
                # BM25FQuery pseudo stats (BM25FQuery.java:279-315)
                key = _cf_key(n)
                if key not in weights:
                    df = 0
                    ttf = 0.0
                    for f, fw in n.field_weights:
                        for t in n.terms:
                            d, tt = reader.term_stats(f"{f}:{t}")
                            df = max(df, d)
                            ttf += float(np.float32(fw)) * tt
                    dc = 0
                    sttf = 0.0
                    for f, fw in n.field_weights:
                        fn_, fttf_ = reader.field_stats(f)
                        dc = max(dc, fn_)
                        sttf += float(np.float32(fw)) * fttf_
                    if hasattr(sim, "set_field"):
                        sim.set_field(None)
                    w = sim.weight(df, max(1, int(ttf)), max(1, dc),
                                   max(1, int(sttf)), n.boost, dtype)
                    w.norm_field = None  # kernel combines norms itself
                    weights[key] = w
        if isinstance(n, Bool):
            for c in n.must + n.should + n.must_not + n.filter:
                walk(c)

    walk(node)
    return weights


def _cf_key(n) -> tuple:
    return ("\x1fCF\x1f"
            + "|".join(f"{f}^{w}" for f, w in n.field_weights)
            + "\x1f" + "|".join(n.terms), n.boost)


def _bt_ident(n) -> str:
    """Node-identity prefix scoping member-weight keys to the WHOLE
    BlendedTerm: two nodes sharing a member term blend DIFFERENT df/ttf
    stats, so (term, boost) alone would collide."""
    return "\x1fBT\x1f" + "|".join(f"{t}^{b}" for t, b in n.term_boosts) \
        + "\x1f"


def _bt_key(n, term: str, boost: float, ident: str | None = None) -> tuple:
    return ((ident if ident is not None else _bt_ident(n)) + term, boost)


def _ta_key(n) -> tuple:
    return ("\x1fTA\x1f"
            + ";".join(f"{f}>{t}:{term}" for f, t, term in n.transitions)
            + "|" + ";".join(f"{f}>{t}" for f, t in n.any_transitions)
            + "|" + ",".join(map(str, n.accepts)), n.boost)


def _score_term_automaton(shard: ShardReader, node, weights, dtype):
    """TermAutomatonScorer: merge all automaton terms' positions per doc,
    run the determinized automaton, score freq = accepting paths."""
    from .term_automaton import determinize, run_doc

    tw = weights[_ta_key(node)]
    parts = []
    for term in node.terms():
        d, f, pos = shard.postings(term, with_positions=True)
        if len(d):
            parts.append((np.repeat(d, f), pos.astype(np.int64), term))
    if not parts:
        return np.zeros(0, np.int64), np.zeros(0, dtype)
    docs = np.concatenate([p[0] for p in parts])
    poss = np.concatenate([p[1] for p in parts])
    tids = np.concatenate([np.full(len(p[0]), i, dtype=np.int64)
                           for i, p in enumerate(parts)])
    terms = [p[2] for p in parts]
    order = np.lexsort((poss, docs))
    docs, poss, tids = docs[order], poss[order], tids[order]
    dfa_term, dfa_any, dfa_acc = determinize(
        node.num_states,
        [(f, t, term) for f, t, term in node.transitions],
        list(node.any_transitions), list(node.accepts))
    # remap term strings -> per-shard tid ints for the runner
    dfa_term = {(s, terms.index(term) if term in terms else -2): to
                for (s, term), to in dfa_term.items()}
    new = np.empty(len(docs), dtype=bool)
    new[0] = True
    new[1:] = docs[1:] != docs[:-1]
    starts = np.flatnonzero(new)
    bounds = np.append(starts, len(docs))
    out_docs, out_freqs = [], []
    for j in range(len(starts)):
        lo, hi = bounds[j], bounds[j + 1]
        freq = run_doc(list(zip(poss[lo:hi].tolist(), tids[lo:hi].tolist())),
                       dfa_term, dfa_any, dfa_acc)
        if freq > 0:
            out_docs.append(docs[lo])
            out_freqs.append(freq)
    if not out_docs:
        return np.zeros(0, np.int64), np.zeros(0, dtype)
    udocs = np.asarray(out_docs, dtype=np.int64)
    ufreqs = np.asarray(out_freqs, dtype=np.int64)
    norms = shard.norms_for(udocs, getattr(tw, "norm_field", None))
    return udocs, score_postings(tw, ufreqs, norms, dtype)


def _score_combined_field(shard: ShardReader, node, weights, dtype):
    """BM25FQuery scorer: weighted freq sum over all (term, field)
    postings, norm = combined per-field norms (MultiNormsLeafSimScorer)."""
    from ..util.smallfloat import byte4_to_int_vec, int_to_byte4_vec

    tw = weights[_cf_key(node)]
    parts = []
    for f, fw in node.field_weights:
        for t in node.terms:
            d, fr = shard.postings(f"{f}:{t}")
            if len(d):
                parts.append((d, fr.astype(np.float64) * np.float32(fw)))
    if not parts:
        return np.zeros(0, np.int64), np.zeros(0, dtype)
    docs = np.concatenate([d for d, _ in parts])
    freqs = np.concatenate([fr for _, fr in parts])
    order = np.argsort(docs, kind="stable")
    docs, freqs = docs[order], freqs[order]
    new = np.empty(len(docs), dtype=bool)
    new[0] = True
    new[1:] = docs[1:] != docs[:-1]
    starts = np.flatnonzero(new)
    udocs = docs[starts]
    wfreqs = np.add.reduceat(freqs, starts)
    fields = [f for f, _ in node.field_weights]
    if len(fields) == 1:
        norms = shard.norms_for(udocs, fields[0])
    else:
        # weighted decoded-length sum, re-quantized
        # (MultiNormsLeafSimScorer.java:124-133; Java Math.round = floor+0.5)
        acc = np.zeros(len(udocs), dtype=np.float64)
        for f, fw in node.field_weights:
            nb = shard.norms_for(udocs, f)
            acc += np.float32(fw) * byte4_to_int_vec(nb).astype(np.float64)
        norms = int_to_byte4_vec(np.floor(acc + 0.5).astype(np.int64))
    return udocs, score_postings(tw, wfreqs, norms, dtype)


def _score_term(shard: ShardReader, node: Term, weights, dtype):
    docs, freqs = shard.postings(node.text)
    if not len(docs):
        return docs, np.zeros(0, dtype=dtype)
    tw: TermWeight = weights[(node.text, node.boost)]
    norms = shard.norms_for(docs, tw.norm_field)
    return docs, score_postings(tw, freqs, norms, dtype)


_POS_SHIFT = 22  # doclen bound 2^21; (doc << SHIFT) | adjusted-position keys


def _score_phrase(shard: ShardReader, node: Phrase, weights, dtype):
    """ExactPhraseMatcher semantics, fully vectorized: each term's postings
    become (doc << SHIFT | (position - term_offset)) keys; the phrase
    occurrences are the intersection of the key sets across terms, and the
    per-doc phrase freq falls out of a run-length over the surviving keys.

    slop > 0 routes to the sloppy matcher (exact SloppyPhraseMatcher
    semantics incl. repeats handling; see _score_sloppy_phrase)."""
    if node.slop > 0:
        return _score_sloppy_phrase(shard, node, weights, dtype)
    keyed = None
    margin = len(node.terms)  # keep adjusted positions non-negative
    for i, t in enumerate(node.terms):
        docs, freqs, pos = shard.postings(t, with_positions=True)
        if not len(docs):
            return np.zeros(0, np.int64), np.zeros(0, dtype)
        doc_rep = np.repeat(docs, freqs)
        keys = (doc_rep << _POS_SHIFT) | (pos.astype(np.int64) - i + margin)
        keyed = keys if keyed is None else np.intersect1d(keyed, keys, assume_unique=True)
        if not len(keyed):
            return np.zeros(0, np.int64), np.zeros(0, dtype)
    occ_docs = keyed >> _POS_SHIFT
    new = np.empty(len(occ_docs), dtype=bool)
    new[0] = True
    new[1:] = occ_docs[1:] != occ_docs[:-1]
    starts = np.flatnonzero(new)
    docs = occ_docs[starts]
    freqs = np.diff(np.append(starts, len(occ_docs))).astype(np.int32)
    tw = weights[("\x1f".join(node.terms), node.boost)]
    norms = shard.norms_for(docs, tw.norm_field)
    return docs, score_postings(tw, freqs, norms, dtype)


def _score_multi_phrase(shard: ShardReader, node: MultiPhrase, weights, dtype):
    """MultiPhraseQuery exact matching: each position's key set is the UNION
    over its alternative terms' (doc << SHIFT | adjusted-pos) keys; the
    phrase occurrences are the intersection across positions (the
    reference's UnionPostingsEnum feeding ExactPhraseMatcher)."""
    keyed = None
    margin = len(node.positions)
    for i, alts in enumerate(node.positions):
        keys_parts = []
        for t in alts:
            docs, freqs, pos = shard.postings(t, with_positions=True)
            if not len(docs):
                continue
            doc_rep = np.repeat(docs, freqs)
            keys_parts.append(
                (doc_rep << _POS_SHIFT) | (pos.astype(np.int64) - i + margin)
            )
        if not keys_parts:
            return np.zeros(0, np.int64), np.zeros(0, dtype)
        keys = np.unique(np.concatenate(keys_parts))
        keyed = keys if keyed is None else np.intersect1d(keyed, keys, assume_unique=True)
        if not len(keyed):
            return np.zeros(0, np.int64), np.zeros(0, dtype)
    occ_docs = keyed >> _POS_SHIFT
    new = np.empty(len(occ_docs), dtype=bool)
    new[0] = True
    new[1:] = occ_docs[1:] != occ_docs[:-1]
    starts = np.flatnonzero(new)
    docs = occ_docs[starts]
    freqs = np.diff(np.append(starts, len(occ_docs))).astype(np.int32)
    tw = weights[("\x1fMP\x1f".join("|".join(p) for p in node.positions), node.boost)]
    norms = shard.norms_for(docs, tw.norm_field)
    return docs, score_postings(tw, freqs, norms, dtype)


def _sloppy_freq_doc(pls: list, slop: int, same_term_pairs: list) -> float:
    """SloppyPhraseMatcher's per-doc enumeration (SloppyPhraseMatcher.java:60):
    one pointer per phrase slot over its phrase-position list (pp = position
    - slot offset, each list sorted); repeatedly emit the current minimal
    window when (max pp - min pp) <= slop, weighting 1/(1+matchLength), then
    advance the min slot. Slots that repeat a term must occupy DISTINCT
    actual positions (the matcher's repeats handling): on a collision the
    smaller-pp slot advances before any window is scored."""
    import heapq

    k = len(pls)
    ptrs = [0] * k
    cur = [int(pl[0]) for pl in pls]

    def advance(j: int) -> bool:
        ptrs[j] += 1
        if ptrs[j] >= len(pls[j]):
            return False
        cur[j] = int(pls[j][ptrs[j]])
        return True

    heap = [(cur[j], j) for j in range(k)]
    heapq.heapify(heap)
    hi = max(cur)
    freq = 0.0
    while True:
        collided = False
        for i, j in same_term_pairs:
            if cur[i] + i == cur[j] + j:  # same actual position
                tgt = j if cur[j] <= cur[i] else i
                if not advance(tgt):
                    return freq
                collided = True
        if collided:
            heap = [(cur[j], j) for j in range(k)]
            heapq.heapify(heap)
            hi = max(cur)
            continue
        lo, j = heap[0]
        match_len = hi - lo
        if match_len <= slop:
            freq += 1.0 / (1.0 + match_len)
        if not advance(j):
            return freq
        heapq.heapreplace(heap, (cur[j], j))
        hi = max(hi, cur[j])


def _score_sloppy_phrase(shard: ShardReader, node: Phrase, weights, dtype):
    """Sloppy phrase (PhraseQuery slop>0), SloppyPhraseMatcher semantics:
    phrase positions pp = position - slot offset; a min-advance sweep emits
    each minimal window with matchLength = max(pp) - min(pp), accumulating
    sloppyFreq = sum 1/(1+matchLength) over windows within slop, with
    repeated terms forced onto distinct actual positions. Candidate docs are
    the vectorized postings intersection; only they run the per-doc sweep."""
    uniq = sorted(set(node.terms))
    per_term: dict[str, dict[int, np.ndarray]] = {}
    for t in uniq:
        docs, freqs, pos = shard.postings(t, with_positions=True)
        if not len(docs):
            return np.zeros(0, np.int64), np.zeros(0, dtype)
        cum = np.concatenate([[0], np.cumsum(freqs.astype(np.int64))])
        per_term[t] = {
            int(d): pos[cum[i]:cum[i + 1]].astype(np.int64)
            for i, d in enumerate(docs.tolist())
        }
    cand: set | None = None
    for t in uniq:
        cand = set(per_term[t]) if cand is None else cand & set(per_term[t])
    if not cand:
        return np.zeros(0, np.int64), np.zeros(0, dtype)
    k = len(node.terms)
    same_term_pairs = [
        (i, j) for i in range(k) for j in range(i + 1, k)
        if node.terms[i] == node.terms[j]
    ]
    docs_out, freqs_out = [], []
    for d in sorted(cand):
        pls = [per_term[node.terms[i]][d] - i for i in range(k)]
        f = _sloppy_freq_doc(pls, node.slop, same_term_pairs)
        if f:
            docs_out.append(d)
            freqs_out.append(f)
    if not docs_out:
        return np.zeros(0, np.int64), np.zeros(0, dtype)
    docs = np.asarray(docs_out, dtype=np.int64)
    freqs = np.asarray(freqs_out, dtype=np.float64)
    tw = weights[("\x1f".join(node.terms), node.boost)]
    norms = shard.norms_for(docs, tw.norm_field)
    return docs, score_postings(tw, freqs, norms, dtype)


def _union(results, min_should: int, dtype, shard: ShardReader | None = None):
    """Union-sum: clause scores accumulate in double and cast to the scoring
    dtype at the boolean boundary (DisjunctionSumScorer sums sub-scores as
    double and returns (float) sum).

    With a shard, uses a dense accumulator over shard-local doc slots (the
    reference's BooleanScorer window-accumulator, vectorized: O(postings),
    no sort); clause accumulation order matches the sequential clause order
    either way."""
    results = [(d, s) for d, s in results if len(d)]
    if not results:
        return np.zeros(0, np.int64), np.zeros(0, dtype)
    if shard is not None and len(shard.doc_ids):
        n = len(shard.doc_ids)
        acc = np.zeros(n, dtype=np.float64)
        hit = np.zeros(n, dtype=bool)
        counts = np.zeros(n, dtype=np.int32) if min_should > 1 else None
        for d, s in results:
            idx = np.searchsorted(shard.doc_ids, d)
            acc[idx] += s.astype(np.float64)
            hit[idx] = True
            if counts is not None:
                counts[idx] += 1
        if counts is not None:
            hit &= counts >= min_should
        sel = np.flatnonzero(hit)
        return shard.doc_ids[sel], acc[sel].astype(dtype)
    docs = np.concatenate([d for d, _ in results])
    scores = np.concatenate([s for _, s in results]).astype(np.float64)
    order = np.argsort(docs, kind="stable")
    docs = docs[order]
    scores = scores[order]
    new = np.empty(len(docs), dtype=bool)
    new[0] = True
    new[1:] = docs[1:] != docs[:-1]
    starts = np.flatnonzero(new)
    udocs = docs[starts]
    usc = np.add.reduceat(scores, starts).astype(dtype)
    if min_should > 1:
        counts = np.diff(np.append(starts, len(docs)))
        keep = counts >= min_should
        udocs, usc = udocs[keep], usc[keep]
    return udocs, usc


def _docs_union(shard: ShardReader, terms) -> np.ndarray:
    parts = [shard.postings(t)[0] for t in terms]
    parts = [p for p in parts if len(p)]
    if not parts:
        return np.zeros(0, np.int64)
    return np.unique(np.concatenate(parts))


def _iodv_dv_mask(shard: ShardReader, node, docs: np.ndarray) -> np.ndarray:
    """Verify docs against the SORTED docvalues ordinals (no postings)."""
    u, inv = shard.sorted_dv[node.field]
    pos = int(np.searchsorted(u, node.value))
    if pos >= len(u) or u[pos] != node.value:
        return np.zeros(len(docs), dtype=bool)
    idx = np.searchsorted(shard.doc_ids, docs)
    return inv[idx] == pos


def iodv_plan(shard: ShardReader, node, n_candidates: int) -> str:
    """Cost-based plan choice (IndexOrDocValuesQuery.java:50): 'dv' when
    verifying the candidates beats decoding the term's postings (lead cost
    |candidates| < df), else 'postings'. df comes from the term dictionary —
    no decode happens to make the decision."""
    if node.field not in getattr(shard, "sorted_dv", {}):
        return "postings"
    df = shard.term_stats(f"{node.field}:{node.value}")[0]
    return "dv" if n_candidates < df else "postings"


def _iodv_filter_mask(shard: ShardReader, node, docs: np.ndarray,
                      weights, dtype) -> np.ndarray:
    """Keep-mask of an IndexOrDocValues filter over candidate docs."""
    if iodv_plan(shard, node, len(docs)) == "dv":
        return _iodv_dv_mask(shard, node, docs)
    fd, _ = shard.postings(f"{node.field}:{node.value}")
    return np.isin(docs, fd, assume_unique=True)


def eval_node(shard: ShardReader, node, weights, dtype):
    """Exhaustive evaluation -> (docs sorted asc, scores)."""
    if node is None:
        return np.zeros(0, np.int64), np.zeros(0, dtype)
    from .query import IndexOrDocValues

    if isinstance(node, IndexOrDocValues):
        # standalone: nothing to lead with — postings when indexed, else a
        # full docvalues scan over the live docs
        term = f"{node.field}:{node.value}"
        if shard.term_rows(term) or node.field not in getattr(shard, "sorted_dv", {}):
            docs, _ = shard.postings(term)
        else:
            docs = shard.live_doc_ids
            docs = docs[_iodv_dv_mask(shard, node, docs)]
        return docs, np.full(len(docs), node.boost, dtype=dtype)
    if isinstance(node, Term):
        return _score_term(shard, node, weights, dtype)
    if isinstance(node, Phrase):
        return _score_phrase(shard, node, weights, dtype)
    if isinstance(node, MatchAll):
        docs = shard.live_doc_ids
        return docs, np.full(len(docs), node.boost, dtype=dtype)
    from .geo import (GeoBox, GeoDistance, GeoPolygon, box_docs,
                      distance_docs, polygon_docs)

    if isinstance(node, GeoBox):
        docs = box_docs(shard, node)
        return docs, np.full(len(docs), node.boost, dtype=dtype)
    if isinstance(node, GeoDistance):
        docs, _ = distance_docs(shard, node)
        return docs, np.full(len(docs), node.boost, dtype=dtype)
    if isinstance(node, GeoPolygon):
        docs = polygon_docs(shard, node)
        return docs, np.full(len(docs), node.boost, dtype=dtype)
    if isinstance(node, NumericRange):
        # BKD-substitute fast path: a standalone range reads only the
        # points row groups whose min/max stats overlap [lower, upper]
        # (index/points.py) instead of scanning the docvalues column —
        # the PointRangeQuery side of IndexOrDocValuesQuery.java:50. The
        # filter-verification path (few candidates) stays on docvalues.
        if node.field not in ("doclen", "doc_id") and shard.has_points(node.field):
            docs = shard.point_range(node.field, node.lower, node.upper)
            return docs, np.full(len(docs), node.boost, dtype=dtype)
        if node.field == "doclen":
            vals = shard.doclens
        elif node.field == "doc_id":
            vals = shard.doc_ids
        elif node.field in getattr(shard, "docvalues", {}):
            vals = shard.docvalues[node.field]
        else:
            raise ValueError(f"unknown numeric field {node.field!r}")
        m = np.ones(len(vals), dtype=bool)
        if node.lower is not None:
            m &= vals >= node.lower
        if node.upper is not None:
            m &= vals <= node.upper
        if shard._live_mask is not None:
            m &= shard._live_mask
        docs = shard.doc_ids[m]
        return docs, np.full(len(docs), node.boost, dtype=dtype)
    if isinstance(node, NumericInSet):
        if node.field == "doclen":
            vals = shard.doclens
        elif node.field == "doc_id":
            vals = shard.doc_ids
        elif node.field in getattr(shard, "docvalues", {}):
            vals = shard.docvalues[node.field]
        else:
            raise ValueError(f"unknown numeric field {node.field!r}")
        m = np.isin(vals, np.asarray(node.values))
        if shard._live_mask is not None:
            m &= shard._live_mask
        docs = shard.doc_ids[m]
        return docs, np.full(len(docs), node.boost, dtype=dtype)
    from .query import SortedNumericRange, SortedSetContains

    if isinstance(node, SortedNumericRange):
        if node.field not in getattr(shard, "sorted_numeric_dv", {}):
            return np.zeros(0, np.int64), np.zeros(0, dtype)
        vals, offs = shard.sorted_numeric_dv[node.field]
        lo = -np.inf if node.lo is None else float(node.lo)
        hi = np.inf if node.hi is None else float(node.hi)
        hit = (vals >= lo) & (vals <= hi)
        doc_of_flat = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
        m = np.zeros(len(shard.doc_ids), dtype=bool)
        m[doc_of_flat[hit]] = True
        if shard._live_mask is not None:
            m &= shard._live_mask
        docs = shard.doc_ids[m]
        return docs, np.full(len(docs), node.boost, dtype=dtype)
    if isinstance(node, SortedSetContains):
        if node.field not in getattr(shard, "sorted_set_dv", {}):
            return np.zeros(0, np.int64), np.zeros(0, dtype)
        u, ords, offs = shard.sorted_set_dv[node.field]
        vals = np.asarray(sorted(set(node.values)), dtype="U")
        pos = np.searchsorted(u, vals)
        inb = pos < len(u)
        pos, vals = pos[inb], vals[inb]
        targets = pos[u[pos] == vals]
        m = np.zeros(len(shard.doc_ids), dtype=bool)
        if len(targets):
            hit = np.isin(ords, targets)
            doc_of_flat = np.repeat(np.arange(len(offs) - 1), np.diff(offs))
            m[doc_of_flat[hit]] = True
        if shard._live_mask is not None:
            m &= shard._live_mask
        docs = shard.doc_ids[m]
        return docs, np.full(len(docs), node.boost, dtype=dtype)
    from .query import FieldExists

    if isinstance(node, FieldExists):
        # FieldExistsQuery.java:46 — value-presence filter per DV type
        f = node.field
        m = None
        if f in getattr(shard, "binary_dv", {}):
            vals = shard.binary_dv[f]
            m = np.array([v is not None for v in vals], dtype=bool)
        elif f in getattr(shard, "sorted_set_dv", {}):
            _, _, offs = shard.sorted_set_dv[f]
            m = np.diff(offs) > 0
        elif f in getattr(shard, "sorted_numeric_dv", {}):
            _, offs = shard.sorted_numeric_dv[f]
            m = np.diff(offs) > 0
        elif f in getattr(shard, "sorted_dv", {}):
            _, inv = shard.sorted_dv[f]
            m = np.ones(len(inv), dtype=bool)
        elif f in getattr(shard, "docvalues", {}):
            m = ~np.isnan(shard.docvalues[f])
        if m is None:
            return np.zeros(0, np.int64), np.zeros(0, dtype)
        if shard._live_mask is not None:
            m &= shard._live_mask
        docs = shard.doc_ids[m]
        return docs, np.full(len(docs), node.boost, dtype=dtype)
    from .query import DistanceFeature

    if isinstance(node, DistanceFeature):
        # LongDistanceFeatureQuery.java:43 — matches every live doc with
        # the field; score = weight * (pivot / (pivot + |v - origin|)).
        # Same multiply/divide order as the reference for float parity.
        if node.field in getattr(shard, "docvalues", {}):
            vals = shard.docvalues[node.field]
        elif node.field == "doclen":
            vals = shard.doclens.astype(np.float64)
        else:
            raise ValueError(f"unknown distance-feature field {node.field!r}")
        m = ~np.isnan(np.asarray(vals, dtype=np.float64))
        if shard._live_mask is not None:
            m &= shard._live_mask
        v = vals[m].astype(np.float64)
        dist = np.abs(v - float(node.origin))
        sc = node.weight * (float(node.pivot) / (float(node.pivot) + dist))
        return shard.doc_ids[m], sc.astype(dtype)
    if isinstance(node, FeatureQuery):
        if node.field in getattr(shard, "docvalues", {}):
            vals = shard.docvalues[node.field]
        elif node.field == "doclen":
            vals = shard.doclens.astype(np.float64)
        else:
            raise ValueError(f"unknown feature field {node.field!r}")
        m = vals > 0
        if shard._live_mask is not None:
            m &= shard._live_mask
        v = vals[m].astype(np.float64)
        if node.function == "satu":
            sc = node.weight * v / (v + node.pivot)
        elif node.function == "log":
            sc = node.weight * np.log(1.0 + v / node.pivot)
        else:
            raise ValueError(f"unknown feature function {node.function!r}")
        return shard.doc_ids[m], sc.astype(dtype)
    if isinstance(node, MultiPhrase):
        return _score_multi_phrase(shard, node, weights, dtype)
    from .query import SpanFirst, SpanNear

    if isinstance(node, SpanNear):
        from .spans import eval_span_near

        return eval_span_near(shard, node, weights, dtype)
    if isinstance(node, SpanFirst):
        from .spans import eval_span_first

        return eval_span_first(shard, node, weights, dtype)
    from .query import SpanNot as _SpanNot

    if isinstance(node, _SpanNot):
        from .spans import eval_span_not

        return eval_span_not(shard, node, weights, dtype)
    if isinstance(node, IntervalQuery):
        from .intervals import eval_interval_query

        return eval_interval_query(shard, node, weights, dtype)
    if isinstance(node, TermInSet):
        docs = _docs_union(shard, node.terms)
        return docs, np.full(len(docs), node.boost, dtype=dtype)
    if isinstance(node, ConstantScore):
        docs, _ = eval_node(shard, node.query, weights, dtype)
        return docs, np.full(len(docs), node.boost, dtype=dtype)
    if isinstance(node, FunctionScore):
        from .expressions import compile_expression

        docs, scores = eval_node(shard, node.query, weights, dtype)
        if not len(docs):
            return docs, scores
        fn = compile_expression(node.expr)
        idx = np.searchsorted(shard.doc_ids, docs)
        env = {"score": scores.astype(np.float64),
               "doclen": shard.doclens[idx].astype(np.float64),
               "doc_id": docs.astype(np.float64)}
        for name, vals in shard.docvalues.items():
            if name in fn.variables:
                env[name] = vals[idx]
        return docs, (node.boost * fn(env)).astype(dtype)
    from .query import BlendedTerm as _BlendedTerm
    from .query import CombinedField as _CombinedField
    from .query import FunctionRange as _FunctionRange
    from .query import TermAutomaton as _TermAutomaton

    if isinstance(node, _FunctionRange):
        # FunctionRangeQuery: vectorized expression scan over the shard's
        # live docs; constant score (ValueSourceScorer matches-only role)
        from .expressions import compile_expression

        fn = compile_expression(node.expr)
        docs = shard.doc_ids
        if shard._live_mask is not None:
            docs = docs[shard._live_mask]
        if not len(docs):
            return np.zeros(0, np.int64), np.zeros(0, dtype)
        idx = np.searchsorted(shard.doc_ids, docs)
        env = {"doclen": shard.doclens[idx].astype(np.float64),
               "doc_id": docs.astype(np.float64),
               "score": np.zeros(len(docs), dtype=np.float64)}
        for name, vals in shard.docvalues.items():
            if name in fn.variables:
                env[name] = vals[idx]
        v = np.asarray(fn(env), dtype=np.float64)
        m = ~np.isnan(v)
        if node.lower is not None:
            m &= (v >= node.lower) if node.include_lower else (v > node.lower)
        if node.upper is not None:
            m &= (v <= node.upper) if node.include_upper else (v < node.upper)
        out = docs[m]
        return out, np.full(len(out), node.boost, dtype=dtype)
    if isinstance(node, _TermAutomaton):
        return _score_term_automaton(shard, node, weights, dtype)
    if isinstance(node, _BlendedTerm):
        # member scores under blended stats, combined per rewrite method
        res = []
        ident = _bt_ident(node)  # hoisted: O(members) string join, once
        for t, b in node.term_boosts:
            d, fr = shard.postings(t)
            if not len(d):
                continue
            tw = weights[_bt_key(node, t, b * node.boost, ident)]
            norms = shard.norms_for(d, tw.norm_field)
            res.append((d, score_postings(tw, fr, norms, dtype)))
        if not res:
            return np.zeros(0, np.int64), np.zeros(0, dtype)
        docs = np.concatenate([d for d, _ in res])
        scores = np.concatenate([s for _, s in res]).astype(np.float64)
        order = np.argsort(docs, kind="stable")
        docs, scores = docs[order], scores[order]
        new = np.empty(len(docs), dtype=bool)
        new[0] = True
        new[1:] = docs[1:] != docs[:-1]
        starts = np.flatnonzero(new)
        udocs = docs[starts]
        sm = np.add.reduceat(scores, starts)
        if node.rewrite == "bool":
            return udocs, sm.astype(dtype)
        mx = np.maximum.reduceat(scores, starts)
        return udocs, (mx + node.tiebreak * (sm - mx)).astype(dtype)
    if isinstance(node, _CombinedField):
        return _score_combined_field(shard, node, weights, dtype)
    from .query import Covering as _Covering

    if isinstance(node, _Covering):
        # CoveringQuery (sandbox/search/CoveringQuery.java:35 /
        # CoveringScorer.java:94-115): per-doc required match count from a
        # NUMERIC docvalues field; missing value = never matches; values
        # below 1 count as 1; score = sum of matching clauses' scores
        dv = shard.docvalues.get(node.min_match_field)
        if dv is None:
            return np.zeros(0, np.int64), np.zeros(0, dtype)
        res = [eval_node(shard, c, weights, dtype) for c in node.clauses]
        res = [(d, s) for d, s in res if len(d)]
        if not res:
            return np.zeros(0, np.int64), np.zeros(0, dtype)
        docs = np.concatenate([d for d, _ in res])
        scores = np.concatenate([s for _, s in res]).astype(np.float64)
        order = np.argsort(docs, kind="stable")
        docs, scores = docs[order], scores[order]
        new = np.empty(len(docs), dtype=bool)
        new[0] = True
        new[1:] = docs[1:] != docs[:-1]
        starts = np.flatnonzero(new)
        udocs = docs[starts]
        sums = np.add.reduceat(scores, starts)
        counts = np.diff(np.append(starts, len(docs)))
        idx = np.searchsorted(shard.doc_ids, udocs)
        vals = dv[idx]
        need = np.maximum(vals, 1.0)  # values < 1 treated as 1
        keep = ~np.isnan(vals) & (counts >= need)
        return udocs[keep], (node.boost * sums[keep]).astype(dtype)
    if isinstance(node, Synonym):
        # summed member freqs scored as one term with blended stats
        tw = weights[("\x1fSYN\x1f".join(node.terms), node.boost)]
        agg: dict = {}
        parts = []
        for t in node.terms:
            d, f = shard.postings(t)
            if len(d):
                parts.append((d, f))
        if not parts:
            return np.zeros(0, np.int64), np.zeros(0, dtype)
        docs = np.concatenate([d for d, _ in parts])
        freqs = np.concatenate([f for _, f in parts]).astype(np.int64)
        order = np.argsort(docs, kind="stable")
        docs, freqs = docs[order], freqs[order]
        new = np.empty(len(docs), dtype=bool)
        new[0] = True
        new[1:] = docs[1:] != docs[:-1]
        starts = np.flatnonzero(new)
        udocs = docs[starts]
        ufreqs = np.add.reduceat(freqs, starts)
        norms = shard.norms_for(udocs, tw.norm_field)
        return udocs, score_postings(tw, ufreqs, norms, dtype)
    if isinstance(node, DisMax):
        res = [eval_node(shard, c, weights, dtype) for c in node.clauses]
        res = [(d, s) for d, s in res if len(d)]
        if not res:
            return np.zeros(0, np.int64), np.zeros(0, dtype)
        docs = np.concatenate([d for d, _ in res])
        scores = np.concatenate([s for _, s in res]).astype(np.float64)
        order = np.argsort(docs, kind="stable")
        docs, scores = docs[order], scores[order]
        new = np.empty(len(docs), dtype=bool)
        new[0] = True
        new[1:] = docs[1:] != docs[:-1]
        starts = np.flatnonzero(new)
        udocs = docs[starts]
        mx = np.maximum.reduceat(scores, starts)
        sm = np.add.reduceat(scores, starts)
        out = mx + node.tiebreak * (sm - mx)
        return udocs, out.astype(dtype)
    assert isinstance(node, Bool)
    must_res = [eval_node(shard, c, weights, dtype) for c in node.must]
    should_res = [eval_node(shard, c, weights, dtype) for c in node.should]
    from .query import IndexOrDocValues as _IODV

    if node.filter and not node.must and not node.should:
        # FILTER-only boolean: matching set with zero scores
        docs = eval_node(shard, node.filter[0], weights, dtype)[0]
        for c in node.filter[1:]:
            if isinstance(c, _IODV):
                docs = docs[_iodv_filter_mask(shard, c, docs, weights, dtype)]
                continue
            docs = docs[np.isin(docs, eval_node(shard, c, weights, dtype)[0],
                                assume_unique=True)]
        scores = np.zeros(len(docs), dtype=dtype)
        for c in node.must_not:
            nd, _ = eval_node(shard, c, weights, dtype)
            if len(nd):
                keep = ~np.isin(docs, nd, assume_unique=True)
                docs, scores = docs[keep], scores[keep]
        return docs, scores
    if node.must:
        docs = must_res[0][0]
        for d, _ in must_res[1:]:
            docs = docs[np.isin(docs, d, assume_unique=True)]
        # double accumulation, float cast at the boolean boundary
        # (ConjunctionScorer sums sub-scores as double)
        acc = np.zeros(len(docs), dtype=np.float64)
        for d, s in must_res:
            acc += s[np.searchsorted(d, docs)].astype(np.float64)
        # optional should clauses contribute where they match; with
        # min_should > 0 they are also REQUIRED to reach the quorum
        # (BooleanQuery keeps minimumNumberShouldMatch semantics even when
        # must clauses are present — BooleanQuery.java rewrite rules)
        should_hits = (
            np.zeros(len(docs), dtype=np.int32) if node.min_should > 0 else None
        )
        for d, s in should_res:
            m = np.isin(docs, d, assume_unique=True)
            if m.any():
                idx = np.searchsorted(d, docs[m])
                add = np.zeros(len(docs), dtype=np.float64)
                add[m] = s[idx].astype(np.float64)
                acc += add
                if should_hits is not None:
                    should_hits[m] += 1
        if should_hits is not None and node.should:
            keep = should_hits >= node.min_should
            docs, acc = docs[keep], acc[keep]
        scores = acc.astype(dtype)
    else:
        docs, scores = _union(should_res, node.min_should, dtype, shard)
    for c in node.filter:
        if isinstance(c, _IODV):
            keep = _iodv_filter_mask(shard, c, docs, weights, dtype)
        else:
            fd, _ = eval_node(shard, c, weights, dtype)
            keep = np.isin(docs, fd, assume_unique=True)
        docs, scores = docs[keep], scores[keep]
    for c in node.must_not:
        nd, _ = eval_node(shard, c, weights, dtype)
        if len(nd):
            keep = ~np.isin(docs, nd, assume_unique=True)
            docs, scores = docs[keep], scores[keep]
    return docs, scores


def top_k_select(docs: np.ndarray, scores: np.ndarray, k: int):
    """Top-k by (score desc, doc asc) — HitQueue tie rule (lower doc wins)."""
    if len(docs) <= k:
        order = np.lexsort((docs, -scores.astype(np.float64)))
        return docs[order], scores[order]
    # exact selection: partition for the k-th score, keep ties, then sort
    thresh = np.partition(-scores.astype(np.float64), k - 1)[k - 1]
    cand = np.flatnonzero(-scores.astype(np.float64) <= thresh)
    order = np.lexsort((docs[cand], -scores[cand].astype(np.float64)))[:k]
    sel = cand[order]
    return docs[sel], scores[sel]


def _block_upper_bounds(shard: ShardReader, term_text: str, tw, firsts,
                        maxf, minn, dtype) -> np.ndarray:
    """Per-block score upper bounds. With a stored competitive-impact
    frontier the bound is max over the block's Pareto (freq, norm) pairs —
    tighter than scoring the single (max_freq, min_norm) point, which pairs
    a freq and a norm that may come from different docs."""
    imps = shard.block_impacts(term_text)
    if imps is None:
        return score_postings(tw, maxf, minn.astype(np.int64), dtype).astype(np.float64)
    lens = np.fromiter((len(f) for f, _ in imps), np.int64, len(imps))
    flat_f = np.concatenate([f for f, _ in imps])
    flat_n = np.concatenate([n for _, n in imps])
    scores = score_postings(tw, flat_f, flat_n, dtype).astype(np.float64)
    starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    return np.maximum.reduceat(scores, starts)


class MaxScoreAccumulator:
    """Shared min-competitive score across concurrently-searched shards
    (search/MaxScoreAccumulator.java wired at IndexSearcher.java:468-473).

    Any shard that has k hits with scores >= t proves the global k-th best
    is >= t, so every other shard may prune blocks whose upper bound is
    below t. Reads/writes are GIL-atomic floats; a lock guards the
    read-modify-write max."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self.value = -np.inf

    def publish(self, theta: float) -> None:
        if theta > self.value:
            with self._lock:
                if theta > self.value:
                    self.value = theta

    def get(self) -> float:
        return self.value


def _pure_conjunction_terms(node):
    """Terms list if node is a scoring conjunction of plain terms, else None."""
    if (
        isinstance(node, Bool)
        and node.must
        and not node.should
        and not node.must_not
        and not node.filter
        and all(isinstance(c, Term) for c in node.must)
    ):
        return list(node.must)
    return None


def conj_top_k(shard: ShardReader, terms: list, weights, k: int, dtype,
               acc: "MaxScoreAccumulator | None" = None):
    """Block-max conjunction (BlockMaxConjunctionScorer.java:30 semantics,
    vectorized): intersect doc ids first (no scoring), bound each surviving
    doc by the sum of its per-term block maxima, then score candidates in
    descending-bound chunks, stopping when a chunk's best bound is below the
    min-competitive score θ. Results are float-exact vs exhaustive."""
    per_term = []
    for t in terms:
        docs, freqs = shard.postings(t.text)
        if not len(docs):
            return np.zeros(0, np.int64), np.zeros(0, dtype)
        per_term.append((docs, freqs, t))
    per_term.sort(key=lambda p: len(p[0]))  # lead with the rarest term
    docs = per_term[0][0]
    for d, _, _ in per_term[1:]:
        docs = docs[np.isin(docs, d, assume_unique=True)]
        if not len(docs):
            return np.zeros(0, np.int64), np.zeros(0, dtype)

    # exact per-doc scores are needed for any candidate we keep; freqs are
    # gathered per term by searchsorted into its postings
    def exact_scores(cand: np.ndarray) -> np.ndarray:
        base = None  # text-field norms, shared across text terms
        total = np.zeros(len(cand), dtype=np.float64)
        for d, f, t in per_term:
            idx = np.searchsorted(d, cand)
            tw = weights[(t.text, t.boost)]
            if tw.norm_field is None:
                if base is None:
                    base = shard.norms_for(cand)
                norms = base
            else:
                norms = shard.norms_for(cand, tw.norm_field)
            total += score_postings(tw, f[idx], norms, dtype).astype(np.float64)
        return total.astype(dtype)

    if len(docs) <= max(k, 256):
        return top_k_select(docs, exact_scores(docs), k)

    # per-doc upper bound: sum of the containing block's impact bound
    ub = np.zeros(len(docs), dtype=np.float64)
    for d, f, t in per_term:
        firsts, maxf, minn = shard.block_metadata(t.text)
        tw = weights[(t.text, t.boost)]
        block_ub = _block_upper_bounds(shard, t.text, tw, firsts, maxf, minn, dtype)
        bi = np.maximum(np.searchsorted(firsts, docs, side="right") - 1, 0)
        ub += block_ub[bi]

    order = np.argsort(-ub, kind="stable")
    top_docs = np.zeros(0, np.int64)
    top_scores = np.zeros(0, dtype)
    theta = acc.get() if acc is not None else -np.inf
    chunk = 1024
    for s in range(0, len(order), chunk):
        sel = order[s:s + chunk]
        # a shared-accumulator θ is a GLOBAL bound: prune on it even before
        # this shard has k local hits (the merged top-k can't use such docs)
        if ub[sel[0]] < theta and (len(top_docs) >= k or acc is not None):
            break  # bounds descend: everything after is below θ too
        cand = docs[sel]
        c_order = np.argsort(cand)
        cand = cand[c_order]
        scores = exact_scores(cand)
        top_docs, top_scores = top_k_select(
            np.concatenate([top_docs, cand]),
            np.concatenate([top_scores, scores]), k,
        )
        if len(top_docs) >= k:
            theta = max(theta, float(top_scores[-1]))
            if acc is not None:
                acc.publish(float(top_scores[-1]))
    return top_docs, top_scores


def _pure_disjunction_terms(node):
    """Terms list if node is a scoring disjunction of plain terms, else None."""
    if isinstance(node, Term):
        return [node]
    if (
        isinstance(node, Bool)
        and node.should
        and not node.must
        and not node.must_not
        and node.min_should <= 1
        and all(isinstance(c, Term) for c in node.should)
    ):
        return list(node.should)
    return None


def wand_top_k(shard: ShardReader, terms: list[Term], weights, k: int, dtype,
               acc: "MaxScoreAccumulator | None" = None):
    """Block-max WAND over a pure term disjunction (WANDScorer.java:45 /
    ImpactsDISI.java:32 semantics at 128-doc block granularity).

    Windows are the union of all terms' block boundaries; a window is scored
    only when the sum of its per-term block-max upper bounds reaches the
    current min-competitive score θ (the k-th best so far). Pruned windows
    skip postings DECODE, norm lookup and scoring entirely: postings are
    fetched lazily per surviving window via ShardReader.postings_blocks
    (only the term's blocks overlapping the window are ever decompressed —
    the reference's skip-list jump, Lucene84SkipWriter.java:51).
    """
    per_term = []
    for t in terms:
        firsts, maxf, minn = shard.block_metadata(t.text)
        if not len(firsts):
            continue
        tw = weights[(t.text, t.boost)]
        ub = _block_upper_bounds(shard, t.text, tw, firsts, maxf, minn, dtype)
        # decode ONLY the final block to learn the list's last doc (keeps
        # windows past the end contributing zero bound, as the eager path)
        nb = len(firsts)
        ld, _ = shard.postings_blocks(t.text, nb - 1, nb, live_only=False)
        last_doc = int(ld[-1]) if len(ld) else int(firsts[-1])
        per_term.append((t.text, tw, firsts, ub, last_doc))
    if not per_term:
        return np.zeros(0, np.int64), np.zeros(0, dtype)

    boundaries = np.unique(np.concatenate([p[2] for p in per_term]))
    n_win = len(boundaries)
    bounds_ext = np.append(boundaries, np.iinfo(np.int64).max)
    ub_sum = np.zeros(n_win, dtype=np.float64)
    # one vectorized searchsorted per term gives every window's active block,
    # its upper bound AND its [b_lo, b_hi) decode range — the per-window loop
    # below does no binary searches over block boundaries
    ranges = []
    for text, tw, firsts, ub, last_doc in per_term:
        idx = np.searchsorted(firsts, boundaries, side="right") - 1
        active = (idx >= 0) & (boundaries <= last_doc)
        contrib = np.zeros(n_win, dtype=np.float64)
        contrib[active] = ub[idx[active]]
        ub_sum += contrib
        b_lo = np.maximum(idx, 0)
        hi_left = np.searchsorted(firsts, boundaries, side="left")
        b_hi = np.append(hi_left[1:], len(firsts))
        ranges.append((b_lo, b_hi))

    top_docs = np.zeros(0, np.int64)
    top_scores = np.zeros(0, dtype)
    theta = acc.get() if acc is not None else -np.inf
    # visit windows in descending upper-bound order: θ converges after the
    # first few windows and the tail is pruned wholesale (correct because a
    # window is skipped only when its own bound is below the current θ)
    visit = np.argsort(-ub_sum, kind="stable")
    for w in visit:
        if ub_sum[w] < theta and (len(top_docs) >= k or acc is not None):
            break  # bounds are visited descending: the rest are lower still
        lo_doc = int(bounds_ext[w])
        hi_doc = int(bounds_ext[w + 1])
        parts = []
        for (text, tw, firsts, ub, last_doc), (blo, bhi) in zip(per_term,
                                                                ranges):
            if lo_doc > last_doc or hi_doc <= firsts[0]:
                continue
            d, f = shard.postings_blocks(text, int(blo[w]), int(bhi[w]))
            lo = np.searchsorted(d, lo_doc, side="left")
            hi = np.searchsorted(d, hi_doc, side="left")
            if lo == hi:
                continue
            d = d[lo:hi]
            norms = shard.norms_for(d, tw.norm_field)
            s = score_postings(tw, f[lo:hi], norms, dtype)
            parts.append((d, s))
        if not parts:
            continue
        wd, ws = _union(parts, 0, dtype)
        cd = np.concatenate([top_docs, wd])
        cs = np.concatenate([top_scores, ws])
        top_docs, top_scores = top_k_select(cd, cs, k)
        if len(top_docs) >= k:
            theta = max(theta, float(top_scores[-1]))
            if acc is not None:
                acc.publish(float(top_scores[-1]))
    return top_docs, top_scores


def shard_top_k(shard: ShardReader, node, weights, k: int, dtype,
                use_wand: bool = True,
                acc: "MaxScoreAccumulator | None" = None):
    terms = _pure_disjunction_terms(node) if use_wand else None
    if terms is not None:
        # cost-based physical plan (the reference's Boolean2ScorerSupplier
        # choice between WANDScorer and the bulk BooleanScorer): block-max
        # pruning only pays when the block upper bounds actually spread —
        # on a flat score landscape the dense one-pass accumulator wins
        dfs = [weights[(t.text, t.boost)].df for t in terms]
        if use_wand != "force" and sum(dfs) <= (1 << 21):
            docs, scores = eval_node(
                shard,
                terms[0] if len(terms) == 1 else Bool(should=list(terms), min_should=1),
                weights,
                dtype,
            )
            return top_k_select(docs, scores, k)
        return wand_top_k(shard, terms, weights, k, dtype, acc=acc)
    cterms = _pure_conjunction_terms(node) if use_wand else None
    if cterms is not None:
        dfs = [weights[(t.text, t.boost)].df for t in cterms]
        if use_wand == "force" or min(dfs) > (1 << 17):
            return conj_top_k(shard, cterms, weights, k, dtype, acc=acc)
    docs, scores = eval_node(shard, node, weights, dtype)
    return top_k_select(docs, scores, k)
