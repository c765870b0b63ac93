"""TermAutomatonQuery — proximity matching against a term-labeled automaton.

The reference (lucene/sandbox/.../search/TermAutomatonQuery.java:71) lets a
query express an automaton whose transitions are terms (plus an ANY
wildcard symbol), generalizing PhraseQuery / MultiPhraseQuery / SpanNear:
the document's token positions are run through the automaton and the score
is sim.score(freq, norm) where freq counts accepting TERM steps
(TermAutomatonScorer.java:230-330).

Faithful semantics replicated here:

- the automaton is DETERMINIZED first over the alphabet {terms..., ANY}
  (ANY is its own symbol, exactly as the reference determinizes
  anyTermID: TermAutomatonQuery.finish);
- active states per position form a MULTISET (PosState has no dedup,
  :373-386), so `freq` counts accepting PATHS — the runner keeps
  path-count multiplicities per DFA state;
- at a position holding a query term, BOTH the term symbol and the ANY
  symbol step (the scorer's term-step block plus the later gap loop over
  the same posState); gap positions step only ANY;
- a new match may start at every query-term token (step from the initial
  state by the term symbol only, :319-327);
- accepts reached via ANY steps do NOT bump freq (the gap loop adds
  states without the accept check, :280-287);
- weight = summed idf over the automaton's terms with df > 0
  (TermAutomatonWeight:357-374 builds one SimScorer over allTermStats).
"""

from __future__ import annotations

from collections import Counter

ANY = -1  # wildcard symbol id


def determinize(num_states: int, transitions, any_transitions, accepts):
    """Subset construction over the alphabet {term, ANY}. Returns
    (dfa_term: dict[(state, term)] -> state, dfa_any: dict[state] -> state,
    dfa_accepts: frozenset, initial=0). DFA state 0 corresponds to the NFA
    initial-state closure {0}."""
    nfa_term: dict = {}
    for f, t, term in transitions:
        nfa_term.setdefault((f, term), set()).add(t)
    nfa_any: dict = {}
    for f, t in any_transitions:
        nfa_any.setdefault(f, set()).add(t)
    accept_set = set(accepts)

    start = frozenset([0])
    ids = {start: 0}
    stack = [start]
    dfa_term: dict = {}
    dfa_any: dict = {}
    dfa_accepts = set()
    while stack:
        cur = stack.pop()
        cid = ids[cur]
        if cur & accept_set:
            dfa_accepts.add(cid)
        syms: dict = {}
        any_to: set = set()
        for s in cur:
            for (f, term), tos in nfa_term.items():
                if f == s:
                    syms.setdefault(term, set()).update(tos)
            any_to.update(nfa_any.get(s, ()))
        for term, tos in syms.items():
            key = frozenset(tos)
            if key not in ids:
                ids[key] = len(ids)
                stack.append(key)
            dfa_term[(cid, term)] = ids[key]
        if any_to:
            key = frozenset(any_to)
            if key not in ids:
                ids[key] = len(ids)
                stack.append(key)
            dfa_any[cid] = ids[key]
    return dfa_term, dfa_any, frozenset(dfa_accepts)


def run_doc(pos_terms, dfa_term, dfa_any, dfa_accepts) -> int:
    """Count accepting paths for one doc. pos_terms: iterable of
    (position, term) sorted by position (same-position repeats allowed —
    index-time synonyms)."""
    cur: Counter = Counter()
    fpos = None  # the position `cur` is the state multiset FOR
    freq = 0
    i, n = 0, len(pos_terms)
    while i < n:
        p = pos_terms[i][0]
        group = []
        while i < n and pos_terms[i][0] == p:
            group.append(pos_terms[i][1])
            i += 1
        if fpos is not None and cur:
            for _ in range(p - fpos):
                nxt: Counter = Counter()
                for s, c in cur.items():
                    t = dfa_any.get(s)
                    if t is not None:
                        nxt[t] += c
                cur = nxt
                if not cur:
                    break
        nxt = Counter()
        for s, c in cur.items():
            for term in group:
                t = dfa_term.get((s, term))
                if t is not None:
                    nxt[t] += c
                    if t in dfa_accepts:
                        freq += c
            ta = dfa_any.get(s)
            if ta is not None:
                nxt[ta] += c
        for term in group:
            t0 = dfa_term.get((0, term))
            if t0 is not None:
                nxt[t0] += 1
                if t0 in dfa_accepts:
                    freq += 1
        cur = nxt
        fpos = p + 1
    return freq
