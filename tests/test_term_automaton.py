"""TermAutomatonQuery tests (sandbox/search/TermAutomatonQuery.java:71):
phrase/multiphrase equivalence, ANY-gap matching vs a recursive
path-counting brute force, and distributed parity."""

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import Phrase, TermAutomaton
from lucene_solr_ray.search.term_automaton import determinize, run_doc

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("ta_idx"))
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4, batch_size=256)
    build_index(DOCS, d, key_col="doc_id", text_col="text", cfg=cfg)
    return d


@pytest.fixture(scope="module")
def raw():
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(),
                    [s.split(" ") for s in t["text"].to_pylist()]))


def _brute_freq(toks, dfa_term, dfa_any, dfa_acc, tid_of):
    """Recursive path count: a match starts at any position with a TERM
    step from DFA state 0; each subsequent position branches into the term
    step and the ANY step; accepts reached by TERM steps count."""
    n = len(toks)

    def paths(state, pos):
        total = 0
        if pos >= n:
            return 0
        tid = tid_of.get(toks[pos], -2)
        t = dfa_term.get((state, tid))
        if t is not None:
            if t in dfa_acc:
                total += 1
            total += paths(t, pos + 1)
        ta = dfa_any.get(state)
        if ta is not None:
            total += paths(ta, pos + 1)
        return total

    freq = 0
    for i, w in enumerate(toks):
        tid = tid_of.get(w, -2)
        t0 = dfa_term.get((0, tid))
        if t0 is not None:
            if t0 in dfa_acc:
                freq += 1
            freq += paths(t0, i + 1)
    return freq


def test_phrase_chain_equals_phrase_query(idx, raw):
    s = IndexSearcher(idx, dtype=np.float64)
    # pick an occurring bigram
    a, b = next((x, y) for _, toks in raw
                for x, y in zip(toks, toks[1:]))
    ta = TermAutomaton(3, ((0, 1, a), (1, 2, b)), (), (2,))
    got = s.match_all(ta)
    want = s.match_all(Phrase((a, b)))
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    np.testing.assert_allclose(got["score"].to_pylist(),
                               want["score"].to_pylist())


def test_any_gap_brute_force(idx, raw):
    s = IndexSearcher(idx, dtype=np.float64)
    a, b = next((x, y) for _, toks in raw
                for x, y in zip(toks, toks[2:]))
    # a <ANY> b  (exactly one token between)
    ta = TermAutomaton(4, ((0, 1, a), (2, 3, b)), ((1, 2),), (3,))
    got_t = s.match_all(ta)
    got = dict(zip(got_t["doc_id"].to_pylist(), got_t["score"].to_pylist()))

    terms = [t for t in dict.fromkeys([a, b])]
    tid_of = {t: i for i, t in enumerate(terms)}
    dfa_t, dfa_a, dfa_acc = determinize(
        4, [(f, to, tid_of[t]) for f, to, t in ta.transitions],
        list(ta.any_transitions), list(ta.accepts))
    from collections import Counter

    dfc, dls = Counter(), {}
    for d, toks in raw:
        dfc.update(set(toks))
        dls[d] = len(toks)
    freqs = {d: _brute_freq(toks, dfa_t, dfa_a, dfa_acc, tid_of)
             for d, toks in raw}
    exp_docs = sorted(d for d, f in freqs.items() if f > 0)
    assert sorted(got) == exp_docs

    # hand-score: summed idf over matched terms, freq = path count
    from lucene_solr_ray.util.smallfloat import byte4_to_int, int_to_byte4

    n, sum_dl = len(raw), sum(dls.values())
    # multi_weight float32-rounds each member idf (BM25Similarity.idfExplain
    # sums float idf contributions)
    idf = sum(float(np.float32(math.log(1 + (n - dfc[t] + 0.5) / (dfc[t] + 0.5))))
              for t in terms if dfc[t] > 0)
    avgdl = sum_dl / n
    k1, bb = 1.2, 0.75
    for d in exp_docs:
        dlq = byte4_to_int(int_to_byte4(dls[d]))
        inv = 1.0 / (k1 * ((1 - bb) + bb * dlq / avgdl))
        expv = idf - idf / (1.0 + freqs[d] * inv)
        assert got[d] == pytest.approx(expv, rel=1e-9), d


def test_runner_matches_brute_force_random(raw):
    # randomized automata over random docs: runner == recursive count
    rng = np.random.default_rng(23)
    vocab = ["a", "b", "c", "d"]
    tid_of = {t: i for i, t in enumerate(vocab)}
    for trial in range(40):
        n_states = int(rng.integers(2, 5))
        n_arcs = int(rng.integers(1, 6))
        trans = tuple(
            (int(rng.integers(0, n_states - 1)),
             int(rng.integers(1, n_states)),
             tid_of[str(rng.choice(vocab))])
            for _ in range(n_arcs))
        anys = tuple(
            (int(rng.integers(0, n_states - 1)),
             int(rng.integers(1, n_states)))
            for _ in range(int(rng.integers(0, 2))))
        accepts = (n_states - 1,)
        dfa_t, dfa_a, dfa_acc = determinize(n_states, trans, anys, accepts)
        toks = [str(rng.choice(vocab)) for _ in range(int(rng.integers(1, 12)))]
        want = _brute_freq(toks, dfa_t, dfa_a, dfa_acc, tid_of)
        pos_terms = [(i, tid_of[w]) for i, w in enumerate(toks)]
        got = run_doc(pos_terms, dfa_t, dfa_a, dfa_acc)
        assert got == want, (trial, toks, trans, anys)


def test_term_automaton_distributed_parity(idx, raw):
    from lucene_solr_ray.search import DistributedSearcher

    a, b = next((x, y) for _, toks in raw
                for x, y in zip(toks, toks[1:]))
    ta = TermAutomaton(3, ((0, 1, a), (1, 2, b)), (), (2,))
    local = IndexSearcher(idx, dtype=np.float64).search(ta, k=10)
    dist = DistributedSearcher(idx, num_actors=2,
                               dtype=np.float64).search(ta, k=10)
    assert local["doc_id"].to_pylist() == dist["doc_id"].to_pylist()
    np.testing.assert_allclose(local["score"].to_pylist(),
                               dist["score"].to_pylist())


def test_synonym_graph_query(tmp_path, ray_session):
    """Query-time multi-word synonyms (TokenStreamToTermAutomatonQuery.java
    role): 'ny pizza' with ny<->new york matches both spellings."""
    import pyarrow as pa

    from lucene_solr_ray.search.query_synonyms import synonym_phrase_query

    texts = [
        "best new york pizza here",    # multi-word spelling
        "great ny pizza spot",         # single-token spelling
        "new pizza york style",        # scrambled: no match
        "pizza new york",              # wrong order: no match
        "ny bagels only",              # no 'pizza' after the span
    ]
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    s = IndexSearcher(idx, dtype=np.float64)
    rules = {("ny",): [("new", "york")], ("new", "york"): [("ny",)]}
    q = synonym_phrase_query("ny pizza", rules)
    got = s.match_all(q)
    assert sorted(got["doc_id"].to_pylist()) == [0, 1]
    # the reverse spelling matches the same docs (graph is symmetric)
    q2 = synonym_phrase_query("new york pizza", rules)
    got2 = s.match_all(q2)
    assert sorted(got2["doc_id"].to_pylist()) == [0, 1]
