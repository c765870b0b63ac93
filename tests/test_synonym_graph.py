"""Index-time multi-word SynonymGraphFilter (SynonymGraphFilter.java:81 +
FlattenGraphFilter.java:32 flatten semantics; behavior cases modeled on
TestSynonymGraphFilter.java)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.analysis.synonyms import parse_synonym_rules
from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher


def test_parse_equivalence_and_mapping():
    # equivalence: every member -> every other
    pairs = parse_synonym_rules(["usa, united states"])
    assert (("usa",), ("united", "states")) in pairs
    assert (("united", "states"), ("usa",)) in pairs
    assert len(pairs) == 2
    # explicit mapping: LHS -> RHS only, identity dropped
    pairs = parse_synonym_rules(["ipod, i pod => ipod"])
    assert pairs == [(("i", "pod"), ("ipod",))]
    # members are analyzed (lowercased) before matching
    pairs = parse_synonym_rules(["DNS, Domain Name System"])
    assert (("dns",), ("domain", "name", "system")) in pairs
    # dedup across rules
    pairs = parse_synonym_rules(["a, b", "a, b"])
    assert len(pairs) == 2


@pytest.fixture(scope="module")
def syn_index(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("syn_graph")
    texts = [
        "the domain name system rocks",   # 0: 5 tokens, phrase form
        "pure dns magic rocks zz",        # 1: 5 tokens, acronym form
        "domain experts name things",     # 2: partial words, no phrase
        "fast queries need indexes",      # 3: unrelated
        "wifi failed again",              # 4: single-single synonym leg
        "wireless network failed",        # 5
    ]
    p = str(tmp / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }), p)
    idx = str(tmp / "idx")
    cfg = IndexBuildConfig(
        num_shards=2, num_buckets=4,
        synonym_graph=("dns, domain name system",
                       "wifi => wireless network"),
    )
    build_index(p, idx, cfg=cfg)
    return IndexSearcher(idx)


def test_multiword_phrase_indexes_single_token(syn_index):
    """'domain name system' occurrence stacks 'dns' at its start position:
    a plain term query for the acronym matches both surface forms."""
    assert syn_index.match_all("dns")["doc_id"].to_pylist() == [0, 1]


def test_single_token_expands_to_multiword(syn_index):
    """'dns' occurrence overlays 'domain name system' on the following
    positions: the multi-word PHRASE matches the acronym doc too."""
    hits = syn_index.match_all('"domain name system"')["doc_id"].to_pylist()
    assert hits == [0, 1]
    # partial-word doc 2 must NOT match (contiguity check)
    assert 2 not in hits


def test_identical_scores_for_both_surface_forms(syn_index):
    """Docs 0 and 1 have equal doclen and tf(dns)=1 each; with insertions
    excluded from norms, BM25 must score the two surface forms
    identically (the SynonymGraphFilter point)."""
    res = syn_index.search("dns", k=10)
    scores = dict(zip(res["doc_id"].to_pylist(), res["score"].to_pylist()))
    assert set(scores) == {0, 1}
    assert scores[0] == scores[1]


def test_mapping_direction_only(syn_index):
    """'wifi => wireless network' is one-directional: wifi doc gains the
    phrase, but the phrase doc does NOT gain 'wifi'."""
    assert syn_index.match_all('"wireless network"')["doc_id"].to_pylist() == [4, 5]
    assert syn_index.match_all("wifi")["doc_id"].to_pylist() == [4]


def test_phrase_across_expansion_boundary(syn_index):
    """Flattened expansion overlays REAL following positions: doc 4 is
    'wifi failed again' -> wireless@p0 network@p1 (stacked over 'failed');
    the reference's flatten produces exactly this overlay, so a phrase of
    [expansion-token, following-real-token] matches where they collide."""
    hits = syn_index.match_all('"network failed"')["doc_id"].to_pylist()
    assert hits == [4, 5]


def test_doclen_excludes_graph_insertions(syn_index):
    sh_dl = sum(int(sh.doclens.sum()) for sh in syn_index.reader.shards)
    assert sh_dl == 5 + 5 + 4 + 4 + 3 + 3


def test_rules_normalized_through_chain(tmp_path, ray_session):
    """Rule members run through the configured stemmer, so surface forms
    that only match post-analysis still fire."""
    texts = ["cats are great", "felines are great"]
    p = str(tmp_path / "c2.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(2, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }), p)
    idx = str(tmp_path / "idx2")
    cfg = IndexBuildConfig(num_shards=1, num_buckets=2,
                           stemmer="minimal_english",
                           synonym_graph=("cats, felines",))
    build_index(p, idx, cfg=cfg)
    s = IndexSearcher(idx)
    assert s.match_all("cat")["doc_id"].to_pylist() == [0, 1]
    assert s.match_all("feline")["doc_id"].to_pylist() == [0, 1]


def test_empty_and_trailing_empty_docs(tmp_path, ray_session):
    """Zero-token docs (incl. the batch's LAST doc) must not break the
    flatten shift arithmetic."""
    texts = ["", "wifi down", "", "all good here", ""]
    p = str(tmp_path / "c3.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(5, dtype=np.int64)),
        "text": pa.array(texts, pa.string())}), p)
    idx = str(tmp_path / "idx3")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=1, num_buckets=2,
        synonym_graph=("wifi => wireless network",)))
    s = IndexSearcher(idx)
    assert s.match_all('"wireless network"')["doc_id"].to_pylist() == [1]
    # shifted real token still queryable, positions intact
    assert s.match_all("down")["doc_id"].to_pylist() == [1]
    assert s.match_all('"network down"')["doc_id"].to_pylist() == [1]


def test_word_delimiter_combination_rejected():
    with pytest.raises(ValueError, match="synonym_graph"):
        IndexBuildConfig(word_delimiter=True,
                         synonym_graph=("a => b c",))


def _simulate_flatten(tokens, rules):
    """Independent per-doc reference simulator of the documented flatten
    semantics (plain Python loops vs the build's vectorized batch pass):
    -> multiset of (term, position)."""
    sites = []
    for lhs, rhss in rules.items():
        n = len(lhs)
        for i in range(len(tokens) - n + 1):
            if tuple(tokens[i:i + n]) == lhs:
                sites.append((i, n, rhss))
    bump = [0] * (len(tokens) + 1)
    for i, n, rhss in sites:
        extra = max(max((len(r) for r in rhss), default=0) - n, 0)
        bump[i + n] += extra
    pos, acc = [], 0
    for i in range(len(tokens)):
        acc += bump[i]
        pos.append(i + acc)
    out = [(t, p) for t, p in zip(tokens, pos)]
    for i, n, rhss in sites:
        for rhs in rhss:
            for j, tok in enumerate(rhs):
                src = i + min(j, n - 1)
                out.append((tok, pos[src] + max(0, j - (n - 1))))
    return sorted(out)


def test_flatten_property_vs_simulator(tmp_path, ray_session):
    """Randomized corpora + rules: the index's per-(term, doc) position
    multisets must equal the reference simulator's."""
    import random

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(12)]
    rules_spec = ("w0 w1, syn0", "w2 => w0 w1 w2", "w3 w4 w5, s35",
                  "w6, alpha beta")
    rules = {
        ("w0", "w1"): [("syn0",)],
        ("syn0",): [("w0", "w1")],
        ("w2",): [("w0", "w1", "w2")],
        ("w3", "w4", "w5"): [("s35",)],
        ("s35",): [("w3", "w4", "w5")],
        ("w6",): [("alpha", "beta")],
    }
    texts = [" ".join(rng.choices(vocab, k=rng.randint(3, 30)))
             for _ in range(40)]
    p = str(tmp_path / "fz.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string())}), p)
    idx = str(tmp_path / "fzidx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4, batch_size=7,
        synonym_graph=rules_spec))
    s = IndexSearcher(idx)
    # gather actual (term, pos) per doc off the postings
    got: dict[int, list] = {i: [] for i in range(len(texts))}
    all_terms = set(vocab) | {"syn0", "s35", "alpha", "beta"}
    for sh in s.reader.shards:
        for t in sorted(all_terms):
            if not sh.term_rows(t):
                continue
            docs, freqs, posf = sh.postings(t, with_positions=True)
            occ_doc = np.repeat(docs, freqs)
            for d, pp in zip(occ_doc, posf):
                got[int(d)].append((t, int(pp)))
    for i, txt in enumerate(texts):
        want = _simulate_flatten(txt.split(" "), rules)
        assert sorted(got[i]) == want, (i, txt)
