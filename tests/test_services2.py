import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher, parse_query
from lucene_solr_ray.search.query import Phrase
from lucene_solr_ray.search.services import (
    Monitor,
    rescore,
    search_sorted_by_field,
    spell_correct,
    suggest,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("svc2_idx"))
    build_index(DOCS, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    return d


def test_suggest(idx):
    s = IndexSearcher(idx)
    out = suggest(s, "fa", k=3)
    assert out and all(t.startswith("fa") for t, _ in out)
    dfs = [d for _, d in out]
    assert dfs == sorted(dfs, reverse=True)


def test_spell_correct(idx):
    s = IndexSearcher(idx)
    out = spell_correct(s, "fsat", max_edits=2, k=3)
    assert "fast" in [t for t, _ in out]


def test_sort_by_field(idx):
    s = IndexSearcher(idx)
    out = search_sorted_by_field(s, "fast", "doclen", k=10, descending=True)
    vals = out["doclen"].to_pylist()
    assert vals == sorted(vals, reverse=True)
    # matches really contain the term
    brute = pq.read_table(DOCS, columns=["doc_id", "text"])
    texts = dict(zip(brute["doc_id"].to_pylist(), brute["text"].to_pylist()))
    for d in out["doc_id"].to_pylist():
        assert "fast" in texts[d].split(" ")


def test_sort_by_field_early_terminated(idx):
    """EarlyTerminatingSortingCollector parity: walking the cached
    index-sort permutation per shard must give exactly the exhaustive
    TopFieldCollector result while visiting only a prefix of each shard."""
    s = IndexSearcher(idx)
    for q in ("fast", "fast OR slow", "the"):
        for desc in (True, False):
            for k in (5, 10, 50):
                exact = search_sorted_by_field(s, q, "doclen", k=k,
                                               descending=desc)
                st = {}
                et = search_sorted_by_field(s, q, "doclen", k=k,
                                            descending=desc,
                                            early_terminate=True, stats=st)
                assert et.equals(exact)
                assert 0 < st["scanned"] <= st["total"]
    # a high-match-rate query with small k must terminate early (small
    # chunk so the prefix walk is observable on the tiny test corpus)
    from lucene_solr_ray.search.executor import resolve_weights
    from lucene_solr_ray.search.services import _early_terminated_sorted_search

    node = s._node("fast OR slow OR query OR table")
    weights = resolve_weights(s.reader, node, s.params, s.dtype)
    st = {}
    et = _early_terminated_sorted_search(s, node, weights, "doclen", 5,
                                         True, stats=st, chunk=32)
    exact = search_sorted_by_field(s, "fast OR slow OR query OR table",
                                   "doclen", k=5, descending=True)
    assert et.equals(exact)
    assert st["scanned"] < st["total"]


def test_rescore(idx):
    s = IndexSearcher(idx)
    out = rescore(s, "fast", "query", first_pass_n=30, weight=2.0, k=10)
    assert out.num_rows == 10
    scores = out["score"].to_pylist()
    assert scores == sorted(scores, reverse=True)


def test_sloppy_phrase(idx):
    s = IndexSearcher(idx)
    exact = set(s.match_all('"fast query"')["doc_id"].to_pylist())
    sloppy = set(s.match_all(parse_query('"fast query"~2'))["doc_id"].to_pylist())
    assert exact <= sloppy  # slop relaxes the match set
    # and slop actually adds docs where the words are 1 apart
    brute = pq.read_table(DOCS, columns=["doc_id", "text"])
    extra = sloppy - exact
    for d in list(extra)[:5]:
        toks = dict(zip(brute["doc_id"].to_pylist(), brute["text"].to_pylist()))[d].split(" ")
        assert "fast" in toks and "query" in toks


def test_monitor_percolation(ray_session):
    import ray.data

    ds = ray.data.read_parquet(DOCS, columns=["doc_id", "text"])
    mon = Monitor({"q_fast": "fast", "q_both": "fast AND query", "q_none": "zzzznope"})
    out = ds.map_batches(mon, batch_format="pyarrow", batch_size=256,
                         concurrency=2).to_pandas()
    brute = pq.read_table(DOCS, columns=["doc_id", "text"])
    texts = dict(zip(brute["doc_id"].to_pylist(), brute["text"].to_pylist()))
    fast_docs = {d for d, t in texts.items() if "fast" in t.split(" ")}
    got_fast = set(out[out.query_id == "q_fast"]["doc_id"])
    assert got_fast == fast_docs
    assert not len(out[out.query_id == "q_none"])


def test_batch_search_matches_sequential(idx):
    from lucene_solr_ray.search.searcher import batch_search

    qs = ["fast", "fast AND query", '"fast query"', "fa*"]
    out = batch_search(idx, qs, k=5, concurrency=2).to_pandas()
    s = IndexSearcher(idx)
    for q in qs:
        seq = s.search(q, k=5)
        got = out[out["query"] == q].sort_values("rank")
        assert list(got["doc_id"]) == seq["doc_id"].to_pylist(), q
        assert list(got["score"]) == seq["score"].to_pylist(), q


def test_search_after_paging(ray_session, tmp_path):
    """page k followed by page k+1 must equal top-2k exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher

    rng = np.random.default_rng(5)
    n = 500
    texts = [" ".join(["hit"] * int(rng.integers(1, 9)) +
                      ["pad"] * int(rng.integers(1, 30))) for _ in range(n)]
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                             "text": pa.array(texts, pa.string())}), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=4, num_buckets=8))
    s = IndexSearcher(idx)
    for q in ("hit", "hit OR pad"):
        full = s.search(q, k=20)
        p1 = s.search_after(q, None, k=10)
        cursor = (p1["score"][9].as_py(), p1["doc_id"][9].as_py())
        p2 = s.search_after(q, cursor, k=10)
        got = p1["doc_id"].to_pylist() + p2["doc_id"].to_pylist()
        assert got == full["doc_id"].to_pylist()
        gsc = p1["score"].to_pylist() + p2["score"].to_pylist()
        assert gsc == full["score"].to_pylist()


def test_facet_keyword_field_from_index(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search.services import facet_keyword_field

    n = 300
    langs = ["en", "de", "fr"]
    rows = {
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["alpha beta" if i % 2 else "alpha gamma" for i in range(n)],
        "lang": [langs[i % 3] for i in range(n)],
    }
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({k: pa.array(v) for k, v in rows.items()}), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4,
                                             keyword_fields=("lang",)))
    t = facet_keyword_field(idx, "lang")
    got = dict(zip(t["value"].to_pylist(), t["cnt"].to_pylist()))
    assert got == {"en": 100, "de": 100, "fr": 100}
    # query-constrained facet: only 'gamma' docs (doc_id % 2 == 0)
    t2 = facet_keyword_field(idx, "lang", query="gamma")
    got2 = dict(zip(t2["value"].to_pylist(), t2["cnt"].to_pylist()))
    exp2 = {}
    for i in range(0, n, 2):
        exp2[langs[i % 3]] = exp2.get(langs[i % 3], 0) + 1
    assert got2 == exp2


def test_multiphrase_pointinset_feature(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.query import (
        Bool, FeatureQuery, MultiPhrase, NumericInSet, Term,
    )

    texts = ["big apple store", "small apple shop", "big orange store",
             "apple bar"]
    rank = [3.0, 1.0, 8.0, 0.5]
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(4, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "pagerank": pa.array(rank, pa.float64()),
    }), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4, docvalues_fields=("pagerank",)))
    s = IndexSearcher(idx)
    # MultiPhrase: "(apple|orange) store"
    mp = MultiPhrase((("apple", "orange"), ("store",)))
    assert s.match_all(mp)["doc_id"].to_pylist() == [0, 2]
    # PointInSetQuery over docvalues
    nis = NumericInSet("pagerank", (3.0, 0.5))
    assert s.match_all(nis)["doc_id"].to_pylist() == [0, 3]
    # FeatureField: static boost added to a term query
    node = Bool(must=[Term("apple")],
                should=[FeatureQuery("pagerank", weight=10.0, pivot=1.0)])
    res = s.search(node, k=4)
    # doc 0 (rank 3) outranks docs 1/3 despite identical term scores order
    assert res["doc_id"][0].as_py() == 0


def test_knn_classifier_and_sampled_facets(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data

    from lucene_solr_ray.relational.ml import knn_classify
    from lucene_solr_ray.relational.ops import sampled_facet_counts

    sf = "/root/testdata/sf0.001"
    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                columns=["vec_id", "embedding", "label"])
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["embedding", "label"])
    q = np.asarray(t["embedding"].to_pylist()[:3], dtype=np.float64)
    out = knn_classify(emb, q, "embedding", "label", k=1)
    # k=1 self-match returns the query's own label
    assert out["label"].to_pylist() == t["label"].to_pylist()[:3]

    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id", "lang"])
    est = sampled_facet_counts(docs, "lang", "doc_id", rate=0.5).to_pandas()
    exact = pq.read_table(f"{sf}/documents.parquet", columns=["lang"]
                          ).to_pandas()["lang"].value_counts()
    for _, row in est.iterrows():
        assert abs(row["cnt"] - exact[row["lang"]]) <= max(6, 0.8 * exact[row["lang"]])


def test_elevate_pins_excludes_and_ranks(idx):
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.services import elevate

    s = IndexSearcher(idx, dtype=np.float64)
    base = s.search("fast", k=10)
    base_ids = base["doc_id"].to_pylist()
    pin = [base_ids[-1], 10**9]          # a real match + a non-matching id
    out = elevate(s, "fast", pin, exclude_ids=[base_ids[0]], k=10)
    got = out["doc_id"].to_pylist()
    assert got[:2] == pin                # pinned order preserved
    assert out["elevated"].to_pylist()[:2] == [True, True]
    assert out["score"].to_pylist()[1] == 0.0   # non-matching pin scores 0
    assert base_ids[0] not in got        # excluded
    assert got[2:] == [d for d in base_ids
                       if d not in (base_ids[0], pin[0])][:8]
    assert out["rank"].to_pylist() == list(range(1, len(got) + 1))


def test_fuzzy_suggest(idx):
    from lucene_solr_ray.search.services import fuzzy_suggest, suggest

    s = IndexSearcher(idx)
    # typo 'fsat' -> 'fast' completions within 1 transposition
    out = fuzzy_suggest(s, "fsat", max_edits=1)
    terms = [t for t, _ in out]
    assert any(t.startswith("fast") for t in terms)
    # df-desc rank
    dfs = [d for _, d in out]
    assert dfs == sorted(dfs, reverse=True)
    # exact-prefix fallback below min_fuzzy_length == plain suggest
    assert fuzzy_suggest(s, "fa", min_fuzzy_length=3, k=3) == suggest(s, "fa", k=3)
    # first char anchored: no term with a different first letter
    assert all(t[0] == "f" for t in terms)


def test_fuzzy_suggest_brute_force(idx):
    from lucene_solr_ray.search.multiterm import _levenshtein_leq
    from lucene_solr_ray.search.services import fuzzy_suggest

    s = IndexSearcher(idx)
    p = "querv"  # 1 substitution from 'query'
    out = dict(fuzzy_suggest(s, p, k=100, max_edits=1))
    vocab = set()
    for sh in s.reader.shards:
        vocab.update(sh.terms.tolist())
    want = {
        t for t in vocab
        if t[:1] == p[:1] and any(
            _levenshtein_leq(p, t[:L], 1) for L in (4, 5, 6))
    }
    assert set(out) == want


def test_search_sorted_by_fields(tmp_path_factory, ray_session):
    from lucene_solr_ray.search.services import search_sorted_by_fields

    d = str(tmp_path_factory.mktemp("msort"))
    build_index(DOCS, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=2, num_buckets=4,
                                     string_docvalues_fields=("lang",),
                                     docvalues_fields=("n_chars",)))
    s = IndexSearcher(d)
    out = search_sorted_by_fields(
        s, "fast", [("lang", False), ("n_chars", True)], k=15)
    t = pq.read_table(DOCS, columns=["doc_id", "lang", "n_chars"])
    meta = {r["doc_id"]: (r["lang"], r["n_chars"])
            for r in t.to_pylist()}
    matches = s.match_all("fast")["doc_id"].to_pylist()
    want = sorted(matches,
                  key=lambda d_: (meta[d_][0], -meta[d_][1], d_))[:15]
    assert out["doc_id"].to_pylist() == want
    # returned key columns carry the true values
    for doc, lg, nc in zip(out["doc_id"].to_pylist(),
                           out["lang"].to_pylist(),
                           out["n_chars"].to_pylist()):
        assert (lg, nc) == (meta[doc][0], float(meta[doc][1]))


def test_blended_infix_suggester(ray_session):
    from lucene_solr_ray.search.services import BlendedInfixSuggester

    entries = [("star wars", 10), ("wars of stars", 10),
               ("star trek", 8), ("wario land", 6)]
    s = BlendedInfixSuggester(entries)
    got = s.suggest("war")
    # linear: "star wars" 10*(1-0.1*1)=9.0; "wars of stars" 10*1=10;
    # "wario land" 6*1=6
    assert got[0] == ("wars of stars", 10.0)
    assert got[1] == ("star wars", 9.0)
    assert got[2] == ("wario land", 6.0)
    # reciprocal blender changes the mix
    r = BlendedInfixSuggester(entries, blender="reciprocal")
    got_r = dict(r.suggest("war"))
    assert got_r["star wars"] == 5.0  # 10 / (1+1)
    assert got_r["wars of stars"] == 10.0
    # exponential reciprocal
    e = BlendedInfixSuggester(entries, blender="exp", exponent=2.0)
    assert dict(e.suggest("war"))["star wars"] == 2.5  # 10 / 2^2
    # no match
    assert s.suggest("zzz") == []


def test_cluster_results(tmp_path, ray_session):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.services import cluster_results

    # two obvious topical groups sharing the query term
    texts = (["shared cat cat cat feline whiskers"] * 5
             + ["shared dog dog dog canine bark"] * 5)
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(texts),
    }), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    s = IndexSearcher(idx, dtype=np.float64)
    out = cluster_results(s, "shared", p, k=10, n_clusters=2)
    assert out.num_rows == 10
    byid = dict(zip(out["doc_id"].to_pylist(), out["cluster"].to_pylist()))
    cats = {byid[d] for d in range(5)}
    dogs = {byid[d] for d in range(5, 10)}
    assert len(cats) == 1 and len(dogs) == 1 and cats != dogs
    labels = dict(zip(out["doc_id"].to_pylist(),
                      out["cluster_label"].to_pylist()))
    # cluster labels surface the defining term of each group
    assert labels[0] in ("cat", "feline", "whiskers")
    assert labels[9] in ("dog", "canine", "bark")
    # deterministic across runs
    out2 = cluster_results(s, "shared", p, k=10, n_clusters=2)
    assert out["cluster"].to_pylist() == out2["cluster"].to_pylist()


def test_explain_equals_score(tmp_path, ray_session):
    """The explain-equals-score invariant (TestExplanations role): the
    explanation's value must equal the search score exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.explain import explain

    texts = [f"red green blue doc{i}" if i % 2 else f"red yellow doc{i}"
             for i in range(40)]
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(texts)}), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    s = IndexSearcher(idx, dtype=np.float64)
    for q in ["red", "red AND green", "red OR yellow",
              '"red green"', "red AND NOT yellow"]:
        hits = s.search(q, k=5)
        for d, sc in zip(hits["doc_id"].to_pylist(),
                         hits["score"].to_pylist()):
            e = explain(s, q, d)
            assert e.is_match, (q, d)
            assert e.value == pytest.approx(sc, rel=1e-12), (q, d)
            assert "=" in str(e)
            assert e.to_dict()["value"] == e.value
    # non-matching doc explains as no-match
    miss = explain(s, "green", 0)  # doc 0 has yellow, not green
    assert not miss.is_match and miss.value == 0.0


def test_docvalues_stats(ray_session, tmp_path):
    """DocValuesStats (lucene/misc): moments over the match set's NUMERIC
    docvalues — numpy brute parity."""
    import numpy as np
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.services import docvalues_stats

    docs = "/root/testdata/sf0.001/documents.parquet"
    d = str(tmp_path / "dvs_idx")
    build_index(docs, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=3, num_buckets=4,
                                     docvalues_fields=("n_chars",)))
    s = IndexSearcher(d, dtype=np.float64)
    got = docvalues_stats(s, "fast", "n_chars").to_pandas().iloc[0]
    hits = set(s.match_all("fast")["doc_id"].to_pylist())
    meta = pq.read_table(docs, columns=["doc_id", "n_chars"])
    v = np.array([c for i, c in zip(meta["doc_id"].to_pylist(),
                                    meta["n_chars"].to_pylist())
                  if i in hits], dtype=np.float64)
    assert got["cnt"] == len(v)
    assert got["vmin"] == v.min() and got["vmax"] == v.max()
    assert got["mean"] == pytest.approx(v.mean())
    assert got["variance"] == pytest.approx(v.var(ddof=1))
    empty = docvalues_stats(s, "zzzznotaterm", "n_chars").to_pandas().iloc[0]
    assert empty["cnt"] == 0
    assert empty["mean"] is None or np.isnan(empty["mean"])
