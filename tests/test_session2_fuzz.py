"""Randomized fuzz for the continuation-session-2 surfaces: URP chain vs a
pandas model, interval facets vs brute force, terms_enum vs a Counter
model, simple_parse never-throws + classic-equivalence, word-break vs a
recursive splitter, and IVF full-probe == brute force on random data."""

import itertools
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher

VOCAB = ["ant", "bee", "cat", "dog", "elk", "fox"]


@pytest.mark.parametrize("seed", [3, 41])
def test_urp_chain_fuzz_vs_pandas(ray_session, seed):
    from lucene_solr_ray.pipelines.urp import apply_chain

    rng = np.random.default_rng(seed)
    texts = ["  " + " ".join(rng.choice(VOCAB, size=int(rng.integers(1, 8))))
             + "  " for _ in range(50)]
    t = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                  "text": pa.array(texts)})
    chain = [
        ("trim", {"field": "text"}),
        ("regex_replace", {"field": "text", "pattern": "cat",
                           "replacement": "lion"}),
        ("upper", {"field": "text"}),
        ("field_length", {"field": "text", "dest": "n"}),
        ("truncate", {"field": "text", "max_length": 12}),
    ]
    out = apply_chain(ray.data.from_arrow(t), chain).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    import pandas as pd

    exp = pd.Series(texts).str.strip() \
        .str.replace("cat", "lion", regex=True).str.upper()
    assert out.n.tolist() == exp.str.len().tolist()
    assert out.text.tolist() == exp.str.slice(0, 12).tolist()


@pytest.mark.parametrize("seed", [7, 77])
def test_interval_facets_fuzz(ray_session, seed):
    from lucene_solr_ray.relational.ops import interval_facets

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 100, size=300)
    t = pa.table({"v": pa.array(vals, pa.int64())})
    specs = []
    for _ in range(6):
        a, b = sorted(rng.integers(0, 100, size=2).tolist())
        lo = "[" if rng.random() < 0.5 else "("
        hi = "]" if rng.random() < 0.5 else ")"
        a_s = "*" if rng.random() < 0.15 else str(a)
        b_s = "*" if rng.random() < 0.15 else str(b)
        specs.append(f"{lo}{a_s},{b_s}{hi}")
    got = interval_facets(ray.data.from_arrow(t), "v", specs)
    for spec, cnt in zip(got["interval"].to_pylist(),
                         got["cnt"].to_pylist()):
        m = re.fullmatch(r"([\[(])(.+),(.+)([\])])", spec)
        lo_i, a_s, b_s, hi_i = m.groups()
        mask = np.ones(len(vals), dtype=bool)
        if a_s != "*":
            mask &= (vals >= int(a_s)) if lo_i == "[" else (vals > int(a_s))
        if b_s != "*":
            mask &= (vals <= int(b_s)) if hi_i == "]" else (vals < int(b_s))
        assert cnt == int(mask.sum()), spec


@pytest.mark.parametrize("seed", [11])
def test_terms_enum_fuzz(tmp_path, ray_session, seed):
    from collections import Counter

    from lucene_solr_ray.search.services import terms_enum

    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(VOCAB, size=int(rng.integers(1, 10))))
             for _ in range(120)]
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(range(120), pa.int64()),
                             "text": pa.array(texts)}), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=3, num_buckets=4))
    dfc = Counter()
    for t in texts:
        dfc.update(set(t.split()))
    for prefix, mincount, sort in itertools.product(
            ["", "a", "b", "zz"], [1, 10], ["count", "index"]):
        got = terms_enum(idx, prefix=prefix, mincount=mincount,
                         limit=None, sort=sort)
        want = [(t, n) for t, n in dfc.items()
                if t.startswith(prefix) and n >= mincount]
        key = (lambda x: (-x[1], x[0])) if sort == "count" \
            else (lambda x: x[0])
        want.sort(key=key)
        assert list(zip(got["term"].to_pylist(),
                        got["df"].to_pylist())) == want, (prefix, sort)


def test_simple_parse_never_raises_fuzz():
    from lucene_solr_ray.search.simple_parser import simple_parse

    rng = np.random.default_rng(5)
    alphabet = list('ab +|-"()*~\\13')
    for _ in range(400):
        s = "".join(rng.choice(alphabet,
                               size=int(rng.integers(0, 24))))
        simple_parse(s)  # must never raise


@pytest.mark.parametrize("seed", [13])
def test_simple_parse_equivalence_fuzz(tmp_path, ray_session, seed):
    from lucene_solr_ray.search.simple_parser import simple_parse

    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(VOCAB, size=int(rng.integers(2, 9))))
             for _ in range(80)]
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(range(80), pa.int64()),
                             "text": pa.array(texts)}), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    s = IndexSearcher(idx, dtype=np.float64)
    for _ in range(10):
        a, b = rng.choice(VOCAB, size=2, replace=False)
        for simple, classic in ((f"{a}+{b}", f"{a} AND {b}"),
                                (f"{a}|{b}", f"{a} OR {b}")):
            x = s.match_all(simple_parse(simple))
            y = s.match_all(classic)
            assert x["doc_id"].to_pylist() == y["doc_id"].to_pylist()
            np.testing.assert_allclose(x["score"].to_pylist(),
                                       y["score"].to_pylist())


@pytest.mark.parametrize("seed", [17])
def test_word_break_fuzz(tmp_path, ray_session, seed):
    from lucene_solr_ray.search.services import word_break_suggest

    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(VOCAB, size=6)) for _ in range(60)]
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(range(60), pa.int64()),
                             "text": pa.array(texts)}), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    s = IndexSearcher(idx)
    from collections import Counter

    dfc = Counter()
    for t in texts:
        dfc.update(set(t.split()))
    words = sorted(dfc)

    def brute(word, max_changes):
        out = []

        def rec(rest, parts):
            if parts and rest in dfc:
                out.append((" ".join(parts + [rest]), len(parts)))
            if len(parts) >= max_changes:
                return
            for i in range(1, len(rest)):
                if rest[:i] in dfc:
                    rec(rest[i:], parts + [rest[:i]])

        rec(word, [])
        return sorted({(sg, br,
                        max(dfc[w] for w in sg.split()))
                       for sg, br in out},
                      key=lambda x: (x[1], -x[2], x[0]))

    for _ in range(8):
        glued = "".join(rng.choice(words, size=int(rng.integers(2, 4))))
        for mc in (1, 2, 3):
            got = word_break_suggest(s, glued, max_changes=mc,
                                     max_suggestions=50)
            want = brute(glued, mc)
            assert list(zip(got["suggestion"].to_pylist(),
                            got["breaks"].to_pylist(),
                            got["freq"].to_pylist())) == want, (glued, mc)


@pytest.mark.parametrize("seed", [19])
def test_ivf_fuzz_full_probe_parity(tmp_path, ray_session, seed):
    from lucene_solr_ray.ann import brute_force_knn, build_ivf_index, \
        ivf_index_search

    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(150, 12))
    t = pa.table({"vec_id": pa.array(np.arange(150, dtype=np.int64)),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float64()))})
    d = str(tmp_path / "ivf")
    build_ivf_index(ray.data.from_arrow(t), d, "vec_id", "embedding",
                    n_lists=6, sample_size=150, iters=5, seed=seed)
    q = vecs[rng.choice(150, size=4, replace=False)]
    exact = brute_force_knn(ray.data.from_arrow(t), "vec_id", "embedding",
                            q, k=7)
    got = ivf_index_search(d, q, k=7, nprobe=6)
    assert got["key"].to_pylist() == exact["key"].to_pylist()
    np.testing.assert_allclose(got["cosine"].to_pylist(),
                               exact["cosine"].to_pylist(), rtol=1e-9)


# --- review-fix regressions -------------------------------------------------

def test_rank_over_nested_evaluator(ray_session):
    from lucene_solr_ray.relational.streams import StreamContext, \
        run_expression

    row = run_expression("let(a=rank(array(3,1,2)), b=tuple(r=a), get(b))",
                         StreamContext()).to_pandas().to_dict("records")
    assert list(row[0]["r"]) == [3.0, 1.0, 2.0]


def test_gopher_null_text(ray_session):
    from lucene_solr_ray.textstats.ops import gopher_filters

    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["the word here", None, "more text"],
                                   pa.string())})
    out = gopher_filters(ray.data.from_arrow(t), "doc_id", "text") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.n_words.tolist() == [3, 0, 2]  # null/empty doc -> 0 words
    assert not out.passes.any()
    assert (out.mean_word_len >= 0).all()


def test_pivot_facets_null_keys(ray_session):
    from lucene_solr_ray.relational.ops import pivot_facets

    t = pa.table({"a": pa.array(["x", "x", None], pa.string()),
                  "b": pa.array(["p", None, "q"], pa.string())})
    out = pivot_facets(ray.data.from_arrow(t), ["a", "b"]).to_pandas()
    total = out[(out.a == "(all)") & (out.b == "(all)")].cnt.iloc[0]
    lvl1 = out[(out.a != "(all)") & (out.b == "(all)")].cnt.sum()
    leaf = out[(out.a != "(all)") & (out.b != "(all)")].cnt.sum()
    assert total == lvl1 == leaf == 3  # null keys kept at every level
    assert "(null)" in set(out.a) and "(null)" in set(out.b)


def test_blended_term_no_key_collision(tmp_path, ray_session):
    from lucene_solr_ray.search.query import BlendedTerm, Bool

    rng = np.random.default_rng(31)
    texts = (["aa rare1"] * 2 + ["aa common"] * 40
             + ["filler words only"] * 10)
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    s = IndexSearcher(idx, dtype=np.float64)
    b1 = BlendedTerm((("aa", 1.0), ("rare1", 1.0)))
    b2 = BlendedTerm((("aa", 1.0), ("common", 1.0)))
    both = s.match_all(Bool(should=[b1, b2]))
    # per-node evaluation must equal the sum (no shared-member stat reuse)
    s1 = dict(zip(s.match_all(b1)["doc_id"].to_pylist(),
                  s.match_all(b1)["score"].to_pylist()))
    s2 = dict(zip(s.match_all(b2)["doc_id"].to_pylist(),
                  s.match_all(b2)["score"].to_pylist()))
    got = dict(zip(both["doc_id"].to_pylist(), both["score"].to_pylist()))
    for d, v in got.items():
        assert v == pytest.approx(s1.get(d, 0.0) + s2.get(d, 0.0)), d


def test_blended_infix_requires_all_tokens(ray_session):
    from lucene_solr_ray.search.services import BlendedInfixSuggester

    sug = BlendedInfixSuggester([("mobile phone", 10), ("home phone", 10)])
    got = [t for t, _ in sug.suggest("mobile ph")]
    assert got == ["mobile phone"]


def test_interval_facets_bad_specs_and_duplicates(ray_session):
    from lucene_solr_ray.relational.ops import interval_facets, \
        parse_facet_interval

    with pytest.raises(ValueError):
        parse_facet_interval("[1,2,3]")  # more than one unescaped comma
    t = pa.table({"v": pa.array([1, 2, 3, 4], pa.int64())})
    out = interval_facets(ray.data.from_arrow(t), "v",
                          ["[1,3]", "[1,3]"])
    assert out["cnt"].to_pylist() == [3, 3]  # not doubled


def test_repetition_large_vocab_no_collision(ray_session):
    from lucene_solr_ray.textstats.ops import repetition_filters

    # 1500 unique tokens then one repeated trigram: exact counting must
    # survive vocab sizes whose base-encoding would overflow int64
    toks = [f"w{i}" for i in range(1500)] + ["a", "b", "c", "a", "b", "c"]
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([" ".join(toks)])})
    out = repetition_filters(ray.data.from_arrow(t), "doc_id", "text",
                             top_ns=(3,), dup_ns=(3,)).to_pandas()
    n = len(toks)
    assert out.top3_frac[0] == pytest.approx(2 * 3 / n)
    assert out.dup3_frac[0] == pytest.approx(6 / n)
