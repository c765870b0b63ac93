"""Stemmer + synonym analysis-chain tests."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.analysis.stem import (
    english_minimal_stem,
    porter_stem,
    sql_minimal_stem,
)

# full-pipeline outputs from the published Porter algorithm description +
# Martin Porter's public vocabulary sample
PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file", "happy": "happi",
    "sky": "sky", "relational": "relat", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
}


def test_porter_vectors():
    bad = {w: porter_stem(w) for w, e in PORTER_VECTORS.items()
           if porter_stem(w) != e}
    assert not bad, bad


def test_minimal_stem_rules():
    cases = {
        "tables": "table", "ponies": "pony", "ties": "ty", "bus": "bus",
        "hiss": "hiss", "goes": "goes", "as": "as", "dogs": "dog",
        "dies": "dy", "aes": "aes", "queries": "query", "caress": "caress",
        "gas": "ga", "its": "it", "is": "is",
    }
    for w, e in cases.items():
        assert english_minimal_stem(w) == e, (w, english_minimal_stem(w), e)


def test_minimal_stem_sql_parity():
    """sql_minimal_stem must equal english_minimal_stem on random words."""
    import duckdb
    import random

    rng = random.Random(3)
    words = ["".join(rng.choice("abcdeiosuy") for _ in range(rng.randint(1, 8)))
             for _ in range(3000)]
    words += ["tables", "ponies", "ties", "bus", "ss", "s", "ies", "ues", "oes"]
    con = duckdb.connect()
    got = [r[0] for r in con.execute(
        f"SELECT {sql_minimal_stem('w')} FROM (SELECT unnest(?) AS w)", [words]
    ).fetchall()]
    exp = [english_minimal_stem(w) for w in words]
    assert got == exp


def test_stemmed_index_and_synonyms(ray_session, tmp_path):
    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.index.maintenance import check_index
    from lucene_solr_ray.search import IndexSearcher

    texts = [
        "the cats sat on tables",       # 0
        "a cat sat on a table",         # 1
        "dogs chase cars quickly",      # 2
        "fast queries need fast indexes",  # 3
    ]
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(np.arange(4, dtype=np.int64)),
                             "text": pa.array(texts, pa.string())}), p)
    idx = str(tmp_path / "idx")
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4,
                           stemmer="minimal_english",
                           synonyms=("fast,speedy", "cat,feline"))
    build_index(p, idx, cfg=cfg)
    check_index(idx)
    s = IndexSearcher(idx)
    # query-side stemming: 'tables' and 'table' hit both docs
    assert s.match_all("tables")["doc_id"].to_pylist() == [0, 1]
    assert s.match_all("table")["doc_id"].to_pylist() == [0, 1]
    assert s.match_all("cats")["doc_id"].to_pylist() == [0, 1]
    # synonyms: 'speedy' was never written but matches 'fast' docs
    assert s.match_all("speedy")["doc_id"].to_pylist() == [3]
    assert s.match_all("feline")["doc_id"].to_pylist() == [0, 1]
    # synonym insertions carry the source position: phrase across them works
    assert s.match_all('"feline sat"')["doc_id"].to_pylist() == [0, 1]
    # doclen excludes synonym insertions (documented divergence)
    sh_dl = sum(int(sh.doclens.sum()) for sh in s.reader.shards)
    assert sh_dl == sum(len(t.split()) for t in texts)


def test_distributed_searcher_stemmed_parity(ray_session, tmp_path):
    """DistributedSearcher must apply the index's stemmer identically."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import DistributedSearcher, IndexSearcher

    texts = ["cats chase dogs", "a cat sleeps", "dogs bark loudly",
             "tables and chairs"] * 5
    p = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }), p)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4, stemmer="minimal_english"))
    local = IndexSearcher(idx)
    dist = DistributedSearcher(idx, num_actors=2)
    for q in ("cats", "cat", "dogs OR tables", "chairs"):
        a = local.search(q, k=10)
        b = dist.search(q, k=10)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q


def test_stemmer_applies_inside_function_score(tmp_path, ray_session):
    """apply_stemmer must recurse into FunctionScore and MultiPhrase
    wrappers (regression: a FunctionScore-wrapped Term skipped the index
    stemmer and matched nothing)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.query import FunctionScore, MultiPhrase, Term

    corp = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["running fast today", "walked slowly home"]),
    }), corp)
    idx = str(tmp_path / "idx")
    build_index(corp, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4, stemmer="porter"))
    s = IndexSearcher(idx)
    plain = s.search(Term("running"), k=5)["doc_id"].to_pylist()
    wrapped = s.search(FunctionScore(Term("running"), "score"),
                       k=5)["doc_id"].to_pylist()
    assert plain == wrapped == [0]
    mp = s.search(MultiPhrase((("running",), ("fast", "slowly"))),
                  k=5)["doc_id"].to_pylist()
    assert mp == [0]


def test_stemmer_applies_inside_spans_and_intervals(tmp_path, ray_session):
    """apply_stemmer must rewrite span clauses and interval sources too
    (regression: SpanNear/IntervalQuery over raw inflected terms silently
    matched nothing on a stemmed index)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher, intervals
    from lucene_solr_ray.search.query import IntervalQuery, SpanNear, SpanTerm

    corp = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["running quickly home", "walked slowly away"]),
    }), corp)
    idx = str(tmp_path / "idx")
    build_index(corp, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4, stemmer="porter"))
    s = IndexSearcher(idx)
    q = SpanNear((SpanTerm("running"), SpanTerm("quickly")), slop=0)
    assert s.search(q, k=5)["doc_id"].to_pylist() == [0]
    iq = IntervalQuery(intervals.ordered("running", "home"))
    assert s.search(iq, k=5)["doc_id"].to_pylist() == [0]
