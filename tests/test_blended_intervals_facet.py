"""BlendedTermQuery (core/search/BlendedTermQuery.java) and Solr interval
facets (request/IntervalFacets.java) tests."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.relational.ops import interval_facets, \
    parse_facet_interval
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.query import BlendedTerm

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("bt_idx"))
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4, batch_size=256)
    build_index(DOCS, d, key_col="doc_id", text_col="text", cfg=cfg)
    return d


@pytest.fixture(scope="module")
def raw():
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    return list(zip(t["doc_id"].to_pylist(),
                    [s.split(" ") for s in t["text"].to_pylist()]))


def test_blended_term_artificial_stats(idx, raw):
    """Every member scores with df = max(dfs), ttf = sum — hand-computed."""
    s = IndexSearcher(idx, dtype=np.float64)
    from collections import Counter

    dfc, ttfc = Counter(), Counter()
    dls = {}
    for d, toks in raw:
        dfc.update(set(toks))
        ttfc.update(toks)
        dls[d] = len(toks)
    terms = sorted(dfc, key=lambda t: dfc[t])
    t1, t2 = terms[0], terms[-1]  # rarest + most common
    got_t = s.match_all(BlendedTerm(((t1, 1.0), (t2, 2.0))))
    got = dict(zip(got_t["doc_id"].to_pylist(), got_t["score"].to_pylist()))

    n = len(raw)
    sum_dl = sum(dls.values())
    bdf = max(dfc[t1], dfc[t2])
    idf = math.log(1 + (n - bdf + 0.5) / (bdf + 0.5))
    avgdl = sum_dl / n
    from lucene_solr_ray.util.smallfloat import byte4_to_int, int_to_byte4

    k1, b = 1.2, 0.75
    exp = {}
    for d, toks in raw:
        dlq = byte4_to_int(int_to_byte4(len(toks)))
        inv = 1.0 / (k1 * ((1 - b) + b * dlq / avgdl))
        member = []
        for t, bo in ((t1, 1.0), (t2, 2.0)):
            f = toks.count(t)
            if f:
                w = bo * idf
                member.append(w - w / (1.0 + f * inv))
        if member:
            mx, sm = max(member), sum(member)
            exp[d] = mx + 0.01 * (sm - mx)
    assert sorted(got) == sorted(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=1e-9), d


def test_blended_term_bool_rewrite_sums(idx, raw):
    s = IndexSearcher(idx, dtype=np.float64)
    from collections import Counter

    dfc = Counter()
    for _, toks in raw:
        dfc.update(set(toks))
    terms = sorted(dfc)
    q = BlendedTerm(((terms[0], 1.0), (terms[1], 1.0)), rewrite="bool")
    qd = BlendedTerm(((terms[0], 1.0), (terms[1], 1.0)), tiebreak=1.0)
    # tiebreak=1.0 dismax == bool sum
    a = s.match_all(q)
    b = s.match_all(qd)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    np.testing.assert_allclose(a["score"].to_pylist(), b["score"].to_pylist())


def test_blended_term_distributed_parity(idx, raw):
    from lucene_solr_ray.search import DistributedSearcher

    toks0 = raw[0][1]
    q = BlendedTerm(((toks0[0], 1.0), (toks0[1], 1.5)))
    local = IndexSearcher(idx, dtype=np.float64).search(q, k=10)
    dist = DistributedSearcher(idx, num_actors=2, dtype=np.float64).search(q, k=10)
    assert local["doc_id"].to_pylist() == dist["doc_id"].to_pylist()
    np.testing.assert_allclose(local["score"].to_pylist(),
                               dist["score"].to_pylist())


# ---------------------------------------------------------------------------
# interval facets
# ---------------------------------------------------------------------------

def test_parse_facet_interval():
    assert parse_facet_interval("[1,10)") == ("[1,10)", "1", "10", True, False)
    assert parse_facet_interval("(1,10]") == ("(1,10]", "1", "10", False, True)
    assert parse_facet_interval("[*,*]") == ("[*,*]", None, None, True, True)
    k, lo, hi, li, hi_i = parse_facet_interval(r"[a\,b,c]")
    assert lo == "a,b" and hi == "c"
    with pytest.raises(ValueError):
        parse_facet_interval("1,10")
    with pytest.raises(ValueError):
        parse_facet_interval("[110]")


def test_interval_facets_numeric(ray_session):
    t = pq.read_table(DOCS, columns=["n_chars"])
    vals = np.asarray(t["n_chars"].to_pylist())
    specs = ["[*,150)", "[150,200)", "[150,200]", "(150,*]", "[*,*]"]
    got = interval_facets(ray.data.from_arrow(t), "n_chars", specs)
    assert got["interval"].to_pylist() == specs
    exp = [
        int(np.count_nonzero(vals < 150)),
        int(np.count_nonzero((vals >= 150) & (vals < 200))),
        int(np.count_nonzero((vals >= 150) & (vals <= 200))),
        int(np.count_nonzero(vals > 150)),
        len(vals),
    ]
    assert got["cnt"].to_pylist() == exp


def test_interval_facets_string(ray_session):
    t = pq.read_table(DOCS, columns=["lang"])
    langs = t["lang"].to_pylist()
    got = interval_facets(ray.data.from_arrow(t), "lang",
                          ["[de,en]", "(en,*]"])
    assert got["cnt"].to_pylist() == [
        sum(1 for v in langs if "de" <= v <= "en"),
        sum(1 for v in langs if v > "en"),
    ]
