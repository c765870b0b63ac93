"""Declarative search-component pipeline (SearchHandler.handleRequestBody
component loop): query + facet + stats + highlight + spellcheck sections
composed from one params dict."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.pipelines.components import handle_request

N = 300


@pytest.fixture(scope="module")
def comp_index(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("comp")
    rng = np.random.default_rng(3)
    langs = ["en", "de", "fr"]
    rows = {"doc_id": [], "text": [], "lang": [], "score10": []}
    for i in range(N):
        words = ["common"]
        if i % 2 == 0:
            words.append("pizza")
        if i % 5 == 0:
            words.append("rare")
        words += [f"w{rng.integers(0, 50)}" for _ in range(5)]
        rows["doc_id"].append(i)
        rows["text"].append(" ".join(words))
        rows["lang"].append(langs[i % 3])
        rows["score10"].append(float(i % 10))
    p = str(tmp / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "text": pa.array(rows["text"], pa.string()),
        "lang": pa.array(rows["lang"], pa.string()),
        "score10": pa.array(rows["score10"], pa.float64()),
    }), p)
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4,
        keyword_fields=("lang",), docvalues_fields=("score10",)))
    return idx, p


def test_query_and_facet_and_stats(comp_index):
    idx, corpus = comp_index
    resp = handle_request(idx, {
        "q": "pizza", "rows": 5,
        "facet": True, "facet.field": "lang",
        "stats": True, "stats.field": "score10,doclen",
    })
    assert resp["response"]["numFound"] == N // 2
    assert len(resp["response"]["docs"]) == 5
    facets = resp["facet_counts"]["facet_fields"]["lang"]
    # pizza docs are the even ids: lang cycles en,de,fr -> en=even%3==0...
    want = {}
    for i in range(0, N, 2):
        lg = ["en", "de", "fr"][i % 3]
        want[lg] = want.get(lg, 0) + 1
    assert facets == want
    st = resp["stats"]["stats_fields"]["score10"]
    assert st["count"] == N and st["min"] == 0.0 and st["max"] == 9.0
    assert "doclen" in resp["stats"]["stats_fields"]


def test_sort_param(comp_index):
    idx, corpus = comp_index
    resp = handle_request(idx, {"q": "rare", "rows": 3,
                                "sort": "score10 desc"})
    vals = [d["score10"] for d in resp["response"]["docs"]]
    assert vals == sorted(vals, reverse=True)


def test_highlight_and_spellcheck(comp_index):
    idx, corpus = comp_index
    resp = handle_request(idx, {
        "q": "pizza", "rows": 2, "hl": True,
        "spellcheck": True, "spellcheck.q": "pizzb",
    }, corpus_paths=corpus)
    hl = resp["highlighting"]
    assert len(hl) == 2
    assert all("<b>pizza</b>" in v for v in hl.values())
    sugg = resp["spellcheck"]["suggestions"]["pizzb"]
    assert sugg and sugg[0][0] == "pizza"


def test_unknown_component_rejected(comp_index):
    idx, _ = comp_index
    with pytest.raises(ValueError):
        handle_request(idx, {"q": "x"}, components=("query", "nope"))
