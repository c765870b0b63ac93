"""Query-time two-pass grouping (grouping/GroupingSearch.java:51) over a
SORTED string docvalues field — brute-force parity."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.services import grouping_search

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("grp_idx"))
    build_index(DOCS, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=3, num_buckets=4,
                                     string_docvalues_fields=("lang",)))
    return IndexSearcher(d, dtype=np.float64)


def brute(searcher, query, n_groups, docs_per_group):
    t = searcher.match_all(query)
    langs = dict(zip(
        pq.read_table(DOCS, columns=["doc_id", "lang"])["doc_id"].to_pylist(),
        pq.read_table(DOCS, columns=["doc_id", "lang"])["lang"].to_pylist()))
    rows = [(langs[d], d, s) for d, s in
            zip(t["doc_id"].to_pylist(), t["score"].to_pylist())]
    best: dict[str, float] = {}
    for g, _, s in rows:
        best[g] = max(best.get(g, -1e18), s)
    top_groups = sorted(best, key=lambda g: (-best[g], g))[:n_groups]
    out = []
    for r, g in enumerate(top_groups):
        docs = sorted([x for x in rows if x[0] == g],
                      key=lambda x: (-x[2], x[1]))[:docs_per_group]
        for i, (gg, d, s) in enumerate(docs):
            out.append((gg, d, s, r + 1, i + 1))
    return out


@pytest.mark.parametrize("query,ng,dpg", [
    ("fast", 3, 2), ("fast OR query", 2, 4), ("merge", 5, 1),
])
def test_matches_brute_force(searcher, query, ng, dpg):
    got = grouping_search(searcher, query, "lang", n_groups=ng,
                          docs_per_group=dpg)
    rows = list(zip(got["grp"].to_pylist(), got["doc_id"].to_pylist(),
                    got["score"].to_pylist(), got["grp_rank"].to_pylist(),
                    got["doc_rank"].to_pylist()))
    want = brute(searcher, query, ng, dpg)
    assert [(g, d, r, dr) for g, d, _, r, dr in rows] == \
        [(g, d, r, dr) for g, d, _, r, dr in want]
    assert [s for _, _, s, _, _ in rows] == pytest.approx(
        [s for _, _, s, _, _ in want])


def test_no_matches(searcher):
    out = grouping_search(searcher, "zzzznotaterm", "lang")
    assert out.num_rows == 0
