"""Solr field collapse + expand (CollapsingQParserPlugin.java:61,
ExpandComponent.java:104) — brute-force parity over SORTED docvalues,
min/max head modes, null policies."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.services import collapse_expand

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("col_idx"))
    build_index(DOCS, d, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=3, num_buckets=4,
                                     string_docvalues_fields=("lang",),
                                     docvalues_fields=("n_chars",)))
    return IndexSearcher(d, dtype=np.float64)


def _rows(searcher, query):
    t = searcher.match_all(query)
    meta = pq.read_table(DOCS, columns=["doc_id", "lang", "n_chars"])
    lang = dict(zip(meta["doc_id"].to_pylist(), meta["lang"].to_pylist()))
    nch = dict(zip(meta["doc_id"].to_pylist(), meta["n_chars"].to_pylist()))
    return [(lang[d], d, s, nch[d]) for d, s in
            zip(t["doc_id"].to_pylist(), t["score"].to_pylist())]


def brute(searcher, query, k, expand_rows, head_by="score"):
    rows = _rows(searcher, query)
    groups: dict[str, list] = {}
    for r in rows:
        groups.setdefault(r[0], []).append(r)
    heads = {}
    for g, rs in groups.items():
        if head_by == "score":
            heads[g] = min(rs, key=lambda x: (-x[2], x[1]))
        elif head_by[0] == "min":
            heads[g] = min(rs, key=lambda x: (x[3], x[1]))
        else:
            heads[g] = min(rs, key=lambda x: (-x[3], x[1]))
    ranked = sorted(heads.values(), key=lambda x: (-x[2], x[1]))[:k]
    out = []
    for hr, h in enumerate(ranked):
        out.append((h[0], h[1], h[2], "head", hr + 1, 0))
        comp = sorted([r for r in groups[h[0]] if r[1] != h[1]],
                      key=lambda x: (-x[2], x[1]))[:expand_rows]
        for er, c in enumerate(comp):
            out.append((c[0], c[1], c[2], "expand", hr + 1, er + 1))
    return out


@pytest.mark.parametrize("query,k,er", [
    ("fast", 3, 2), ("fast OR query", 5, 1), ("merge", 2, 4),
])
def test_score_collapse_matches_brute(searcher, query, k, er):
    got = collapse_expand(searcher, query, "lang", k=k, expand_rows=er)
    rows = list(zip(got["grp"].to_pylist(), got["doc_id"].to_pylist(),
                    got["score"].to_pylist(), got["role"].to_pylist(),
                    got["head_rank"].to_pylist(), got["exp_rank"].to_pylist()))
    want = brute(searcher, query, k, er)
    assert [(g, d, r, hr, x) for g, d, _, r, hr, x in rows] == \
        [(g, d, r, hr, x) for g, d, _, r, hr, x in want]
    assert [s for _, _, s, _, _, _ in rows] == pytest.approx(
        [s for _, _, s, _, _, _ in want])


@pytest.mark.parametrize("mode", ["min", "max"])
def test_field_head_collapse(searcher, mode):
    got = collapse_expand(searcher, "fast", "lang", k=4, expand_rows=1,
                          head_by=(mode, "n_chars"))
    rows = list(zip(got["grp"].to_pylist(), got["doc_id"].to_pylist(),
                    got["role"].to_pylist(), got["head_rank"].to_pylist(),
                    got["exp_rank"].to_pylist()))
    want = brute(searcher, "fast", 4, 1, head_by=(mode, "n_chars"))
    assert rows == [(g, d, r, hr, x) for g, d, _, r, hr, x in want]


def test_expand_zero_rows(searcher):
    got = collapse_expand(searcher, "fast", "lang", k=3, expand_rows=0)
    assert set(got["role"].to_pylist()) == {"head"}
    assert len(got) == min(3, len(set(
        g for g, *_ in brute(searcher, "fast", 99, 0))))


def test_no_matches(searcher):
    got = collapse_expand(searcher, "zzzznotaterm", "lang")
    assert len(got) == 0


@pytest.fixture(scope="module")
def null_searcher(tmp_path_factory, ray_session):
    """Corpus where docs 3,7,11 have no collapse-field value."""
    import os

    d = tmp_path_factory.mktemp("col_null")
    docs = pq.read_table(DOCS).slice(0, 40)
    cat = [None if i % 4 == 3 else ("g%d" % (i % 3))
           for i in range(docs.num_rows)]
    docs = docs.append_column("cat", pa.array(cat, pa.large_string()))
    src = os.path.join(str(d), "docs.parquet")
    pq.write_table(docs, src)
    idx = os.path.join(str(d), "idx")
    build_index(src, idx, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=2, num_buckets=2,
                                     string_docvalues_fields=("cat",)))
    return IndexSearcher(idx, dtype=np.float64)


def test_null_policy_ignore(null_searcher):
    got = collapse_expand(null_searcher, "the OR a OR fast", "cat",
                          k=10, expand_rows=1, null_policy="ignore")
    assert "" not in set(got["grp"].to_pylist())
    assert len(set(g for g, r in zip(got["grp"].to_pylist(),
                                     got["role"].to_pylist())
                   if r == "head")) <= 3


def test_null_policy_collapse_vs_expand(null_searcher):
    col = collapse_expand(null_searcher, "the OR a OR fast", "cat",
                          k=10, expand_rows=0, null_policy="collapse")
    exp = collapse_expand(null_searcher, "the OR a OR fast", "cat",
                          k=10, expand_rows=0, null_policy="expand")
    n_null_col = sum(1 for g in col["grp"].to_pylist() if g == "")
    n_null_exp = sum(1 for g in exp["grp"].to_pylist() if g == "")
    # collapse: all nulls one group -> exactly one null head; expand:
    # each null doc its own group -> several null heads
    assert n_null_col == 1
    assert n_null_exp > 1
    # expand-policy null heads never carry companions
    for g, r in zip(exp["grp"].to_pylist(), exp["role"].to_pylist()):
        if g == "":
            assert r == "head"
