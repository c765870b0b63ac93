"""JoinUtil.createJoinQuery parity (join/JoinUtil.java:90): the engine's
two-phase value join vs a pandas-computed model over the same match set."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.services import join_query

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    """Index with lang/source SORTED string docvalues plus two numeric
    docvalues columns a = doc_id % 5 and b = doc_id % 3 (overlapping value
    domains, for the cross-field join case)."""
    root = tmp_path_factory.mktemp("join_idx")
    t = pq.read_table(DOCS, columns=["doc_id", "text", "lang", "source"])
    ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
    t = t.append_column("a", pa.array((ids % 5).astype(np.float64)))
    t = t.append_column("b", pa.array((ids % 3).astype(np.float64)))
    src = str(root / "docs.parquet")
    pq.write_table(t, src)
    d = str(root / "idx")
    build_index(
        src, d, key_col="doc_id", text_col="text",
        cfg=IndexBuildConfig(
            num_shards=2, num_buckets=4,
            string_docvalues_fields=("lang", "source"),
            docvalues_fields=("a", "b")))
    return d


def _model(searcher, query, from_col, to_col, mode):
    """Pandas model: aggregate matched scores per from_col value, join back
    on to_col."""
    m = searcher.match_all(query)
    t = pq.read_table(DOCS, columns=["doc_id", "lang", "source"])
    df = t.to_pandas()
    ids = np.asarray(df["doc_id"], dtype=np.int64)
    df["a"] = (ids % 5).astype(np.float64)
    df["b"] = (ids % 3).astype(np.float64)
    hits = pd.DataFrame({"doc_id": m["doc_id"].to_numpy(),
                         "score": m["score"].to_numpy()})
    hits = hits.merge(df, on="doc_id")
    agg = {"max": "max", "min": "min", "total": "sum", "avg": "mean"}[mode]
    per_val = hits.groupby(from_col)["score"].agg(agg)
    joined = df[df[to_col].isin(per_val.index)].copy()
    joined["score"] = joined[to_col].map(per_val)
    return joined.sort_values("doc_id")


@pytest.mark.parametrize("mode", ["max", "min", "total", "avg"])
def test_string_join_modes(idx, mode):
    s = IndexSearcher(idx, dtype=np.float64)
    got = join_query(s, "dup", "lang", score_mode=mode)
    want = _model(s, "dup", "lang", "lang", mode)
    assert got["doc_id"].to_pylist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               want["score"].to_numpy(), rtol=1e-9)


def test_none_mode_is_filter(idx):
    s = IndexSearcher(idx, dtype=np.float64)
    got = join_query(s, "dup", "lang", score_mode="none")
    want = _model(s, "dup", "lang", "lang", "max")
    assert got["doc_id"].to_pylist() == want["doc_id"].tolist()
    assert not got["score"].to_numpy().any()


def test_cross_field_numeric_join(idx):
    """from a = doc_id%5 to b = doc_id%3: only values {0,1,2} can join."""
    s = IndexSearcher(idx, dtype=np.float64)
    got = join_query(s, "fast", "a", to_field="b", score_mode="total")
    want = _model(s, "fast", "a", "b", "total")
    assert got["doc_id"].to_pylist() == want["doc_id"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               want["score"].to_numpy(), rtol=1e-9)
    vals = set(np.unique(np.asarray(got["doc_id"]) % 3))
    assert vals <= {0, 1, 2}


def test_topk_ordering(idx):
    s = IndexSearcher(idx, dtype=np.float64)
    full = join_query(s, "dup", "lang", score_mode="max")
    top = join_query(s, "dup", "lang", score_mode="max", k=7)
    pairs = sorted(zip(full["score"].to_numpy(), full["doc_id"].to_numpy()),
                   key=lambda x: (-x[0], x[1]))[:7]
    assert top["doc_id"].to_pylist() == [int(d) for _, d in pairs]
    assert len(top) == 7


def test_no_matches_empty(idx):
    s = IndexSearcher(idx, dtype=np.float64)
    got = join_query(s, "zzzznotaterm", "lang")
    assert got.num_rows == 0
    assert got.column_names == ["doc_id", "score"]
