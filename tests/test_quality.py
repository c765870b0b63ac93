"""Relevance-quality evaluation (benchmark/quality parity).

Engine metrics are checked two ways: against a naive per-query Python
computation over the engine's own top-k (internal consistency), and against
the DuckDB SQL oracle (end-to-end: retrieval + judgment + metrics).
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory):
    from lucene_solr_ray.index import IndexBuildConfig, build_index

    d = str(tmp_path_factory.mktemp("qidx") / "idx")
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4, batch_size=512)
    build_index(f"{SF}/documents.parquet", d, key_col="doc_id",
                text_col="text", cfg=cfg)
    return d


def naive_metrics(topk_ids, rel_ids, k):
    rel = set(rel_ids)
    hits = [(i + 1, d) for i, d in enumerate(topk_ids) if d in rel]
    nrr = len(hits)
    nrel = len(rel)
    mrr = 1.0 / hits[0][0] if hits else 0.0
    ap = sum((j + 1) / rnk for j, (rnk, _) in enumerate(hits)) / nrel if nrel else 0.0
    dcg = sum(1.0 / np.log2(rnk + 1) for rnk, _ in hits)
    idcg = sum(1.0 / np.log2(i + 1) for i in range(1, min(nrel, k) + 1))
    return {
        "num_rel": nrel, "num_rel_ret": nrr, "precision_at_k": nrr / k,
        "recall": nrr / nrel if nrel else 0.0, "mrr": mrr, "ap": ap,
        "ndcg": dcg / idcg if idcg else 0.0,
    }


def test_quality_matches_naive(index_dir):
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.quality import (
        conjunction_judgments, quality_benchmark,
    )

    queries = [("qa", "fast"), ("qb", "merge"), ("qc", "scan")]
    jpairs = [("qa", "fast AND merge"), ("qb", "merge AND scan"),
              ("qc", "scan AND fast")]
    k = 10
    j = conjunction_judgments(index_dir, jpairs)
    got = quality_benchmark(index_dir, queries, j, k=k).to_pandas()
    assert list(got["query_id"]) == ["qa", "qb", "qc"]

    s = IndexSearcher(index_dir, dtype=np.float64)
    jdf = j.to_pandas()
    for _, row in got.iterrows():
        qid = row["query_id"]
        qstr = dict(queries)[qid]
        topk = s.search(qstr, k=k)["doc_id"].to_pylist()
        rel = jdf[jdf.query_id == qid].doc_id.tolist()
        want = naive_metrics(topk, rel, k)
        for m, v in want.items():
            assert row[m] == pytest.approx(v, abs=1e-12), (qid, m)


def test_quality_matches_sql_oracle(index_dir):
    from lucene_solr_ray.search.oracle_sql import sql_quality_eval
    from lucene_solr_ray.search.quality import (
        conjunction_judgments, quality_benchmark,
    )

    spec = [("q1", "fast", "merge"), ("q2", "query", "scan")]
    j = conjunction_judgments(
        index_dir, [(q, f"{t} AND {r}") for q, t, r in spec])
    got = quality_benchmark(
        index_dir, [(q, t) for q, t, _ in spec], j, k=10).to_pandas()
    for c in ("precision_at_k", "recall", "mrr", "ap", "ndcg"):
        got[c] = got[c].round(6)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = con.execute(sql_quality_eval(spec, k=10)).fetchdf()
    con.close()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False, atol=1e-9)


def test_zero_result_query_emits_zero_row(index_dir):
    import pyarrow as pa

    from lucene_solr_ray.search.quality import quality_benchmark

    j = pa.table({"query_id": ["qz"], "doc_id": [0]})
    got = quality_benchmark(
        index_dir, [("qz", "zzznonexistenttermzzz")], j, k=5).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["num_rel"] == 1
    assert got.iloc[0]["num_rel_ret"] == 0
    assert got.iloc[0]["mrr"] == 0.0


def test_mrr_max_rank_quirk(index_dir):
    """QualityStats.java:87 only credits MRR when the first relevant hit is
    within the top 5; mrr_max_rank=5 reproduces that."""
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.quality import quality_benchmark
    import pyarrow as pa

    s = IndexSearcher(index_dir, dtype=np.float64)
    topk = s.search("fast", k=10)["doc_id"].to_pylist()
    # judge ONLY the doc at rank 7 relevant
    j = pa.table({"query_id": ["q"], "doc_id": [topk[6]]})
    strict = quality_benchmark(index_dir, [("q", "fast")], j, k=10,
                               mrr_max_rank=5).to_pandas()
    loose = quality_benchmark(index_dir, [("q", "fast")], j, k=10).to_pandas()
    assert strict.iloc[0]["mrr"] == 0.0
    assert loose.iloc[0]["mrr"] == pytest.approx(1 / 7)


def test_c4_filters_rules(ray_session):
    import pyarrow as pa
    import ray.data

    from lucene_solr_ray.textstats.ops import c4_filters

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            # 3 lines; 2 kept (end punct + >=5 words); 2 sentences
            "This is a real sentence here.\nshort line\n"
            "Another full sentence with words!",
            "lorem ipsum dolor sit amet. Yes. Sure.",   # placeholder page
            "code { return 1; }. More. Text.",          # brace page
            None,                                        # null text
            "One good sentence right here. Two now done. And three more.",
        ])}))
    out = c4_filters(docs, "doc_id", "text").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_lines"]) == [3, 1, 1, 1, 1]
    assert list(out["n_kept_lines"]) == [2, 1, 1, 0, 1]
    assert list(out["n_sentences"]) == [2, 3, 3, 0, 3]
    assert list(out["has_lorem_ipsum"]) == [False, True, False, False, False]
    assert list(out["has_brace"]) == [False, False, True, False, False]
    # only doc 4 survives: >=3 sentences, no placeholder, no brace
    assert list(out["passes"]) == [False, False, False, False, True]
