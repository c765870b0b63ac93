"""Relevance-quality evaluation: the reference's benchmark/quality package
as a distributed Ray Data pipeline.

Re-expresses QualityBenchmark.execute -> QualityStats
(lucene/benchmark/src/java/org/apache/lucene/benchmark/quality/
QualityBenchmark.java:49, QualityStats.java:68-113) with binary TrecJudge
relevance (quality/trec/TrecJudge.java:39): a judged query set runs through
the bulk `batch_search` actor pool (queries-as-a-Dataset, each actor pins
the index once), retrieved lists join a BROADCAST judgment set, and
per-query metrics reduce in a groupby over query ids.

Scale assumptions, stated: the query set and qrels are the small side
(TREC-style judgment files are O(queries x judged-docs), unrelated to
corpus size) and are broadcast via ray.put once; the corpus-sized work —
scoring every query against every shard — runs entirely inside the actor
pool. The metrics table is one row per query and is returned materialized.

Metrics per query (QualityStats parity, plus nDCG which the reference's
later benchmark tooling reports):

- num_rel        judged-relevant count (maxGoodPoints)
- num_rel_ret    relevant docs retrieved in the top k
- precision_at_k num_rel_ret / k               (QualityStats.getPrecisionAt)
- recall         num_rel_ret / num_rel         (QualityStats.recall)
- mrr            1/rank of first relevant hit  (QualityStats.java:87; the
                 reference only credits MRR when that rank is <= 5 — pass
                 mrr_max_rank=5 for the faithful quirk, default None scores
                 any rank within k)
- ap             sum over relevant hits of (relevant-seen/rank) / num_rel
                 (QualityStats.getAvp: sumPrecision / maxGoodPoints)
- ndcg           binary-gain DCG@k / IDCG@k, gains 1/log2(rank+1)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .searcher import batch_search

__all__ = ["quality_benchmark", "conjunction_judgments"]


def conjunction_judgments(index_dir: str, pairs: list[tuple[str, str]],
                          dtype=np.float64) -> pa.Table:
    """Deterministic qrels synthesis for tests/benchmarks: for each
    (query_id, boolean-query) pair, every doc matching the query is judged
    relevant (binary). Runs each judgment query through the engine's own
    match-all path (per-shard threaded, no top-k cap)."""
    from .searcher import IndexSearcher

    s = IndexSearcher(index_dir, dtype=dtype)
    qids: list[str] = []
    docs: list[np.ndarray] = []
    for qid, query in pairs:
        t = s.match_all(query)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        qids.extend([qid] * len(ids))
        docs.append(ids)
    all_docs = np.concatenate(docs) if docs else np.zeros(0, np.int64)
    return pa.table({
        "query_id": pa.array(qids, pa.string()),
        "doc_id": pa.array(all_docs, pa.int64()),
    })


def _judgment_index(judgments) -> dict[str, np.ndarray]:
    """qrels table -> {query_id: sorted unique doc_id array}."""
    if hasattr(judgments, "to_arrow_refs"):  # ray.data.Dataset
        import ray

        parts = [ray.get(r) for r in judgments.to_arrow_refs()]
        judgments = pa.concat_tables([p for p in parts if p.num_rows])
    if isinstance(judgments, pd.DataFrame):
        judgments = pa.Table.from_pandas(judgments)
    qid = np.asarray(judgments["query_id"].to_pylist(), dtype=object)
    did = judgments["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    out: dict[str, np.ndarray] = {}
    for q in np.unique(qid):
        out[str(q)] = np.unique(did[qid == q])
    return out


def quality_benchmark(index_dir: str, queries: list[tuple[str, str]],
                      judgments, k: int = 10, *, concurrency: int = 4,
                      dtype=np.float64, mrr_max_rank: int | None = None,
                      batch_size: int = 16) -> pa.Table:
    """Run a judged query set and return one metrics row per query.

    queries: [(query_id, query_string)] — query strings must be unique
    (they key the result join back to ids, as the reference keys on the
    QualityQuery). judgments: table/DataFrame/Dataset of binary-relevant
    (query_id, doc_id) pairs. Returns a pa.Table sorted by query_id.
    """
    import ray

    qmap = {q: qid for qid, q in queries}
    if len(qmap) != len(queries):
        raise ValueError("query strings must be unique")
    rel = _judgment_index(judgments)
    rel_ref = ray.put(rel)
    qmap_ref = ray.put(qmap)

    results = batch_search(
        index_dir, [q for _, q in queries], k=k, dtype=dtype,
        concurrency=concurrency, batch_size=batch_size,
    )

    def mark(t: pa.Table) -> pa.Table:
        relmap = ray.get(rel_ref)
        qm = ray.get(qmap_ref)
        qs = t["query"].to_pylist()
        docs = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        qids = [qm[q] for q in qs]
        isrel = np.zeros(len(docs), dtype=bool)
        for q in set(qids):
            sel = np.fromiter((x == q for x in qids), bool, len(qids))
            judged = relmap.get(q)
            if judged is not None and len(judged):
                idx = np.searchsorted(judged, docs[sel])
                idx = np.minimum(idx, len(judged) - 1)
                isrel[sel] = judged[idx] == docs[sel]
        return pa.table({
            "query_id": pa.array(qids, pa.string()),
            "rank": t["rank"].cast(pa.int64()),
            "relevant": pa.array(isrel),
        })

    marked = results.map_batches(mark, batch_format="pyarrow")

    num_rel = {qid: len(rel.get(qid, ())) for qid, _ in queries}

    def metrics(g: pd.DataFrame) -> pd.DataFrame:
        qid = g["query_id"].iloc[0]
        order = np.argsort(g["rank"].to_numpy())
        r = g["relevant"].to_numpy()[order]
        ranks = g["rank"].to_numpy()[order].astype(np.float64)
        nrel = num_rel.get(qid, 0)
        nrr = int(r.sum())
        hit_ranks = ranks[r]
        cum = np.cumsum(r)[r]  # relevant-seen at each relevant hit
        mrr = 0.0
        if len(hit_ranks):
            first = hit_ranks[0]
            if mrr_max_rank is None or first <= mrr_max_rank:
                mrr = 1.0 / first
        ap = float((cum / hit_ranks).sum() / nrel) if nrel else 0.0
        dcg = float((1.0 / np.log2(hit_ranks + 1.0)).sum())
        ideal = np.arange(1, min(nrel, k) + 1, dtype=np.float64)
        idcg = float((1.0 / np.log2(ideal + 1.0)).sum())
        return pd.DataFrame({
            "query_id": [qid],
            "num_rel": np.int64(nrel),
            "num_rel_ret": np.int64(nrr),
            "precision_at_k": [nrr / k],
            "recall": [nrr / nrel if nrel else 0.0],
            "mrr": [mrr],
            "ap": [ap],
            "ndcg": [dcg / idcg if idcg else 0.0],
        })

    per_query = marked.groupby("query_id").map_groups(
        metrics, batch_format="pandas"
    )
    parts = [ray.get(r) for r in per_query.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    t = pa.concat_tables(parts) if parts else pa.table({
        "query_id": pa.array([], pa.string()),
        "num_rel": pa.array([], pa.int64()),
        "num_rel_ret": pa.array([], pa.int64()),
        "precision_at_k": pa.array([], pa.float64()),
        "recall": pa.array([], pa.float64()),
        "mrr": pa.array([], pa.float64()),
        "ap": pa.array([], pa.float64()),
        "ndcg": pa.array([], pa.float64()),
    })
    # queries that retrieved nothing produce no group: emit zero rows
    seen = set(t["query_id"].to_pylist())
    missing = [qid for qid, _ in queries if qid not in seen]
    if missing:
        zero = pa.table({
            "query_id": pa.array(missing, pa.string()),
            "num_rel": pa.array([num_rel.get(m, 0) for m in missing],
                                pa.int64()),
            "num_rel_ret": pa.array([0] * len(missing), pa.int64()),
            "precision_at_k": pa.array([0.0] * len(missing)),
            "recall": pa.array([0.0] * len(missing)),
            "mrr": pa.array([0.0] * len(missing)),
            "ap": pa.array([0.0] * len(missing)),
            "ndcg": pa.array([0.0] * len(missing)),
        })
        t = pa.concat_tables([t.select(zero.column_names), zero])
    else:
        t = t.select(["query_id", "num_rel", "num_rel_ret", "precision_at_k",
                      "recall", "mrr", "ap", "ndcg"])
    order = pa.compute.sort_indices(t, sort_keys=[("query_id", "ascending")])
    return t.take(order)
