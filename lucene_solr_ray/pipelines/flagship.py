"""Flagship pipeline: Common-Crawl-style pages -> index -> BM25 top-k.

read_parquet(corpus) -> map_batches(html extract + StandardAnalyzer +
postings explode, actor pool) -> groupby merge shuffle -> sharded segment
parquet -> actor-pool searchers -> top-k per query — the full arc of the
north rule over the input_hint schema.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..index import IndexBuildConfig, build_index
from ..search import IndexSearcher

# query shapes follow the reference workloads (benchmark/conf/query-terms.txt:
# terms, AND pairs, OR pairs, quoted phrases)
DEFAULT_QUERIES = [
    "ka",
    "tomi",
    "kato AND mito",
    "kato OR mito OR rato",
    '"ka to"',
    "zune AND NOT bolika",
    "(kato AND ne) OR bo",
]


def dedup_recrawls(corpus_paths, out_dir: str) -> list[str]:
    """Update-by-key semantics (SURVEY.md §2.14): among re-crawls of the same
    url keep only the newest warc_ts (version max-wins, the reference's
    optimistic-concurrency rule). groupby(url) shuffle; output is a parquet
    dir consumed by build_index."""
    import ray.data

    ds = ray.data.read_parquet(corpus_paths)

    def newest(df):
        return df.sort_values("warc_ts", kind="mergesort").tail(1)

    out = ds.groupby("url").map_groups(newest, batch_format="pandas")
    out.write_parquet(out_dir, mode="overwrite")
    import glob

    return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))


def build_corpus_index(
    corpus_path: str,
    index_dir: str,
    cfg: IndexBuildConfig | None = None,
    from_html: bool = True,
) -> dict:
    cfg = cfg or IndexBuildConfig()
    if from_html:
        cfg.html_col = "html"
    return build_index(
        corpus_path, index_dir, key_col="doc_id", text_col="text", cfg=cfg
    )


def run_queries(index_dir: str, queries: list[str] | None = None, k: int = 10) -> pa.Table:
    """Run the query set; returns one row per (query, rank)."""
    searcher = IndexSearcher(index_dir)
    queries = queries or DEFAULT_QUERIES
    out = {"query": [], "rank": [], "doc_id": [], "score": []}
    for q in queries:
        res = searcher.search(q, k=k)
        n = res.num_rows
        out["query"].extend([q] * n)
        out["rank"].extend(res["rank"].to_pylist())
        out["doc_id"].extend(res["doc_id"].to_pylist())
        out["score"].extend(res["score"].to_pylist())
    return pa.table(
        {
            "query": pa.array(out["query"], pa.string()),
            "rank": pa.array(out["rank"], pa.int32()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "score": pa.array(out["score"], pa.float64()),
        }
    )
