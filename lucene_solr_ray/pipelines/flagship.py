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


def dedup_recrawls(corpus_paths, out_dir: str, id_col: str = "doc_id",
                   num_partitions: int | None = None) -> list[str]:
    """Update-by-key semantics (SURVEY.md §2.14): among re-crawls of the same
    url keep only the newest warc_ts (version max-wins, the reference's
    optimistic-concurrency rule; ties break to the highest id for
    determinism). Output is a parquet dir consumed by build_index.

    Scale shape: only (url, ts, id) rows enter the exchanges — a Max
    reduction picks the newest ts per url, an inner join + Max picks the
    winning id, and a left_semi hash join attaches the winners back to the
    full pages. The html/text bodies never ride a shuffle, mirroring how
    the reference routes updates by id, never by document body
    (DistributedUpdateProcessor.java:75)."""
    import ray
    import ray.data
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max

    from ..relational.ops import scaled_partitions

    if num_partitions is None:
        # row count from parquet metadata only — no data read
        n = ray.data.read_parquet(corpus_paths, columns=["url"]).count()
        num_partitions = scaled_partitions(n)

    def key_cols(t: pa.Table) -> pa.Table:
        # timestamps reduce as int64 epoch ticks (Max over timestamp
        # columns is not supported by the arrow aggregate path); null
        # warc_ts (read_warc emits them for unparseable WARC-Date) sinks
        # to int64 min so it always loses, and join keys stay non-null
        ts = pc.fill_null(pc.cast(t["warc_ts"], pa.int64()),
                          -(2 ** 62))
        return pa.table({
            "url": t["url"],
            "__ts": ts,
            id_col: t[id_col],
        })

    ids = ray.data.read_parquet(
        corpus_paths, columns=["url", "warc_ts", id_col]
    ).map_batches(key_cols, batch_format="pyarrow").materialize()

    # a join asked for more partitions than the small side has rows can
    # hand an aggregator a schema-less empty partition (Ray 2.49 hash-join
    # failure mode) — clamp to the aggregated side's size
    newest = ids.groupby("url").aggregate(
        Max("__ts", alias_name="__ts")).materialize()
    p1 = max(1, min(num_partitions, newest.count()))
    # winners carry (url, id): the semi join below keys on BOTH, so a
    # doc_id appearing under two different urls cannot smuggle the losing
    # url's rows through just because the id won elsewhere
    winners = (
        ids.join(newest, join_type="inner", on=("url", "__ts"),
                 num_partitions=p1)
        .groupby("url").aggregate(Max(id_col, alias_name=id_col))
        .select_columns(["url", id_col])
    ).materialize()
    p2 = max(1, min(num_partitions, winners.count()))
    ds = ray.data.read_parquet(corpus_paths)
    out = ds.join(winners, join_type="left_semi", on=("url", id_col),
                  num_partitions=p2)
    # the same physical row ingested twice (same url/ts/id — a re-read
    # WARC) survives the semi join in BOTH copies; collapse exact copies
    # per (url, id). The key-only count finds affected rows cheaply; the
    # full-row group pass runs ONLY over that (normally empty) subset, so
    # page bodies still stay out of the shuffle on the clean path
    dup_ids = (
        ids.join(winners, join_type="left_semi", on=("url", id_col),
                 num_partitions=p2)
        .groupby(["url", id_col]).aggregate(Count(alias_name="__n"))
        .filter(expr="__n > 1").select_columns(["url", id_col])
    ).materialize()
    n_dup = dup_ids.count()
    if n_dup > 0:
        p3 = max(1, min(num_partitions, n_dup))
        dup_rows = out.join(dup_ids, join_type="left_semi",
                            on=("url", id_col), num_partitions=p3)
        uniq_rows = out.join(dup_ids, join_type="left_anti",
                             on=("url", id_col), num_partitions=p3)

        def newest_row(df):
            # deterministic winner: max warc_ts (nulls lose), then stable
            # order — NOT head(1), which could keep a stale same-id row
            return df.sort_values("warc_ts", na_position="first",
                                  kind="mergesort").tail(1)

        out = uniq_rows.union(
            dup_rows.groupby(["url", id_col]).map_groups(
                newest_row, batch_format="pandas"))
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
