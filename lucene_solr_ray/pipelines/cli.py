"""CLI entry points (the `ray job submit` surface of the north rule).

  python -m lucene_solr_ray.pipelines.cli build  --corpus DIR_OR_GLOB --index-dir DIR
  python -m lucene_solr_ray.pipelines.cli search --index-dir DIR --query "a AND b" [-k 10]
  python -m lucene_solr_ray.pipelines.cli append --corpus ... --index-dir DIR
  python -m lucene_solr_ray.pipelines.cli check  --index-dir DIR
  python -m lucene_solr_ray.pipelines.cli bench  (delegates to bench.py semantics)

Only this CLI owns the Ray session (guarded init); library code never calls
ray.init.
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def _init_ray() -> bool:
    """Init Ray if this process doesn't have a session; returns True when we
    own it (and should shut it down)."""
    import ray

    if ray.is_initialized():
        return False
    ray.init(
        address=os.environ.get("RAY_ADDRESS", "local"),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    return True


def _paths(spec: str, ext: str = "parquet") -> list[str]:
    if os.path.isdir(spec):
        return sorted(glob.glob(os.path.join(spec, f"*.{ext}")))
    out = sorted(glob.glob(spec))
    return out or [spec]


def _load_corpus(args, stage_dir: str) -> list[str]:
    """Resolve the corpus to parquet file paths, running the Solr-style
    loader + staging step for non-parquet formats."""
    fmt = getattr(args, "format", "parquet")
    if fmt == "parquet":
        return _paths(args.corpus)
    from .sources import (
        read_csv_docs,
        read_json_docs,
        read_line_docs,
        stage_corpus,
    )

    raw = _paths(args.corpus, ext={"json": "json", "csv": "csv",
                                   "line": "txt"}[fmt])
    if fmt == "json":
        ds = read_json_docs(raw, id_field=args.id_field)
    elif fmt == "csv":
        ds = read_csv_docs(raw, id_field=args.id_field)
    else:
        ds = read_line_docs(raw)
    return stage_corpus(ds, stage_dir)


def main(argv=None):
    p = argparse.ArgumentParser(prog="lucene_solr_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index-dir", required=True)
    b.add_argument("--key-col", default="doc_id")
    b.add_argument("--text-col", default="text")
    b.add_argument("--html-col", default=None)
    b.add_argument("--num-shards", type=int, default=8)
    b.add_argument("--num-buckets", type=int, default=32)
    b.add_argument("--format", default="parquet",
                   choices=["parquet", "json", "csv", "line"],
                   help="corpus format; non-parquet loads via the Solr-style"
                        " loaders and stages to parquet first")
    b.add_argument("--id-field", default="id",
                   help="unique-key field for json/csv corpora")
    b.add_argument("--dedup-recrawls", action="store_true",
                   help="keep only the newest warc_ts per url before indexing")
    # analysis-chain config (the Solr schema.xml fieldType role)
    b.add_argument("--stemmer", default=None,
                   help="porter | minimal_english")
    b.add_argument("--stopwords", default=None,
                   help="comma-separated stop words")
    b.add_argument("--protected-words", default=None,
                   help="comma-separated words that skip the stemmer")
    b.add_argument("--token-filters", default=None,
                   help='JSON filter chain, e.g. '
                        '\'["trim", ["length", 2, 64]]\'')
    b.add_argument("--edge-ngram", default=None, metavar="MIN,MAX",
                   help="index leading grams for search-as-you-type")
    b.add_argument("--store-offsets", action="store_true",
                   help="index per-occurrence char offsets "
                        "(postings-offset highlighting)")

    a = sub.add_parser("append")
    a.add_argument("--corpus", required=True)
    a.add_argument("--index-dir", required=True)
    a.add_argument("--format", default="parquet",
                   choices=["parquet", "json", "csv", "line"])
    a.add_argument("--id-field", default="id")

    s = sub.add_parser("search")
    s.add_argument("--index-dir", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--distributed", action="store_true")
    s.add_argument("--parser", choices=["classic", "simple", "surround"],
                   default="classic",
                   help="query syntax: classic (Lucene QueryParser subset), "
                        "simple (lenient SimpleQueryParser), surround "
                        "(nW/nN span operators)")

    c = sub.add_parser("check")
    c.add_argument("--index-dir", required=True)
    c.add_argument("--sample-terms", type=int, default=None)

    e = sub.add_parser("explain")
    e.add_argument("--index-dir", required=True)
    e.add_argument("--query", required=True)
    e.add_argument("--doc", type=int, required=True)
    e.add_argument("--json", action="store_true",
                   help="emit the Explanation tree as JSON")

    d = sub.add_parser("delete")
    d.add_argument("--index-dir", required=True)
    g = d.add_mutually_exclusive_group(required=True)
    g.add_argument("--query", help="delete docs matching this query")
    g.add_argument("--term", help="delete docs containing this exact term")
    g.add_argument("--ids", help="comma-separated doc ids to delete")
    d.add_argument("--merge", action="store_true",
                   help="force-merge afterwards to physically drop the docs")

    args = p.parse_args(argv)
    owns_session = _init_ray()

    if args.cmd == "build":
        from ..index import IndexBuildConfig, build_index

        paths = _load_corpus(args, args.index_dir + ".staged")
        if args.dedup_recrawls:
            from .flagship import dedup_recrawls

            paths = dedup_recrawls(paths, os.path.join(args.index_dir, "deduped"))
        def _csv(v):
            return tuple(x.strip() for x in v.split(",") if x.strip()) \
                if v else ()

        tf = tuple(
            tuple(e) if isinstance(e, list) else e
            for e in json.loads(args.token_filters)
        ) if args.token_filters else ()
        eg = tuple(int(x) for x in args.edge_ngram.split(",")) \
            if args.edge_ngram else ()
        cfg = IndexBuildConfig(
            num_shards=args.num_shards, num_buckets=args.num_buckets,
            html_col=args.html_col,
            stemmer=args.stemmer, stopwords=_csv(args.stopwords),
            protected_words=_csv(args.protected_words),
            token_filters=tf, edge_ngram=eg,
            store_offsets=args.store_offsets,
        )
        m = build_index(paths, args.index_dir, key_col=args.key_col,
                        text_col=args.text_col, cfg=cfg)
        print(json.dumps({"committed": m["committed"], "stats": m["stats"],
                          "metrics": m.get("metrics", {})}))
    elif args.cmd == "append":
        from ..index.maintenance import append_index

        m = append_index(args.index_dir,
                         _load_corpus(args, args.index_dir + ".staged_append"))
        print(json.dumps({"num_shards": m["num_shards"], "stats": m["stats"]}))
    elif args.cmd == "search":
        q = args.query
        if args.parser == "simple":
            from ..search.simple_parser import simple_parse

            q = simple_parse(q)
        elif args.parser == "surround":
            from ..search.surround_parser import surround_parse

            try:
                q = surround_parse(q)
            except ValueError:
                print(json.dumps([]))
                return
        if args.distributed:
            from ..search import DistributedSearcher

            res = DistributedSearcher(args.index_dir).search(q, k=args.k)
        else:
            from ..search import IndexSearcher

            res = IndexSearcher(args.index_dir).search(q, k=args.k)
        print(json.dumps(res.to_pylist()))
    elif args.cmd == "check":
        from ..index.maintenance import check_index

        print(json.dumps(check_index(args.index_dir, args.sample_terms)))
    elif args.cmd == "explain":
        from ..search import IndexSearcher
        from ..search.explain import explain

        ex = explain(IndexSearcher(args.index_dir), args.query, args.doc)
        print(json.dumps(ex.to_dict()) if args.json else str(ex))
    elif args.cmd == "delete":
        from ..index.maintenance import (
            delete_by_ids,
            delete_by_query,
            delete_by_term,
            force_merge,
        )

        if args.ids:
            ids = [int(x) for x in args.ids.split(",") if x.strip()]
            delete_by_ids(args.index_dir, ids)
            n = len(ids)
        elif args.term:
            _, n = delete_by_term(args.index_dir, args.term)
        else:
            _, n = delete_by_query(args.index_dir, args.query)
        if args.merge and n:
            force_merge(args.index_dir)
        from ..index.build import load_manifest

        m = load_manifest(args.index_dir)
        print(json.dumps({"deleted": n, "merged": bool(args.merge and n),
                          "stats": m["stats"]}))

    if owns_session:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    main()
