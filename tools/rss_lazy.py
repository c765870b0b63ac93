"""Measure warm ShardReader RSS with lazy columns vs forced full residency.

Loads the bench index (200k docs, 8 shards) in a fresh process per mode,
runs a term query to warm, and reports peak RSS. 'eager' forces the
positions/impacts columns resident (the pre-round-3 behavior).
"""
import json
import os
import resource
import subprocess
import sys

INDEX = os.environ.get("LSR_RSS_INDEX", "/tmp/lsr_bench_idx_32")
MODE = sys.argv[1] if len(sys.argv) > 1 else ""

if MODE in ("lazy", "eager"):
    from lucene_solr_ray.index.reader import ShardReader
    from lucene_solr_ray.search.searcher import IndexSearcher

    s = IndexSearcher(INDEX)
    if MODE == "eager":
        for sh in s.reader.shards:
            for c in ShardReader._LAZY_COLS:
                sh._lazy_col(c)
    hits = s.search("kato AND mito", k=10)
    rss_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(json.dumps({"mode": MODE, "rss_mb": round(rss_kb / 1024, 1),
                      "nhits": len(hits)}))
    sys.exit(0)

for mode in ("lazy", "eager"):
    out = subprocess.run([sys.executable, __file__, mode],
                         capture_output=True, text=True, cwd="/root/repo")
    print(out.stdout.strip().splitlines()[-1] if out.stdout.strip() else out.stderr[-800:])
