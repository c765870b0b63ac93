"""1M-doc end-to-end stress: build -> append generation -> delete ->
force_merge (encoded path) -> check_index (sampled) -> query parity."""
import json
import os
import shutil
import time

import numpy as np
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.maintenance import (
    append_index, check_index, delete_by_ids, force_merge)
from lucene_solr_ray.pipelines import synthesize_corpus
from lucene_solr_ray.pipelines.flagship import build_corpus_index
from lucene_solr_ray.search import IndexSearcher

out = {}
base = "/tmp/stress1m"
shutil.rmtree(base, ignore_errors=True)
os.makedirs(base)
t0 = time.time()
corp = synthesize_corpus(1_000_000, f"{base}/corpus", n_files=32)
out["synth_s"] = round(time.time() - t0, 1)

t0 = time.time()
idx = f"{base}/idx"
cfg = IndexBuildConfig(num_shards=8, num_buckets=32)
build_corpus_index(sorted(
    os.path.join(corp, f) for f in os.listdir(corp)), idx, cfg=cfg,
    from_html=True)
out["build_s"] = round(time.time() - t0, 1)

t0 = time.time()
app = synthesize_corpus(100_000, f"{base}/app.parquet", seed=777)
# appended docs need doc_ids disjoint from the base 0..999999
import pyarrow.parquet as pq
import pyarrow as pa
t = pq.read_table(app)
ids = t["doc_id"].to_numpy(zero_copy_only=False) + 2_000_000
t = t.set_column(t.column_names.index("doc_id"), "doc_id",
                 pa.array(ids, pa.int64()))
pq.write_table(t, app)
append_index(idx, app, text_col="text")
out["append_s"] = round(time.time() - t0, 1)

t0 = time.time()
rng = np.random.default_rng(3)
dead = rng.choice(1_000_000, size=10_000, replace=False).tolist()
delete_by_ids(idx, dead)
out["delete_s"] = round(time.time() - t0, 1)

t0 = time.time()
from lucene_solr_ray.index.maintenance import atomic_update

alive = [i for i in range(500_000, 502_000) if i not in set(dead)][:1000]
ops = {i: {"text": {"set": f"zzatomic marker {i % 7}"}} for i in alive}
res = atomic_update(idx, sorted(
    os.path.join(corp, f) for f in os.listdir(corp)), ops,
    text_col="text")
assert res["updated"] == len(alive)
out["atomic_update_s"] = round(time.time() - t0, 1)

t0 = time.time()
force_merge(idx)
out["force_merge_s"] = round(time.time() - t0, 1)

t0 = time.time()
rep = check_index(idx, sample_terms=500)
out["check_s"] = round(time.time() - t0, 1)
assert rep["ok"]

s = IndexSearcher(idx)
assert s.reader.doc_count == 1_090_000
for q in ("kato AND mito", '"kato mito"', "kato OR mito OR zubo"):
    a = s.search(q, k=10, use_wand="force")
    b = s.search(q, k=10, use_wand=False)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
    assert a["score"].to_pylist() == b["score"].to_pylist(), q
hits = set(s.search("kato", k=2000, use_wand=False)["doc_id"].to_pylist())
assert not hits & set(dead[:100])
# atomic updates survived the encoded force_merge: the marker term hits
# exactly the updated docs, whose old text no longer matches
amarks = set(s.match_all("zzatomic")["doc_id"].to_pylist())
assert amarks == set(alive), (len(amarks), len(alive))
out["doc_count"] = s.reader.doc_count
print(json.dumps(out))
ray.shutdown()
