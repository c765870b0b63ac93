"""TopicStream / DaemonStream (solr/solrj/.../io/stream/TopicStream.java:66,
DaemonStream.java:42): checkpointed pub-sub over the index and the
background run loop.

TopicStream in the reference returns, per call, the documents matching a
query that are NEW since the stream's stored checkpoint (a per-shard
version watermark persisted in a checkpoint collection). The engine's
equivalent watermark is the GENERATION layout: appends create fresh shard
ids and committed shards are immutable, so "new since last pull" is exactly
"shards whose id the checkpoint has not seen". A pull therefore searches
ONLY the unseen shards — no re-scoring of the already-delivered corpus —
and persists the enlarged shard-id set atomically after delivering.

Semantics carried over: at-least-once delivery (the checkpoint advances
after the rows are produced; a crash between produce and persist re-delivers
that generation), deletes do not retract already-delivered docs, and a
fresh checkpoint starts from the full index (initialCheckpoint = 0 mode).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa


class TopicStream:
    def __init__(self, index_dir: str, query, checkpoint_path: str,
                 dtype=np.float32):
        self.index_dir = index_dir
        self.query = query
        self.checkpoint_path = checkpoint_path
        self.dtype = dtype

    def _seen(self) -> set[int]:
        if not os.path.exists(self.checkpoint_path):
            return set()
        with open(self.checkpoint_path) as f:
            return set(json.load(f)["shard_ids"])

    def pull(self) -> pa.Table:
        """Matching docs from shards appended since the last pull."""
        from ..index.reader import IndexReader
        from .executor import eval_node, resolve_weights
        from .searcher import IndexSearcher

        searcher = IndexSearcher(self.index_dir, dtype=self.dtype)
        reader = searcher.reader
        seen = self._seen()
        new_shards = [s for s in reader.shards if s.shard not in seen]
        node = searcher._node(self.query)
        # stats resolve over the WHOLE index (scores match a full search)
        weights = resolve_weights(reader, node, searcher.params, searcher.dtype)
        parts_d, parts_s = [], []
        for s in new_shards:
            docs, scores = eval_node(s, node, weights, searcher.dtype)
            if len(docs):
                parts_d.append(docs)
                parts_s.append(scores)
        out = pa.table({
            "doc_id": pa.array(
                np.concatenate(parts_d) if parts_d else np.zeros(0, np.int64),
                pa.int64()),
            "score": pa.array(
                np.concatenate(parts_s).astype(np.float64) if parts_s
                else np.zeros(0, np.float64), pa.float64()),
        })
        # checkpoint AFTER producing rows: at-least-once, like the reference
        all_ids = sorted(seen | {s.shard for s in reader.shards})
        tmp = self.checkpoint_path + ".tmp"
        os.makedirs(os.path.dirname(self.checkpoint_path) or ".", exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"shard_ids": all_ids, "ts": time.time()}, f)
        os.replace(tmp, self.checkpoint_path)
        return out


class DaemonStream:
    """DaemonStream.java:42 role: run a stream function on an interval in a
    detached Ray actor; start/stop/stats mirror the daemon admin verbs
    (list/stop via the /stream handler). The wrapped fn runs in the actor
    process — pass a TopicStream.pull or any zero-arg callable returning a
    row count or table."""

    def __init__(self, fn, interval_s: float = 1.0):
        import ray

        # max_concurrency=2: run() occupies one actor thread for the loop's
        # whole life; stop()/stats() need the second (a default single-slot
        # actor would queue them behind run() forever — deadlock)
        @ray.remote(num_cpus=0, max_concurrency=2)
        class _Loop:
            def __init__(self, fn, interval_s):
                self._fn = fn
                self._interval = interval_s
                self._stop = False
                self._runs = 0
                self._errors = 0
                self._last = None

            def run(self):
                while not self._stop:
                    try:
                        out = self._fn()
                        self._last = (out.num_rows
                                      if hasattr(out, "num_rows") else out)
                        self._runs += 1
                    except Exception:  # daemon keeps running (reference logs)
                        self._errors += 1
                    time.sleep(self._interval)
                return self.stats()

            def stop(self):
                self._stop = True

            def stats(self):
                return {"runs": self._runs, "errors": self._errors,
                        "last": self._last, "stopped": self._stop}

        self._actor = _Loop.remote(fn, interval_s)
        self._done = self._actor.run.remote()

    def stats(self) -> dict:
        import ray

        return ray.get(self._actor.stats.remote())

    def stop(self) -> dict:
        """Signal the loop and wait for the final run to finish."""
        import ray

        ray.get(self._actor.stop.remote())
        return ray.get(self._done)
