"""Benchmark decontamination: flag corpus docs that share word n-grams
with an evaluation set.

The standard training-data hygiene step (GPT-3 App. C used 13-gram
overlap, PaLM 8-gram): any document carrying a verbatim n-gram from a
benchmark is flagged (and usually dropped or redacted) before training.

Shape at scale: the benchmark side is SMALL by construction (eval sets
are thousands of rows vs a 10^12-doc corpus), so its n-gram hash set is
collected once, sorted, and broadcast via ray.put — the corpus pass is
one map_batches with a searchsorted membership probe per batch; nothing
shuffles. Gram hashing is the same vectorized factorize + polynomial
token-hash combination minhash uses (dedup/ops.py:_minhash_batch) — no
gram strings are built.

Gram identity matches SQL's string n-grams (split on single space,
space-joined) modulo 64-bit hash collisions — the same premise as
dedup_exact's hash grouping. Docs shorter than n words carry no grams
(mirrors generate_series(1, len-n+1) being empty)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from ..util.polyhash import poly_hash_strings

_B = np.uint64(1099511628211)  # FNV-64 prime, the engine-wide hash base


def _gram_hashes(texts: list, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized word n-gram hashes for a batch of texts.

    Returns (gram_hash uint64 flat array, doc_index int64 per gram).
    Unique tokens are hashed once; a gram's hash is the polynomial
    combination of its n consecutive token hashes."""
    toks = [(t or "").split(" ") for t in texts]
    tlens = np.fromiter((len(x) for x in toks), np.int64, len(toks))
    flat = [w for ws in toks for w in ws]
    if not flat:
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    htok = poly_hash_strings(list(uniques))[codes]

    ends = np.cumsum(tlens)
    starts = ends - tlens
    ngrams_per_doc = np.maximum(tlens - n + 1, 0)
    total = int(ngrams_per_doc.sum())
    if total == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64))
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64),
                        ngrams_per_doc)
    # flat start position of each gram's first token
    gram_starts = (np.arange(total, dtype=np.int64)
                   - np.repeat(np.cumsum(ngrams_per_doc)
                               - ngrams_per_doc, ngrams_per_doc)
                   + np.repeat(starts, ngrams_per_doc))
    with np.errstate(over="ignore"):
        g = np.zeros(total, dtype=np.uint64)
        for j in range(n):
            g = g * _B + htok[gram_starts + j]
    return g, doc_idx


def benchmark_gram_set(bench: Dataset, text_col: str, n: int = 8):
    """Sorted uint64 array of the benchmark's distinct n-gram hashes,
    placed in the object store (ray.put) for broadcast to corpus tasks.
    The benchmark side is small by premise — this is the classic
    broadcast-the-small-side pattern, not a join."""
    parts = []
    for b in bench.select_columns([text_col]).iter_batches(
            batch_format="pyarrow", batch_size=4096):
        g, _ = _gram_hashes(b[text_col].to_pylist(), n)
        parts.append(np.unique(g))
    grams = np.unique(np.concatenate(parts)) if parts else \
        np.empty(0, np.uint64)
    return ray.put(grams)


def decontaminate(
    docs: Dataset, bench: Dataset, id_col: str, text_col: str,
    n: int = 8, min_hits: int = 1,
    batch_size: int = 1024, concurrency: int = 4,
) -> Dataset:
    """(id, contaminated_ngrams, is_contaminated) per corpus doc:
    contaminated_ngrams = count of DISTINCT doc n-grams that appear in
    the benchmark; is_contaminated = count >= min_hits."""
    grams_ref = benchmark_gram_set(bench, text_col, n)

    class Probe:
        def __init__(self):
            self.grams = ray.get(grams_ref)  # sorted uint64, once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            g, di = _gram_hashes(t[text_col].to_pylist(), n)
            # distinct (doc, gram) pairs, then membership probe
            if len(g):
                order = np.lexsort((g, di))
                g, di = g[order], di[order]
                keep = np.ones(len(g), bool)
                keep[1:] = (g[1:] != g[:-1]) | (di[1:] != di[:-1])
                g, di = g[keep], di[keep]
                if len(self.grams):
                    idx = np.searchsorted(self.grams, g) \
                        .clip(0, len(self.grams) - 1)
                    hit = self.grams[idx] == g
                else:
                    hit = np.zeros(len(g), bool)
                counts = np.bincount(di[hit], minlength=len(t)) \
                    .astype(np.int64)
            else:
                counts = np.zeros(len(t), np.int64)
            return pa.table({
                id_col: t[id_col],
                "contaminated_ngrams": pa.array(counts, pa.int64()),
                "is_contaminated": pa.array(counts >= min_hits),
            })

    return docs.select_columns([id_col, text_col]).map_batches(
        Probe, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
