"""Deduplication operators for large-scale corpus curation.

Reference anchors: SignatureUpdateProcessorFactory (exact/fuzzy signature
dedup at ingest, solr/core/.../processor/SignatureUpdateProcessorFactory.java:42)
and MinHashFilter (lucene/analysis/common/.../minhash/MinHashFilter.java:47).

All operators are streaming map_batches + one groupby shuffle on the
signature/band key; candidate verification is vectorized. At 100 TB the
shuffle moves only (key, doc_id) pairs — never document text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Min

_M61 = (1 << 61) - 1


def _content_hash(t: pa.Table, text_col: str) -> np.ndarray:
    out = np.empty(len(t), dtype=np.uint64)
    for i, s in enumerate(t[text_col].to_pylist()):
        h = hashlib.blake2b((s or "").encode(), digest_size=8).digest()
        out[i] = int.from_bytes(h, "little")
    return out


def dedup_exact(ds: Dataset, key_col: str, text_col: str) -> Dataset:
    """Exact dedup: content hash -> hash-partitioned groupby -> keep the
    lowest doc id per hash. Returns (key_col) rows of the winners.

    Shuffle moves one (hash, id) row per doc; the min-reduction replaces a
    map_groups first() so no group is ever materialized."""

    def add_hash(t: pa.Table) -> pa.Table:
        return pa.table(
            {"sig": pa.array(_content_hash(t, text_col), pa.uint64()),
             key_col: t[key_col]}
        )

    sigs = ds.map_batches(add_hash, batch_format="pyarrow")
    winners = sigs.groupby("sig").aggregate(Min(key_col, alias_name=key_col))
    return winners.select_columns([key_col])


# --- MinHash + LSH ---------------------------------------------------------

def _minhash_batch(texts: list[str], num_hashes: int, shingle_k: int, seed: int) -> np.ndarray:
    """(n_docs, num_hashes) uint64 minhash signatures over word shingles."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _M61, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, _M61, size=num_hashes, dtype=np.uint64)
    out = np.full((len(texts), num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
    for i, text in enumerate(texts):
        ws = (text or "").split(" ")
        if len(ws) < shingle_k:
            sh = {" ".join(ws)}
        else:
            sh = {" ".join(ws[j:j + shingle_k]) for j in range(len(ws) - shingle_k + 1)}
        if not sh:
            continue
        hv = np.array(
            [int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
             for s in sh],
            dtype=np.uint64,
        )
        # one universal-hash pass per shingle set, vectorized over hashes
        prod = (hv[:, None] * a[None, :] + b[None, :]) % _M61
        out[i] = prod.min(axis=0)
    return out


def minhash_signatures(
    ds: Dataset, key_col: str, text_col: str,
    num_hashes: int = 64, shingle_k: int = 3, seed: int = 42,
) -> Dataset:
    """MinHashFilter as a map_batches stage: doc -> uint64[num_hashes]."""

    def f(t: pa.Table) -> pa.Table:
        sig = _minhash_batch(t[text_col].to_pylist(), num_hashes, shingle_k, seed)
        return pa.table(
            {key_col: t[key_col],
             "minhash": pa.FixedSizeListArray.from_arrays(
                 pa.array(sig.ravel(), pa.uint64()), num_hashes)}
        )

    return ds.map_batches(f, batch_format="pyarrow")


def dedup_minhash_lsh(
    ds: Dataset, key_col: str, text_col: str,
    num_hashes: int = 64, bands: int = 16, shingle_k: int = 3, seed: int = 42,
) -> Dataset:
    """Near-dup candidate pairs via banded LSH: shingle -> minhash -> band
    buckets -> groupby(band_id, band_hash) -> intra-bucket pairs.

    Returns (left, right) candidate id pairs (left < right). The shuffle key
    is the band bucket; text never moves."""
    rows = num_hashes // bands

    def band_rows(t: pa.Table) -> pa.Table:
        sig = _minhash_batch(t[text_col].to_pylist(), num_hashes, shingle_k, seed)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        n = len(keys)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        doc_rep = np.repeat(keys, bands)
        bh = np.empty(n * bands, dtype=np.uint64)
        view = sig.reshape(n, bands, rows)
        # mix the band's rows into one 64-bit bucket hash
        mix = view.astype(np.uint64)
        h = np.zeros((n, bands), dtype=np.uint64)
        for r in range(rows):
            h = (h * np.uint64(1099511628211)) ^ mix[:, :, r]
        bh = h.ravel()
        return pa.table(
            {"band": pa.array(band_ids), "bh": pa.array(bh, pa.uint64()),
             key_col: pa.array(doc_rep)}
        )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(df[key_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"left": [], "right": []}).astype(np.int64)
        li, ri = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"left": ids[li], "right": ids[ri]})

    cand = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "bh"])
        .map_groups(pairs, batch_format="pandas")
    )
    # dedup pairs discovered in multiple bands
    return cand.groupby(["left", "right"]).aggregate(Count(alias_name="__n")).select_columns(["left", "right"])


# --- SimHash ---------------------------------------------------------------

def simhash_signatures(ds: Dataset, key_col: str, text_col: str, seed: int = 42) -> Dataset:
    """64-bit SimHash over tokens: sign of per-bit weighted sums."""

    def f(t: pa.Table) -> pa.Table:
        sigs = np.zeros(len(t), dtype=np.uint64)
        for i, text in enumerate(t[text_col].to_pylist()):
            ws = (text or "").split(" ")
            if not ws:
                continue
            hv = np.array(
                [int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
                 for w in ws],
                dtype=np.uint64,
            )
            bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
            v = (2 * bits - 1).sum(axis=0)
            sigs[i] = np.packbits((v > 0).astype(np.uint8)[::-1]).view(">u8")[0]
        return pa.table({key_col: t[key_col], "simhash": pa.array(sigs, pa.uint64())})

    return ds.map_batches(f, batch_format="pyarrow")


# --- n-gram Jaccard verification ------------------------------------------

def ngram_jaccard_pairs(
    ds: Dataset, pairs: Dataset, key_col: str, text_col: str,
    shingle_k: int = 3, threshold: float = 0.5,
) -> pa.Table:
    """Verify candidate pairs with exact shingle Jaccard.

    The candidate set is small relative to the corpus (LSH output); texts for
    the involved ids are fetched once and broadcast to the verify stage."""
    pair_df = pairs.to_pandas()
    if not len(pair_df):
        return pa.table(
            {"left": pa.array([], pa.int64()), "right": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    ids = np.unique(np.concatenate([pair_df["left"].values, pair_df["right"].values]))
    import ray

    id_ref = ray.put(ids)

    def keep(t: pa.Table) -> pa.Table:
        wanted = ray.get(id_ref)
        m = np.isin(t[key_col].to_numpy(zero_copy_only=False), wanted)
        return t.select([key_col, text_col]).filter(pa.array(m))

    texts = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    lookup = dict(zip(texts[key_col], texts[text_col]))

    def shingles(s):
        ws = (s or "").split(" ")
        if len(ws) < shingle_k:
            return {" ".join(ws)}
        return {" ".join(ws[j:j + shingle_k]) for j in range(len(ws) - shingle_k + 1)}

    out = {"left": [], "right": [], "jaccard": []}
    for l, r in zip(pair_df["left"], pair_df["right"]):
        a, b = shingles(lookup.get(l)), shingles(lookup.get(r))
        j = len(a & b) / max(1, len(a | b))
        if j >= threshold:
            out["left"].append(int(l))
            out["right"].append(int(r))
            out["jaccard"].append(float(j))
    return pa.table(
        {"left": pa.array(out["left"], pa.int64()),
         "right": pa.array(out["right"], pa.int64()),
         "jaccard": pa.array(out["jaccard"], pa.float64())}
    )


# --- embedding cosine near-dup --------------------------------------------

def embedding_dup_pairs(
    ds: Dataset, key_col: str, vec_col: str, threshold: float = 0.95,
    block: int = 2048,
) -> Dataset:
    """Embedding-cosine near-dup pairs above threshold.

    v0 strategy: normalize vectors per batch, broadcast the (small) full
    normalized matrix once, and scan it batch-wise (matmul per batch). The
    scale path replaces the broadcast matrix with LSH bucketing
    (random-hyperplane signs -> groupby bucket), same candidate/verify shape
    as dedup_minhash_lsh."""
    import ray

    mats = []
    keys = []
    for t in ds.select_columns([key_col, vec_col]).iter_batches(batch_format="pyarrow", batch_size=4096):
        m = np.asarray(t[vec_col].to_pylist(), dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        mats.append(m)
        keys.append(t[key_col].to_numpy(zero_copy_only=False))
    full = np.vstack(mats)
    all_keys = np.concatenate(keys)
    order = np.argsort(all_keys)
    full = full[order]
    all_keys = all_keys[order]
    ref = ray.put((all_keys, full))

    import ray.data as rd

    n = len(all_keys)
    starts = list(range(0, n, block))

    def scan(b: dict) -> pa.Table:
        ks, m = ray.get(ref)
        lo = int(b["start"][0])
        hi = min(lo + block, len(ks))
        sims = m[lo:hi] @ m.T
        li, ri = np.nonzero(sims >= threshold)
        gl = ks[lo + li]
        gr = ks[ri]
        keep = gl < gr
        return pa.table(
            {"left": pa.array(gl[keep], pa.int64()),
             "right": pa.array(gr[keep], pa.int64()),
             "cosine": pa.array(sims[li, ri][keep], pa.float64())}
        )

    return rd.from_items([{"start": s} for s in starts]).map_batches(
        scan, batch_size=1, batch_format="numpy"
    )
