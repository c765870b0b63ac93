"""Deduplication operators for large-scale corpus curation.

Reference anchors: SignatureUpdateProcessorFactory (exact/fuzzy signature
dedup at ingest, solr/core/.../processor/SignatureUpdateProcessorFactory.java:42)
and MinHashFilter (lucene/analysis/common/.../minhash/MinHashFilter.java:47).

All operators are streaming map_batches + one groupby shuffle on the
signature/band key; candidate verification is vectorized. At 100 TB the
shuffle moves only (key, doc_id) pairs — never document text.

Hashing is the vectorized polynomial codepoint hash (util/polyhash):
each unique shingle/token in a batch is hashed once (factorize + one numpy
pass); minhash rows come from a multiply-shift family over that base hash.
The base hash is bit-exactly reproducible in DuckDB SQL, which is what the
driver's value-level oracles for simhash/fingerprint rely on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Min

from ..util.polyhash import poly_hash_strings
from ..util.vectors import vec_matrix

# above this many multi-member LSH bucket keys, the singleton sieve runs as
# a distributed join instead of a driver broadcast (web dup rates make the
# key set O(corpus))
_SIEVE_BROADCAST_GATE = 5_000_000

# below this many (bkey, id) band rows one driver lexsort beats the
# distributed passes' scheduling latency (cost-based plan; the distributed
# path is the 10^12-doc plan)
_DRIVER_LEXSORT_GATE = 2_000_000

_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _ensure_schema(ds: Dataset, schema_table: pa.Table) -> Dataset:
    """Union a typed EMPTY block so a zero-row result still carries its
    schema (a Dataset whose every block was filtered away loses column
    names, which breaks downstream schema checks)."""
    import ray.data as _rd

    return ds.union(_rd.from_arrow(schema_table.schema.empty_table()))


def dedup_exact(ds: Dataset, key_col: str, text_col: str) -> Dataset:
    """Exact dedup: content hash -> hash-partitioned groupby -> keep the
    lowest doc id per hash. Returns (key_col) rows of the winners.

    Shuffle moves one (hash, id) row per doc; the min-reduction replaces a
    map_groups first() so no group is ever materialized."""

    def add_hash(t: pa.Table) -> pa.Table:
        # int64 bit-view: sig is an equality-only group key, and uint64
        # values above 2^63 push Ray's hash shuffle into a pickled-object
        # fallback that breaks downstream joins
        h = poly_hash_strings(t[text_col].to_pylist()).view(np.int64)
        return pa.table(
            {"sig": pa.array(h, pa.int64()), key_col: t[key_col]}
        )

    sigs = ds.map_batches(add_hash, batch_format="pyarrow")
    winners = sigs.groupby("sig").aggregate(Min(key_col, alias_name=key_col))
    return winners.select_columns([key_col])


# --- MinHash + LSH ---------------------------------------------------------

def _shingle_lists(texts: list[str], k: int) -> list[list[str]]:
    """k-word shingles per doc; a doc shorter than k words is one shingle."""
    out = []
    for text in texts:
        ws = (text or "").split(" ")
        if len(ws) < k:
            out.append([" ".join(ws)])
        else:
            out.append([" ".join(ws[j:j + k]) for j in range(len(ws) - k + 1)])
    return out


def _minhash_batch(texts: list[str], num_hashes: int, shingle_k: int, seed: int) -> np.ndarray:
    """(n_docs, num_hashes) uint64 minhash signatures over word shingles.

    Vectorized end to end: unique TOKENS are hashed once (factorize + poly
    hash); a k-shingle's hash is the polynomial combination of its k
    consecutive token hashes (one shifted-add per k over the flat token-hash
    array — no shingle strings are ever built); the multiply-shift family
    h_j(x) = a_j*x + b_j (mod 2^64 wraparound) expands each shingle hash,
    and per-doc minima fall out of one minimum.reduceat. Docs shorter than
    k words contribute one shingle over all their tokens."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _U64_MAX, size=num_hashes, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, _U64_MAX, size=num_hashes, dtype=np.uint64)
    B = np.uint64(1099511628211)

    toks = [(t or "").split(" ") for t in texts]
    tlens = np.fromiter((len(x) for x in toks), np.int64, len(toks))
    flat = [w for ws in toks for w in ws]
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    htok = poly_hash_strings(list(uniques))[codes]

    ends = np.cumsum(tlens)
    starts_tok = ends - tlens
    n_flat = len(htok)

    # windows of k token hashes, doc-boundary aware
    sh_hash_parts = []
    doc_of_sh_parts = []
    long_mask = tlens >= shingle_k
    if long_mask.any() and n_flat:
        n_windows = n_flat - shingle_k + 1
        if n_windows > 0:
            win = htok[:n_windows].copy()
            for j in range(1, shingle_k):
                win = win * B + htok[j:n_windows + j]
            # a window is valid when it does not cross a doc boundary
            doc_idx = np.repeat(np.arange(len(toks)), tlens)
            valid = doc_idx[:n_windows] == doc_idx[shingle_k - 1:n_flat]
            sh_hash_parts.append(win[valid])
            doc_of_sh_parts.append(doc_idx[:n_windows][valid])
    short_idx = np.flatnonzero(~long_mask)
    if len(short_idx):
        short_h = np.empty(len(short_idx), dtype=np.uint64)
        for i, d in enumerate(short_idx):
            h = np.uint64(0)
            for x in htok[starts_tok[d]:ends[d]]:
                h = h * B + x
            short_h[i] = h
        sh_hash_parts.append(short_h)
        doc_of_sh_parts.append(short_idx.astype(np.int64))

    out = np.full((len(texts), num_hashes), np.iinfo(np.uint64).max,
                  dtype=np.uint64)
    if not sh_hash_parts:
        return out
    sh_hash = np.concatenate(sh_hash_parts)
    doc_of_sh = np.concatenate(doc_of_sh_parts)
    order = np.argsort(doc_of_sh, kind="stable")
    sh_hash = sh_hash[order]
    doc_of_sh = doc_of_sh[order]
    # hash only the UNIQUE shingle hashes through the family, then gather
    uniq_h, inv = np.unique(sh_hash, return_inverse=True)
    prod = uniq_h[:, None] * a[None, :] + b[None, :]
    present, sh_starts = np.unique(doc_of_sh, return_index=True)
    out[present] = np.minimum.reduceat(prod[inv], sh_starts, axis=0)
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
    max_bucket: int = 512,
) -> Dataset:
    """Near-dup candidate pairs via banded LSH: shingle -> minhash -> band
    buckets -> groupby(band_id, band_hash) -> intra-bucket pairs.

    Returns (left_id, right_id) candidate pairs (left < right). The shuffle
    key is the band bucket; text never moves. Buckets larger than max_bucket
    (degenerate content: empty docs, boilerplate) would explode O(n^2) pairs,
    so they are dropped with a warning — callers needing those need an exact
    per-bucket pass instead."""
    rows = num_hashes // bands

    def band_rows(t: pa.Table) -> pa.Table:
        sig = _minhash_batch(t[text_col].to_pylist(), num_hashes, shingle_k, seed)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        n = len(keys)
        doc_rep = np.repeat(keys, bands)
        view = sig.reshape(n, bands, rows)
        # mix the band's rows + band id into ONE 64-bit bucket key: a single
        # groupby column is far cheaper to shuffle/aggregate than (band, bh)
        base = (np.arange(bands, dtype=np.uint64) + np.uint64(1)) * np.uint64(
            0x9E3779B97F4A7C15
        )
        h = np.broadcast_to(base, (n, bands)).copy()
        for r in range(rows):
            h = (h * np.uint64(1099511628211)) ^ view[:, :, r]
        return pa.table(
            {"bkey": pa.array(h.ravel(), pa.uint64()),
             key_col: pa.array(doc_rep)}
        )

    # Pass 1: vectorized bucket-size count. Nearly every bucket is a
    # singleton, so running per-group Python over all of them (the naive
    # groupby().map_groups) costs millions of empty pandas calls; instead
    # the multi-member bucket KEYS (bounded by the duplicate clusters) are
    # collected, and only their rows take the pair-expansion path.
    band = ds.map_batches(band_rows, batch_format="pyarrow").materialize()

    # cost-based plan: below the driver threshold the whole (bkey, id) table
    # is two small columns — one lexsort beats several Ray passes' scheduling
    # latency. The distributed path is the 10^12-doc plan.
    if band.count() <= _DRIVER_LEXSORT_GATE:
        pdf = band.to_pandas()
        bk = pdf["bkey"].to_numpy().astype(np.uint64)
        ids = pdf[key_col].to_numpy()
        order = np.lexsort((ids, bk))
        bk, ids = bk[order], ids[order]
        brk = np.empty(len(bk), dtype=bool)
        out_l: list = []
        out_r: list = []
        if len(bk):
            brk[0] = True
            brk[1:] = bk[1:] != bk[:-1]
            starts = np.flatnonzero(brk)
            lens = np.diff(np.append(starts, len(bk)))
            dropped = 0
            for s, ln in zip(starts[lens > 1], lens[lens > 1]):
                if ln > max_bucket:
                    dropped += 1
                    continue
                grp = ids[s:s + ln]
                li, ri = np.triu_indices(ln, k=1)
                out_l.append(grp[li])
                out_r.append(grp[ri])
            if dropped:
                import logging

                logging.getLogger(__name__).warning(
                    "%d LSH buckets exceeded max_bucket=%d; dropped",
                    dropped, max_bucket,
                )
        import ray.data as _rd

        if not out_l:
            return _rd.from_arrow(pa.table({
                "left_id": pa.array([], pa.int64()),
                "right_id": pa.array([], pa.int64()),
            }))
        pair_mat = np.unique(
            np.stack([np.concatenate(out_l).astype(np.int64),
                      np.concatenate(out_r).astype(np.int64)], axis=1),
            axis=0,
        )
        return _rd.from_arrow(pa.table({
            "left_id": pa.array(pair_mat[:, 0], pa.int64()),
            "right_id": pa.array(pair_mat[:, 1], pa.int64()),
        }))
    sizes = band.groupby("bkey").aggregate(Count(alias_name="n"))

    def keep_multi(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        over = n > max_bucket
        if over.any():
            import logging

            logging.getLogger(__name__).warning(
                "%d LSH buckets exceed max_bucket=%d (largest %d); dropping "
                "them — run an exact pass on those ids if needed",
                int(over.sum()), max_bucket, int(n.max()),
            )
        kept = t.filter(pa.array((n > 1) & ~over))
        # the hash-shuffle aggregate emits uint64 keys as pickled-object
        # extension arrays; rebuild a plain uint64 column so the join path
        # can match band's bkey dtype
        bk = np.asarray(kept["bkey"].to_pylist(), dtype=np.uint64)
        return pa.table({"bkey": pa.array(bk, pa.uint64())})

    multi_ds = sizes.map_batches(keep_multi, batch_format="pyarrow").materialize()
    n_multi = multi_ds.count()
    empty = pa.table({"left_id": pa.array([], pa.int64()),
                      "right_id": pa.array([], pa.int64())})
    import ray.data as _rd

    if not n_multi:
        return _rd.from_arrow(empty)
    if n_multi <= _SIEVE_BROADCAST_GATE:
        # broadcast sieve: one ray.put of the multi-bucket keys, read once
        # per task — cheapest way to drop the singleton majority pre-shuffle
        multi = multi_ds.to_pandas()
        wanted = np.sort(multi["bkey"].to_numpy().astype(np.uint64))
        w_ref = ray.put(wanted)

        def sieve(t: pa.Table) -> pa.Table:
            w = ray.get(w_ref)
            v = t["bkey"].to_numpy(zero_copy_only=False)
            idx = np.minimum(np.searchsorted(w, v), len(w) - 1)
            return t.filter(pa.array(w[idx] == v))

        sieved = band.map_batches(sieve, batch_format="pyarrow")
    else:
        # web-scale dup rates: multi-bucket keys are themselves O(corpus),
        # too big for a driver array — sieve with a distributed hash join
        # on the bucket key instead (both sides shuffle on bkey; no driver
        # materialization at any duplication rate)
        sieved = band.join(multi_ds, join_type="inner", on=("bkey",),
                           num_partitions=max(16, n_multi // 2_000_000))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(df[key_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"left_id": pd.Series([], dtype=np.int64),
                                 "right_id": pd.Series([], dtype=np.int64)})
        li, ri = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"left_id": ids[li], "right_id": ids[ri]})

    cand = sieved.groupby("bkey").map_groups(pairs, batch_format="pandas")
    # dedup pairs discovered in multiple bands
    return _ensure_schema(
        cand.groupby(["left_id", "right_id"])
        .aggregate(Count(alias_name="__n"))
        .select_columns(["left_id", "right_id"]),
        empty,
    )


# --- n-gram Jaccard verification ------------------------------------------

def _shingle_set(s: str | None, k: int) -> set:
    ws = (s or "").split(" ")
    if len(ws) < k:
        return {" ".join(ws)}
    return {" ".join(ws[j:j + k]) for j in range(len(ws) - k + 1)}


def _seg_unique_counts(h: np.ndarray, seg: np.ndarray, n: int):
    """Per-segment distinct-value counts from one lexsort pass:
    (counts[n], distinct hashes, their segment ids)."""
    order = np.lexsort((h, seg))
    hs, ss = h[order], seg[order]
    first = np.ones(len(hs), dtype=bool)
    if len(hs) > 1:
        first[1:] = (hs[1:] != hs[:-1]) | (ss[1:] != ss[:-1])
    return np.bincount(ss[first], minlength=n), hs[first], ss[first]


def _jaccard_hashed(l_texts: list, r_texts: list, k: int) -> np.ndarray:
    """Shingle Jaccard per (left, right) pair with no Python set building:
    shingles hash to uint64 (the engine-wide poly hash), per-pair distinct
    counts come from one lexsort pass per side, and
    |A∩B| = |A|+|B|-|A∪B| from a third pass over the concatenated distinct
    hashes. O(S log S) numpy over the whole batch, no row loop.

    Distinctness is over the 64-bit HASHES, not the shingle strings: a
    hash collision within one document's shingle set (probability
    ~ m^2 / 2^65 per doc, m = shingles per doc — astronomically rare but
    nonzero at corpus scale) can change a pair's intersection/union by 1
    and flip a verdict sitting exactly on the threshold. Callers needing
    collision-free verdicts for borderline pairs should re-verify pairs
    within epsilon of the threshold with exact sets."""
    n = len(l_texts)
    if not n:
        return np.empty(0, np.float64)
    la = _shingle_lists(l_texts, k)
    lb = _shingle_lists(r_texts, k)
    lens_a = np.fromiter((len(x) for x in la), np.int64, n)
    lens_b = np.fromiter((len(x) for x in lb), np.int64, n)
    ha = poly_hash_strings([s for x in la for s in x])
    hb = poly_hash_strings([s for x in lb for s in x])
    sa = np.repeat(np.arange(n), lens_a)
    sb = np.repeat(np.arange(n), lens_b)
    ca, ua_h, ua_s = _seg_unique_counts(ha, sa, n)
    cb, ub_h, ub_s = _seg_unique_counts(hb, sb, n)
    cu, _, _ = _seg_unique_counts(np.concatenate([ua_h, ub_h]),
                                  np.concatenate([ua_s, ub_s]), n)
    inter = ca + cb - cu
    return inter / np.maximum(cu, 1).astype(np.float64)


def ngram_jaccard_pairs(
    ds: Dataset, pairs: Dataset, key_col: str, text_col: str,
    shingle_k: int = 3, threshold: float = 0.5,
    num_partitions: int | None = None,
) -> Dataset:
    """Verify candidate pairs with exact shingle Jaccard, fully distributed.

    Two hash-partitioned joins attach each side's text to the pair rows,
    then a map_batches stage computes the exact Jaccard per pair. Nothing
    lands on the driver: web corpora run 30-50% duplicates, so the candidate
    id set is O(corpus) and any driver-side text dictionary would OOM. The
    reference runs dedup entirely inside the update chain for the same
    reason (SignatureUpdateProcessorFactory.java:42)."""
    import ray as _ray

    empty = pa.table({"left_id": pa.array([], pa.int64()),
                      "right_id": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    ncpu = int(_ray.cluster_resources().get("CPU", 4))
    # partition count scales with the candidate-pair volume: each hash-join
    # partition costs a fixed aggregator spin-up, so a small candidate set
    # over-partitioned at ncpu wastes seconds of pure overhead (the pair
    # table is two int64 columns — materializing it to learn its size is
    # cheap and object-store-distributed)
    if num_partitions is None:
        pairs = pairs.materialize()
        nparts = int(min(max(2, pairs.count() // 25_000 + 2), max(8, ncpu)))
    else:
        nparts = num_partitions

    texts = ds.select_columns([key_col, text_col])

    def rename(side: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({f"__{side}_key": t[key_col],
                             f"__{side}_text": t[text_col]})
        return f

    lt = texts.map_batches(rename("l"), batch_format="pyarrow")
    rt = texts.map_batches(rename("r"), batch_format="pyarrow")
    j = pairs.select_columns(["left_id", "right_id"]).join(
        lt, join_type="inner", num_partitions=nparts,
        on=("left_id",), right_on=("__l_key",),
    ).join(
        rt, join_type="inner", num_partitions=nparts,
        on=("right_id",), right_on=("__r_key",),
    )

    def verify(t: pa.Table) -> pa.Table:
        li = t["left_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ri = t["right_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        jac = _jaccard_hashed(t["__l_text"].to_pylist(),
                              t["__r_text"].to_pylist(), shingle_k)
        m = jac >= threshold
        return pa.table(
            {"left_id": pa.array(li[m], pa.int64()),
             "right_id": pa.array(ri[m], pa.int64()),
             "jaccard": pa.array(jac[m], pa.float64())}
        )

    return _ensure_schema(j.map_batches(verify, batch_format="pyarrow"), empty)


def dedup_minhash_verified(
    ds: Dataset, key_col: str, text_col: str, threshold: float = 0.8,
    num_hashes: int = 32, bands: int = 16, shingle_k: int = 3, seed: int = 42,
) -> Dataset:
    """Near-dup pairs at an exact-Jaccard threshold: banded-LSH candidates
    verified by true shingle Jaccard (the verify stage removes LSH false
    positives; with rows-per-band=2 the miss probability at J>=0.8 is
    (1-J^2)^bands ~ 1e-7, so the output equals the exhaustive answer and is
    oracle-checked against a full O(n^2) SQL Jaccard at driver scale)."""
    cand = dedup_minhash_lsh(
        ds, key_col, text_col,
        num_hashes=num_hashes, bands=bands, shingle_k=shingle_k, seed=seed,
    )
    return ngram_jaccard_pairs(
        ds, cand, key_col, text_col, shingle_k=shingle_k, threshold=threshold
    )


# --- SimHash ---------------------------------------------------------------

def simhash_signatures(ds: Dataset, key_col: str, text_col: str,
                       bits: int = 62) -> Dataset:
    """SimHash over word tokens: sign of per-bit weighted sums.

    62 bits (not 64) so the signature fits a signed int64 end to end —
    parquet, pandas, and the DuckDB oracle all agree on the dtype. Fully
    vectorized: unique tokens hash once, bit matrix + add.reduceat per doc."""
    shifts = np.arange(bits, dtype=np.uint64)

    def f(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        toks = [(s or "").split(" ") for s in texts]
        lens = np.fromiter((len(x) for x in toks), np.int64, len(toks))
        flat = [w for ws in toks for w in ws]
        codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
        hv = poly_hash_strings(list(uniques))
        bitm = ((hv[codes][:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
        contrib = 2 * bitm - 1
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        v = np.add.reduceat(contrib, starts, axis=0)
        pos = (v > 0).astype(np.uint64)
        sig = (pos << shifts[None, :]).sum(axis=1).astype(np.int64)
        return pa.table({key_col: t[key_col], "simhash": pa.array(sig, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


# --- embedding cosine near-dup --------------------------------------------

def embedding_dup_pairs(
    ds: Dataset, key_col: str, vec_col: str, threshold: float = 0.95,
    num_tables: int = 8, num_planes: int = 8, seed: int = 42,
    max_bucket: int = 4096, round_nd: int = 4,
) -> Dataset:
    """Embedding-cosine near-dup pairs above threshold, scale-safe.

    Random-hyperplane LSH: each vector lands in one bucket per hash table
    (sign bits of num_planes projections); candidate pairs are verified by
    exact cosine INSIDE the per-bucket group, so the only shuffle moves
    (table, bucket, key, vector) rows — nothing is materialized on the
    driver and no O(n^2) scan happens outside a bucket. A pair at cosine c
    collides in one table with p = (1 - arccos(c)/pi)^num_planes; missing
    all tables is (1-p)^num_tables (~1e-2 at c=0.95 per 8-table run; EXACT duplicates collide in every table structurally), and the
    deterministic seed makes the output reproducible for the oracle check.

    Buckets above max_bucket are dropped with a warning (same policy as
    dedup_minhash_lsh)."""
    # per-worker plane memo, keyed on dim: deterministic (fixed seed), built
    # once per worker process instead of regenerated for every batch
    _planes: dict[int, np.ndarray] = {}

    def _planes_for(dim: int) -> np.ndarray:
        if dim not in _planes:
            r = np.random.default_rng(seed)
            _planes[dim] = r.standard_normal((dim, num_tables * num_planes))
        return _planes[dim]

    def sigs(t: pa.Table) -> pa.Table:
        m = vec_matrix(t[vec_col])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        planes = _planes_for(m.shape[1])
        proj = m @ planes > 0
        weights = (1 << np.arange(num_planes, dtype=np.int64))
        keys = t[key_col].to_numpy(zero_copy_only=False)
        n = len(keys)
        tbl_ids = np.repeat(np.arange(num_tables, dtype=np.int32)[None, :], n, axis=0)
        buckets = np.zeros((n, num_tables), dtype=np.int64)
        for ti in range(num_tables):
            bits = proj[:, ti * num_planes:(ti + 1) * num_planes]
            buckets[:, ti] = bits @ weights
        return pa.table(
            {
                "table": pa.array(tbl_ids.ravel(), pa.int32()),
                "bucket": pa.array(buckets.ravel(), pa.int64()),
                key_col: pa.array(np.repeat(keys, num_tables)),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.repeat(m, num_tables, axis=0).ravel(), pa.float64()),
                    m.shape[1],
                ),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "left_id": pd.Series([], dtype=np.int64),
            "right_id": pd.Series([], dtype=np.int64),
            "cosine": pd.Series([], dtype=np.float64),
        })
        n = len(df)
        if n < 2:
            return empty
        if n > max_bucket:
            import logging

            logging.getLogger(__name__).warning(
                "embedding LSH bucket of %d vectors exceeds max_bucket=%d; "
                "dropping", n, max_bucket,
            )
            return empty
        order = np.argsort(df[key_col].to_numpy())
        keys = df[key_col].to_numpy()[order]
        m = np.stack(df["vec"].to_numpy()[order])
        sims = m @ m.T
        li, ri = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame({
            "left_id": keys[li], "right_id": keys[ri],
            "cosine": sims[li, ri],
        })

    cand = (
        ds.select_columns([key_col, vec_col])
        .map_batches(sigs, batch_format="pyarrow")
        .groupby(["table", "bucket"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    # a pair can surface in several tables: keep one row (cosine identical)
    from ray.data.aggregate import Max

    out = cand.groupby(["left_id", "right_id"]).aggregate(
        Max("cosine", alias_name="cosine")
    )

    def rnd(t: pa.Table) -> pa.Table:
        v = t["cosine"].to_numpy(zero_copy_only=False)
        p = 10.0 ** round_nd
        ax = np.abs(v) * p
        fl = np.floor(ax)
        r = (fl + (ax - fl >= 0.5)) / p
        i = t.column_names.index("cosine")
        return t.set_column(i, "cosine", pa.array(np.sign(v) * r, pa.float64()))

    out = out.map_batches(rnd, batch_format="pyarrow")
    return _ensure_schema(out, pa.table({
        "left_id": pa.array([], pa.int64()),
        "right_id": pa.array([], pa.int64()),
        "cosine": pa.array([], pa.float64()),
    }))


def dedup_paragraphs(ds: Dataset, key_col: str, text_col: str,
                     chunk_tokens: int = 5) -> Dataset:
    """Paragraph-level exact dedup (the CCNet / RefinedWeb paragraph-hash
    pass: Wenzek et al. 2020 "CCNet" §3.2, Penedo et al. 2023
    "RefinedWeb" §3.3): documents explode into paragraphs, each paragraph
    hashes once, and only the FIRST occurrence corpus-wide survives
    (lowest (doc, position)). Newline-delimited text splits on '\\n';
    single-line corpora fall back to fixed `chunk_tokens`-token chunks so
    the pass stays meaningful on any input.

    Scale shape: the shuffle moves one (hash, packed doc<<20|idx) row per
    paragraph; winners resolve with a Min reduction — no group is ever
    materialized and text never shuffles (same design as dedup_exact).

    Returns (key_col, para_idx) of the surviving paragraphs."""

    def explode(t: pa.Table) -> pa.Table:
        keys_out, idx_out, paras = [], [], []
        keys = t[key_col].to_pylist()
        for k, s in zip(keys, t[text_col].to_pylist()):
            s = s or ""
            if "\n" in s:
                parts = [p for p in s.split("\n")]
            else:
                toks = s.split(" ")
                parts = [" ".join(toks[i:i + chunk_tokens])
                         for i in range(0, len(toks), chunk_tokens)]
            for i, p in enumerate(parts):
                keys_out.append(k)
                idx_out.append(i)
                paras.append(p)
        # int64 bit-view: grouping needs equality only, and Ray's shuffle
        # boundary computation overflows on uint64 keys above 2^63
        h = poly_hash_strings(paras).view(np.int64)
        packed = (np.asarray(keys_out, dtype=np.int64) << 20) \
            | np.asarray(idx_out, dtype=np.int64)
        return pa.table({
            "sig": pa.array(h, pa.int64()),
            "packed": pa.array(packed, pa.int64()),
        })

    sigs = ds.map_batches(explode, batch_format="pyarrow")
    winners = sigs.groupby("sig").aggregate(Min("packed", alias_name="packed"))

    def unpack(t: pa.Table) -> pa.Table:
        p = t["packed"].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: pa.array(p >> 20, pa.int64()),
            "para_idx": pa.array(p & ((1 << 20) - 1), pa.int64()),
        })

    return winners.map_batches(unpack, batch_format="pyarrow")


# --- duplicated-substring spans (exact substring dedup) --------------------

def duplicate_ngram_spans(ds: Dataset, key_col: str, text_col: str,
                          k: int = 5, min_count: int = 2,
                          num_partitions: int | None = None) -> Dataset:
    """Exact substring-duplication spans, the Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better") ExactSubstr
    role, over word tokens: every maximal run of token positions whose
    k-gram occurs >= min_count times ANYWHERE in the corpus becomes one
    (key, span_start, span_end) row — end exclusive, end = last dup gram
    start + k. The reference's in-engine analogue is the signature dedup
    chain (SignatureUpdateProcessorFactory.java:42); this is its
    finer-grained substring variant.

    Scale shape: the corpus text never rides a shuffle — only
    (gram_hash, key, pos) int64 rows do. Dup grams come from a count
    reduction on the hash; marking is a left_semi hash join back; span
    merging is one segmented numpy pass per hash partition
    (partitioned_window), so Python call count scales with partitions,
    not documents. The suffix array of the paper is replaced by the
    k-gram inverted count — equivalent output for fixed k, and
    shuffle-friendly."""
    from ..relational.ops import partitioned_window, scaled_partitions

    def grams(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        toks: list[str] = []
        lens = np.zeros(len(keys), dtype=np.int64)
        for i, txt in enumerate(t[text_col].to_pylist()):
            ws = (txt or "").split(" ")
            toks.extend(ws)
            lens[i] = len(ws)
        n = len(toks)
        arr = np.asarray(toks, dtype=object)
        # k-gram start positions: within-doc pos p with p + k <= doclen
        doc_of = np.repeat(keys, lens)
        starts = np.cumsum(lens) - lens
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        doclen_of = np.repeat(lens, lens)
        valid = pos + k <= doclen_of
        if not valid.any() or n == 0:
            return pa.table({key_col: pa.array([], t[key_col].type),
                             "pos": pa.array([], pa.int64()),
                             "gh": pa.array([], pa.int64())})
        # gram string = tokens joined by ' ' (matches the SQL oracle's
        # || ' ' || concatenation), built vectorized
        g = arr.astype(str)
        for j in range(1, k):
            shifted = np.empty(n, dtype=object)
            shifted[: n - j] = arr[j:]
            shifted[n - j:] = ""
            g = np.char.add(np.char.add(g, " "), shifted.astype(str))
        vg = g[valid]
        gh = poly_hash_strings(list(vg)).view(np.int64)
        return pa.table({key_col: pa.array(doc_of[valid], t[key_col].type),
                         "pos": pa.array(pos[valid], pa.int64()),
                         "gh": pa.array(gh, pa.int64())})

    # materialized once: the gram stream feeds BOTH the count reduction
    # and the join left side — without this, lineage recompute would
    # re-tokenize the whole corpus for each consumer
    gram_ds = ds.select_columns([key_col, text_col]).map_batches(
        grams, batch_format="pyarrow").materialize()
    if num_partitions is None:
        num_partitions = scaled_partitions(gram_ds.count())

    gs = gram_ds.schema()
    key_type = dict(zip(gs.names, gs.types))[key_col]
    empty_spans = pa.table({
        key_col: pa.array([], key_type),
        "span_start": pa.array([], pa.int64()),
        "span_end": pa.array([], pa.int64()),
    })
    dup = (gram_ds.groupby("gh").aggregate(Count(alias_name="__n"))
           .filter(expr=f"__n >= {min_count}").select_columns(["gh"])
           .materialize())
    if dup.count() == 0:
        # a corpus with NO duplicated grams: the fully-filtered dataset
        # is schema-less and would crash the hash join — short-circuit
        import ray.data as _rd

        return _rd.from_arrow(empty_spans)
    marked = gram_ds.join(dup, join_type="left_semi", on=("gh",),
                          num_partitions=num_partitions)

    def merge_spans(t: pa.Table, first: np.ndarray) -> pa.Table:
        p = t["pos"].to_numpy(zero_copy_only=False)
        n = len(p)
        if not n:
            return pa.table({key_col: pa.array([], t[key_col].type),
                             "span_start": pa.array([], pa.int64()),
                             "span_end": pa.array([], pa.int64())})
        new_span = first.copy()
        new_span[1:] |= p[1:] != p[:-1] + 1
        sp_starts = np.flatnonzero(new_span)
        sp_lens = np.diff(np.append(sp_starts, n))
        keys = t[key_col].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: pa.array(keys[sp_starts], t[key_col].type),
            "span_start": pa.array(p[sp_starts], pa.int64()),
            "span_end": pa.array(p[sp_starts + sp_lens - 1] + k, pa.int64()),
        })

    return partitioned_window(marked, key_col, ["pos"], merge_spans,
                              num_partitions)


def scrub_duplicate_substrings(ds: Dataset, key_col: str, text_col: str,
                               k: int = 5, min_count: int = 2,
                               num_partitions: int | None = None) -> Dataset:
    """ExactSubstr REMOVAL (the curation step Lee et al. 2021 apply after
    finding duplicated substrings): every token covered by a duplicated
    span (duplicate_ngram_spans) is dropped from every document; the
    remaining tokens rejoin with single spaces. Returns (key, text) rows
    for the whole corpus (docs scrubbed to nothing keep an empty string).

    Scale shape: spans pack to per-key lists in one segmented pass per
    hash partition, then ONE left_outer hash join attaches them to the
    corpus — the only exchange the text rides, which is unavoidable for a
    text-rewriting op."""
    import ray.data as _rd

    from ..relational.ops import partitioned_window, scaled_partitions

    spans = duplicate_ngram_spans(ds, key_col, text_col, k=k,
                                  min_count=min_count,
                                  num_partitions=num_partitions).materialize()
    out_schema_src = ds.select_columns([key_col, text_col])
    if spans.count() == 0:
        return out_schema_src

    def pack(t: pa.Table, first: np.ndarray) -> pa.Table:
        # spans serialize to ONE little-endian int64 [s,e]* binary blob per
        # key: Arrow's hash join rejects list-typed payload columns
        keys = t[key_col].to_numpy(zero_copy_only=False)
        s = t["span_start"].to_numpy(zero_copy_only=False)
        e = t["span_end"].to_numpy(zero_copy_only=False)
        n = len(keys)
        inter = np.empty(2 * n, dtype="<i8")
        inter[0::2] = s
        inter[1::2] = e
        raw = inter.tobytes()
        starts = np.flatnonzero(first)
        offs = np.append(starts, n).astype(np.int64)
        blobs = [raw[16 * a:16 * b] for a, b in zip(offs[:-1], offs[1:])]
        return pa.table({
            key_col: pa.array(keys[starts], t[key_col].type),
            "__sp": pa.array(blobs, pa.large_binary()),
        })

    packed = partitioned_window(spans, key_col, ["span_start"], pack)
    if num_partitions is None:
        # sized by the BIG side: the whole corpus text rides this join,
        # so partitioning by the (possibly tiny) span count would funnel
        # it through a couple of aggregators
        num_partitions = scaled_partitions(out_schema_src.count(),
                                           rows_per_partition=500_000)
    joined = out_schema_src.join(packed, join_type="left_outer",
                                 on=(key_col,),
                                 num_partitions=num_partitions)

    def scrub(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        blobs = t["__sp"].to_pylist()
        out: list[str] = []
        for txt, blob in zip(texts, blobs):
            if not blob:
                out.append(txt or "")
                continue
            inter = np.frombuffer(blob, dtype="<i8")
            ss, ee = inter[0::2], inter[1::2]
            ws = (txt or "").split(" ")
            pos = np.arange(len(ws))
            dead = np.zeros(len(ws), dtype=bool)
            for a, b in zip(ss, ee):
                dead |= (pos >= a) & (pos < b)
            out.append(" ".join(w for w, d in zip(ws, dead) if not d))
        return pa.table({key_col: t[key_col],
                         text_col: pa.array(out, t[text_col].type)})

    return joined.map_batches(scrub, batch_format="pyarrow")
