"""Language-model perplexity scoring for corpus curation (the CCNet
quality-bucketing step: Wenzek et al. 2020 score web pages with an LM and
keep head/middle/tail perplexity buckets; the reference's analogous signal
is the update-chain quality hooks, update/processor/ — the LM here is
built from the corpus itself, no external model).

Word-bigram LM with add-one smoothing over the corpus vocabulary:
  P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + 1) / (c(w_{i-1}) + V)
  P(w_1)           = (c(w_1) + 1) / (T + V)
  PP(doc) = exp(-(1/N) * sum ln P)
Counts come from the FreeTextSuggester gram index (search/freetext.py
build_freetext, n=2) — one distributed count build serves both the
suggester and the scorer.

Scale shape: scoring joins the (doc, gram) stream against the counts
table with TWO native hash-partitioned Dataset.joins (gram keys are
full-width int64 polynomial hashes), so neither the corpus text nor the
LM table is ever broadcast or driver-materialized, and no single task
ever holds more than one hash partition; per-doc reduction is a groupby
sum. Partition count scales with the corpus token count T (read from the
LM meta row), mirroring ParallelStream's worker-count-as-input contract
(solr/.../io/stream/ParallelStream.java:48) — never a fixed constant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data import Dataset

from ..search.freetext import _SEP
from ..util.polyhash import poly_hash_strings


def _hkey(strs: list[str]) -> "np.ndarray":
    """Full-width int64 join key from the polynomial hash (uint64 bits
    reinterpreted; Arrow/Ray hash joins keep int64 exact end-to-end)."""
    return poly_hash_strings(strs).view("int64")


def _lm_tables(lm_dir: str):
    """(unigram Dataset keyed k1, bigram Dataset keyed k2, V, T)."""
    lm = ray.data.read_parquet(lm_dir)

    def key_uni(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.or_(pc.equal(t["ord"], 1), pc.equal(t["ord"], 0))
        t = t.filter(m)
        # ord=0 meta row (word='') carries T: it becomes the denominator
        # row first tokens (ctx='') join against
        k = _hkey(t["word"].to_pylist())
        return pa.table({"k1": pa.array(k, pa.int64()),
                         "cu": t["cnt"]})

    def key_big(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # ord=2 bigrams AND ord=1 unigrams (context=''): a doc's first
        # token scores P(w1) = (c(w1)+1)/(T+V) through the same join
        m = pc.or_(pc.equal(t["ord"], 2), pc.equal(t["ord"], 1))
        t = t.filter(m)
        keys = [c + _SEP + w for c, w in
                zip(t["context"].to_pylist(), t["word"].to_pylist())]
        k = _hkey(keys)
        return pa.table({"k2": pa.array(k, pa.int64()),
                         "cb": t["cnt"]})

    uni = lm.map_batches(key_uni, batch_format="pyarrow")
    big = lm.map_batches(key_big, batch_format="pyarrow")
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # V and T are two scalars: read only the needed columns, pruned
    meta = pq.read_table(lm_dir, columns=["ord", "cnt"])
    v = int(pc.sum(pc.cast(pc.equal(meta["ord"], 1), pa.int64())).as_py())
    t_row = meta.filter(pc.equal(meta["ord"], 0))
    total = int(t_row["cnt"][0].as_py()) if t_row.num_rows else 0
    return uni, big, v, total


def perplexity_scores(ds: Dataset, key_col: str, text_col: str,
                      lm_dir: str, bucket_bounds: tuple[float, float]
                      = (100.0, 1000.0),
                      num_partitions: int | None = None) -> Dataset:
    """Per-doc perplexity + CCNet-style bucket ('head' < bounds[0] <=
    'middle' < bounds[1] <= 'tail'; empty docs -> 'tail' with PP inf
    encoded as -1).

    num_partitions defaults to scaled_partitions(T) over the corpus token
    count T (read from the LM meta row): each partition of the (doc, gram)
    stream stays a bounded single-aggregator unit regardless of corpus
    size, and small corpora don't stall waiting on aggregator actors the
    cluster can't schedule."""
    from ..relational.ops import scaled_partitions

    uni, big, v_size, total = _lm_tables(lm_dir)
    if num_partitions is None:
        num_partitions = scaled_partitions(total)

    def grams(t: pa.Table) -> pa.Table:
        from ..analysis.analyzers import analyze_fast, standard_analyzer

        keys = t[key_col].to_numpy(zero_copy_only=False)
        toks: list[str] = []
        lens = np.zeros(len(keys), dtype=np.int64)
        for i, txt in enumerate(t[text_col].to_pylist()):
            terms = analyze_fast(txt or "")
            if terms is None:
                terms, _ = standard_analyzer(txt or "")
            toks.extend(terms)
            lens[i] = len(terms)
        arr = np.asarray(toks, dtype=object)
        doc_of = np.repeat(keys, lens)
        # vectorized contexts: previous token, '' at doc starts
        ctx = np.empty(len(arr), dtype=object)
        if len(arr):
            ctx[1:] = arr[:-1]
            ctx[0] = ""
            starts = np.zeros(len(arr), dtype=bool)
            # zero-token docs make cumsum positions repeat or hit
            # len(arr); clamp to real start positions only
            sp = np.cumsum(lens)[:-1]
            starts[sp[sp < len(arr)]] = True
            starts[0] = True
            ctx[starts] = ""
        gram = np.char.add(np.char.add(ctx.astype(str), _SEP),
                           arr.astype(str)) if len(arr) else arr
        k1 = _hkey(ctx.tolist())
        k2 = _hkey(list(gram))
        # token-less docs ride as (-1, -1) sentinel rows so they surface
        # as bucket 'tail' / perplexity -1 instead of vanishing
        empty = lens == 0
        return pa.table({
            key_col: pa.array(np.concatenate([doc_of, keys[empty]]),
                              t[key_col].type),
            "k1": pa.array(np.concatenate(
                [k1, np.full(int(empty.sum()), -1, np.int64)]), pa.int64()),
            "k2": pa.array(np.concatenate(
                [k2, np.full(int(empty.sum()), -1, np.int64)]), pa.int64()),
        })

    pairs = ds.select_columns([key_col, text_col]).map_batches(
        grams, batch_format="pyarrow")
    # native hash-partitioned joins: both legs shuffle only (key, int64)
    # columns; missing grams surface as null counts via left_outer
    j1 = pairs.join(big, join_type="left_outer", on=("k2",),
                    num_partitions=num_partitions)
    j2 = j1.join(uni, join_type="left_outer", on=("k1",),
                 num_partitions=num_partitions)

    def lnp(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cb = pc.fill_null(t["cb"], 0).to_numpy(zero_copy_only=False)
        cu = pc.fill_null(t["cu"], 0).to_numpy(zero_copy_only=False)
        ln = np.log((cb.astype(np.float64) + 1.0)
                    / (cu.astype(np.float64) + float(v_size)))
        # sentinel rows (token-less docs): zero contribution, zero tokens
        # -> the doc groups to n_tokens == 0 and surfaces as 'tail'/-1
        sent = t["k2"].to_numpy(zero_copy_only=False) == -1
        ln = np.where(sent, 0.0, ln)
        return pa.table({key_col: t[key_col],
                         "lnp": pa.array(ln, pa.float64()),
                         "n": pa.array((~sent).astype(np.int64))})

    from ray.data.aggregate import Sum

    per_doc = (
        j2.map_batches(lnp, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("lnp", alias_name="sum_lnp"),
                   Sum("n", alias_name="n_tokens"))
    )
    lo, hi = bucket_bounds

    def finish(t: pa.Table) -> pa.Table:
        s = t["sum_lnp"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        pp = np.exp(-s / np.maximum(n, 1.0))
        # token-less docs (n == 0): PP undefined -> -1, bucket 'tail'
        pp = np.where(n == 0, -1.0, pp)
        bucket = np.where(n == 0, "tail",
                          np.where(pp < lo, "head",
                                   np.where(pp < hi, "middle", "tail")))
        return pa.table({
            key_col: t[key_col],
            "perplexity": pa.array(pp, pa.float64()),
            "bucket": pa.array(bucket.astype(object), pa.large_string()),
        })

    return per_doc.map_batches(finish, batch_format="pyarrow")
