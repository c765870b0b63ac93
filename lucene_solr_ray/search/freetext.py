"""FreeTextSuggester: n-gram language-model completion with stupid backoff
(suggest/analyzing/FreeTextSuggester.java:135; ALPHA = 0.4 at :183).

Build: one distributed pass over the corpus emits per-batch gram partials
(vectorized numpy shingling), a groupby-sum reduces them, and the counts
land in a parquet "suggester index" with columns (ord, context, word, cnt):
  ord=0  — one meta row, cnt = total token count (backoff denominator)
  ord=1  — unigram counts (context = '')
  ord=2+ — n-gram counts keyed by the joined (n-1)-token context
Lookup never scans the index: parquet predicate pushdown prunes to the
context's rows and the prefix's row-group ranges.

Scoring mirrors the reference's lookup: candidates matching the prefix are
scored count(context + w) / count(context) at the longest context that has
them, and back off with an ALPHA multiplier per dropped context token —
a candidate found at a higher order is never re-scored at a lower one
(the reference's seen-set dedup).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ALPHA = 0.4  # FreeTextSuggester.java:183 stupid-backoff discount
_SEP = "\x1e"  # context-token joiner (the reference's 0x1E separator byte)


class _GramCounter:
    """map_batches fn: per-batch partial gram counts (combiner role)."""

    def __init__(self, text_col: str, n: int):
        self.text_col = text_col
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..analysis.analyzers import analyze_fast, standard_analyzer

        texts = batch[self.text_col].to_pylist()
        toks: list[str] = []
        lens = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            terms = analyze_fast(t or "")
            if terms is None:
                terms, _ = standard_analyzer(t or "")
            toks.extend(terms)
            lens[i] = len(terms)
        arr = np.asarray(toks, dtype=object)
        doc_idx = np.repeat(np.arange(len(texts)), lens)
        ords: list[np.ndarray] = []
        ctxs: list[np.ndarray] = []
        words: list[np.ndarray] = []
        cnts: list[np.ndarray] = []
        # total-token meta partial
        ords.append(np.zeros(1, np.int8))
        ctxs.append(np.array([""], dtype=object))
        words.append(np.array([""], dtype=object))
        cnts.append(np.array([len(arr)], np.int64))
        for order in range(1, self.n + 1):
            if len(arr) < order:
                break
            # windows fully inside one doc: doc_idx equal across the span
            ok = np.ones(len(arr) - order + 1, dtype=bool)
            for j in range(1, order):
                ok &= doc_idx[j:len(arr) - order + 1 + j] == \
                    doc_idx[:len(arr) - order + 1]
            idx = np.flatnonzero(ok)
            if not len(idx):
                continue
            if order == 1:
                ctx = np.full(len(idx), "", dtype=object)
            else:
                parts = [arr[idx + j] for j in range(order - 1)]
                ctx = parts[0]
                for p in parts[1:]:
                    ctx = np.char.add(np.char.add(
                        ctx.astype(str), _SEP), p.astype(str)).astype(object)
            w = arr[idx + order - 1]
            key = np.char.add(np.char.add(ctx.astype(str), _SEP),
                              w.astype(str))
            uniq, first, cnt = np.unique(key, return_index=True,
                                         return_counts=True)
            ords.append(np.full(len(uniq), order, np.int8))
            ctxs.append(ctx[first])
            words.append(w[first])
            cnts.append(cnt.astype(np.int64))
        return pa.table({
            "ord": pa.array(np.concatenate(ords), pa.int8()),
            "context": pa.array(np.concatenate(ctxs), pa.large_string()),
            "word": pa.array(np.concatenate(words), pa.large_string()),
            "cnt": pa.array(np.concatenate(cnts), pa.int64()),
        })


def build_freetext(corpus_paths, out_dir: str, text_col: str = "text",
                   n: int = 2) -> str:
    """Distributed n-gram count build -> parquet suggester index."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(corpus_paths, columns=[text_col])
    grams = ds.map_batches(_GramCounter(text_col, n),
                           batch_format="pyarrow")
    agg = grams.groupby(["ord", "context", "word"]).aggregate(
        Sum("cnt", alias_name="cnt"))
    tmp = out_dir + ".tmp"
    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    agg.write_parquet(tmp)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    return out_dir


class FreeTextSuggester:
    """Lookup over a built suggester index (pruned parquet reads only)."""

    def __init__(self, index_dir: str, n: int = 2):
        self.dir = index_dir
        self.n = n
        self._files = sorted(
            os.path.join(index_dir, f) for f in os.listdir(index_dir)
            if f.endswith(".parquet"))
        meta = self._read(pc.field("ord") == 0, columns=["cnt"])
        self.total = int(pc.sum(meta["cnt"]).as_py() or 0)

    def _read(self, filt, columns=None) -> pa.Table:
        parts = [pq.read_table(f, filters=filt, columns=columns)
                 for f in self._files]
        return pa.concat_tables(parts)

    def _count(self, ord_: int, context: str, word: str) -> int:
        t = self._read((pc.field("ord") == ord_)
                       & (pc.field("context") == context)
                       & (pc.field("word") == word), columns=["cnt"])
        return int(pc.sum(t["cnt"]).as_py() or 0)

    def lookup(self, key: str, k: int = 5,
               round_nd: int | None = None) -> pa.Table:
        """key = 'ctx tokens... prefix' (trailing space = empty prefix,
        all words are candidates of the context, as in the reference's
        lookup on a separator-ending key)."""
        ends_sep = key != key.rstrip()
        from ..analysis.analyzers import analyze_fast, standard_analyzer

        toks = analyze_fast(key)
        if toks is None:
            toks, _ = standard_analyzer(key)
        toks = list(toks)
        prefix = "" if ends_sep else (toks.pop() if toks else "")
        cand: dict[str, float] = {}
        # longest context first; shorter orders only add UNSEEN words
        for order in range(min(self.n, len(toks) + 1), 0, -1):
            ctx_toks = toks[len(toks) - (order - 1):]
            ctx = _SEP.join(ctx_toks)
            filt = (pc.field("ord") == order) & (pc.field("context") == ctx)
            if prefix:
                hi = prefix[:-1] + chr(ord(prefix[-1]) + 1)
                filt = filt & (pc.field("word") >= prefix) & \
                    (pc.field("word") < hi)
            rows = self._read(filt, columns=["word", "cnt"])
            if not rows.num_rows:
                continue
            denom = (self._count(order - 1, _SEP.join(ctx_toks[:-1]),
                                 ctx_toks[-1])
                     if order > 1 else self.total)
            if not denom:
                continue
            backoff = ALPHA ** (min(self.n, len(toks) + 1) - order)
            for w, c in zip(rows["word"].to_pylist(),
                            rows["cnt"].to_pylist()):
                if w not in cand:
                    cand[w] = backoff * c / denom
        words = np.array(sorted(cand), dtype=object)
        scores = np.array([cand[w] for w in words], dtype=np.float64)
        if round_nd is not None:
            p10 = 10.0 ** round_nd
            ax = np.abs(scores) * p10
            fl = np.floor(ax)
            scores = np.sign(scores) * (fl + (ax - fl >= 0.5)) / p10
        top = np.lexsort((words, -scores))[:k]
        return pa.table({
            "word": pa.array(words[top], pa.large_string()),
            "score": pa.array(scores[top], pa.float64()),
        })
