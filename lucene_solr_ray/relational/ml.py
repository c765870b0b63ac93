"""Distributed model training / scoring (TextLogitStream role).

The reference's TextLogitStream trains logistic regression across shards by
shipping per-shard gradient partials to the coordinator each iteration
(solrj io/stream/TextLogitStream.java). Here each iteration is one
map_batches pass emitting a per-batch (gradient, loss, count) partial; the
driver sums partials and takes the step — weights are broadcast per
iteration via ray.put, read zero-copy in every task.

KnnStream-style scoring of a trained model is `score()` below (one
vectorized matmul per batch).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..util.vectors import vec_matrix


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))


def train_logistic(
    ds: Dataset, vec_col: str, label_col: str,
    iterations: int = 20, lr: float = 0.5, l2: float = 1e-4,
    dim: int | None = None,
) -> dict:
    """Full-batch gradient descent; returns weights/bias + loss history."""
    if dim is None:
        first = ds.take(1)[0]
        dim = len(first[vec_col])
    w = np.zeros(dim + 1, dtype=np.float64)  # [bias, weights]
    history = []
    for it in range(iterations):
        w_ref = ray.put(w)

        def grad_partial(t: pa.Table) -> pa.Table:
            wt = ray.get(w_ref)
            X = vec_matrix(t[vec_col])
            y = t[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            z = X @ wt[1:] + wt[0]
            p = _sigmoid(z)
            err = p - y
            g = np.concatenate([[err.sum()], X.T @ err])
            eps = 1e-12
            loss = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()
            return pa.table({
                "g": pa.array([g.tobytes()], pa.large_binary()),
                "loss": pa.array([loss], pa.float64()),
                "n": pa.array([len(y)], pa.int64()),
            })

        total_g = np.zeros(dim + 1)
        total_loss = 0.0
        total_n = 0
        for b in ds.map_batches(grad_partial, batch_format="pyarrow",
                                batch_size=4096).iter_batches(batch_format="pyarrow"):
            for gb, lo, n in zip(b["g"].to_pylist(), b["loss"].to_pylist(), b["n"].to_pylist()):
                total_g += np.frombuffer(gb, dtype=np.float64)
                total_loss += lo
                total_n += n
        total_g /= total_n
        total_g[1:] += l2 * w[1:]
        w = w - lr * total_g
        history.append(total_loss / total_n)
    return {"bias": float(w[0]), "weights": w[1:], "loss_history": history}


def score_logistic(ds: Dataset, vec_col: str, key_col: str, model: dict) -> Dataset:
    """ModelStream/KnnStream scoring: broadcast model, one matmul per batch."""
    ref = ray.put((model["bias"], np.asarray(model["weights"], dtype=np.float64)))

    def sc(t: pa.Table) -> pa.Table:
        b, wt = ray.get(ref)
        X = vec_matrix(t[vec_col])
        p = _sigmoid(X @ wt + b)
        return pa.table({
            key_col: t[key_col],
            "prob": pa.array(p, pa.float64()),
            "pred": pa.array((p >= 0.5).astype(np.int32), pa.int32()),
        })

    return ds.map_batches(sc, batch_format="pyarrow", batch_size=4096)


def knn_classify(
    train_ds: Dataset, queries: np.ndarray, vec_col: str, label_col: str,
    k: int = 5,
) -> pa.Table:
    """kNN classifier (classification/KNearestNeighborClassifier.java:51):
    majority label among the k cosine-nearest training vectors; ties break
    to the smallest label. Distributed exactly like brute_force_knn — the
    query matrix broadcasts once, per-batch top-k partials merge on the
    driver."""
    qm = np.asarray(queries, dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put(qm)
    nq = len(qm)

    def scan(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = vec_matrix(t[vec_col])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = q @ m.T
        labels = t[label_col].to_numpy(zero_copy_only=False)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        return pa.table({
            "query_id": pa.array(np.repeat(np.arange(nq, dtype=np.int64), kk)),
            "label": pa.array(labels[idx.ravel()].astype(np.int64), pa.int64()),
            "cosine": pa.array(np.take_along_axis(sims, idx, axis=1).ravel(),
                               pa.float64()),
        })

    partial = train_ds.select_columns([vec_col, label_col]).map_batches(
        scan, batch_format="pyarrow", batch_size=4096
    )
    parts = [b for b in partial.iter_batches(batch_format="pyarrow",
                                             batch_size=65536)]
    cat = pa.concat_tables(parts) if parts else None
    out_q, out_l = [], []
    for qi in range(nq):
        if cat is None:
            break
        mask = pa.compute.equal(cat["query_id"], qi)
        sub = cat.filter(mask)
        sims = sub["cosine"].to_numpy(zero_copy_only=False)
        labs = sub["label"].to_numpy(zero_copy_only=False)
        order = np.argsort(-sims, kind="stable")[:k]
        top_labs = labs[order]
        vals, counts = np.unique(top_labs, return_counts=True)
        best = vals[np.lexsort((vals, -counts))][0]
        out_q.append(qi)
        out_l.append(int(best))
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "label": pa.array(out_l, pa.int64())})


def select_features(ds: Dataset, vec_col: str, label_col: str,
                    top_k: int = 10, positive_label: int = 0) -> pa.Table:
    """Feature selection over a vector column (FeaturesSelectionStream role,
    solrj io/stream/FeaturesSelectionStream.java — the reference ranks
    boolean term features by information gain; continuous embedding
    dimensions are ranked by the two-sample t-score instead, a documented
    substitution). One map_batches pass emits per-class (count, sum, sum-of-
    squares) partials per dimension; the driver merges partials and ranks.

    Returns (dim 1-based, score) sorted score desc, dim asc, top_k rows."""

    def partial(t: pa.Table) -> pa.Table:
        X = vec_matrix(t[vec_col])
        y = (t[label_col].to_numpy(zero_copy_only=False) == positive_label)
        rows = []
        for cls in (0, 1):
            m = y if cls == 1 else ~y
            sub = X[m]
            rows.append((cls, len(sub), sub.sum(axis=0),
                         (sub * sub).sum(axis=0)))
        dim = X.shape[1]
        return pa.table({
            "cls": pa.array([r[0] for r in rows], pa.int32()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "s": pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate([np.asarray(r[2], np.float64)
                                         for r in rows]), pa.float64()), dim),
            "q": pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate([np.asarray(r[3], np.float64)
                                         for r in rows]), pa.float64()), dim),
        })

    parts = ds.select_columns([vec_col, label_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096
    )
    n = {0: 0, 1: 0}
    s: dict[int, np.ndarray] = {}
    q: dict[int, np.ndarray] = {}
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=4096):
        cls = b["cls"].to_numpy(zero_copy_only=False)
        ns = b["n"].to_numpy(zero_copy_only=False)
        sm = vec_matrix(b["s"])
        qm = vec_matrix(b["q"])
        for i, c in enumerate(cls.tolist()):
            n[c] += int(ns[i])
            s[c] = s.get(c, 0) + sm[i]
            q[c] = q.get(c, 0) + qm[i]
    m1 = s[1] / n[1]
    m0 = s[0] / n[0]
    pooled = ((q[1] - s[1] * s[1] / n[1]) + (q[0] - s[0] * s[0] / n[0])) / (
        n[1] + n[0] - 2
    ) * (1.0 / n[1] + 1.0 / n[0])
    score = np.abs(m1 - m0) / np.sqrt(pooled)
    dims = np.arange(1, len(score) + 1)
    order = np.lexsort((dims, -score))[:top_k]
    return pa.table({
        "dim": pa.array(dims[order], pa.int64()),
        "score": pa.array(score[order], pa.float64()),
    })


def train_naive_bayes(ds: Dataset, text_col: str, class_col: str) -> dict:
    """Precompute SimpleNaiveBayesClassifier statistics (classification/
    SimpleNaiveBayesClassifier.java:48; the precompute mirrors
    CachingNaiveBayesClassifier.java:47's reInitCache).

    Per (class, word): the number of class-c docs CONTAINING the word
    (getWordFreqForClass:250 — a doc count, not a term frequency). Plus
    per-class doc counts (the prior, calculateLogPrior:267), docs-with-
    class, and avg unique terms per doc = sumDocFreq/docCount
    (getTextTermFreqForClass:231).

    Distributed as one tokenize pass: each batch dedupes (doc, term) pairs
    in Arrow, pre-aggregates (class, term) partial doc counts map-side,
    and a small groupby-sum merges partials — the corpus text never
    shuffles. The returned model is the small (classes x vocab-touched)
    stats table, meant to broadcast via ray.put for batch classification.
    """
    import pyarrow.compute as pc

    def partials(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.coalesce(t[text_col], pa.scalar("", t[text_col].type)), " ")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        didx = np.repeat(np.arange(len(t), dtype=np.int64), n)
        keep = flat != ""
        flat, didx = flat[keep], didx[keep]
        cls = t[class_col].to_numpy(zero_copy_only=False)[didx]
        n_text_docs = len(np.unique(didx))
        pairs = pa.table({
            "d": pa.array(didx), "cls": pa.array(cls, pa.string()),
            "term": pa.array(flat, pa.string()),
        }).group_by(["d", "cls", "term"]).aggregate([])  # distinct per doc
        # map-side combine: per-(class, term) doc counts within the batch
        agg = pairs.group_by(["cls", "term"]).aggregate([("d", "count")])
        # per-class doc counts + distinct-pair count ride as sentinel rows
        cvals = t[class_col].to_numpy(zero_copy_only=False)
        cu, cn = np.unique(cvals[np.not_equal(cvals, None)],
                           return_counts=True)
        sent = pa.table({
            "cls": pa.array(list(cu) + ["\x00total", "\x00total"],
                            pa.string()),
            "term": pa.array(["\x00docs"] * len(cu)
                             + ["\x00pairs", "\x00textdocs"], pa.string()),
            "d_count": pa.array(list(cn.astype(np.int64))
                                + [pairs.num_rows, n_text_docs], pa.int64()),
        })
        return pa.concat_tables([
            pa.table({"cls": agg["cls"], "term": agg["term"],
                      "d_count": pc.cast(agg["d_count"], pa.int64())}),
            sent,
        ])

    merged = (
        ds.select_columns([text_col, class_col])
        .map_batches(partials, batch_format="pyarrow", batch_size=4096)
        .groupby(["cls", "term"]).sum("d_count")
    ).to_arrow_refs()
    tbl = pa.concat_tables([ray.get(r) for r in merged])
    cls_a = tbl["cls"].to_numpy(zero_copy_only=False)
    term_a = tbl["term"].to_numpy(zero_copy_only=False)
    cnt_a = tbl["sum(d_count)"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_mask = term_a == "\x00docs"
    pair_mask = (cls_a == "\x00total") & (term_a == "\x00pairs")
    text_mask = (cls_a == "\x00total") & (term_a == "\x00textdocs")
    class_docs = {c: int(n) for c, n in zip(cls_a[doc_mask], cnt_a[doc_mask])}
    n_pairs = int(cnt_a[pair_mask].sum())
    n_text_docs = int(cnt_a[text_mask].sum())
    n_docs = sum(class_docs.values())
    word_mask = ~doc_mask & ~pair_mask & ~text_mask
    hits = {(c, w): int(n) for c, w, n in
            zip(cls_a[word_mask], term_a[word_mask], cnt_a[word_mask])
            if c is not None}
    return {
        "classes": sorted(class_docs),
        "class_docs": class_docs,
        "docs_with_class": n_docs,
        # getTextTermFreqForClass:231 — sumDocFreq / docCount over the
        # text field (classless docs included in both)
        "avg_unique_terms": n_pairs / max(1, n_text_docs),
        "hits": hits,
    }


def naive_bayes_log_scores(model: dict, text: str) -> pa.Table:
    """Per-class unnormalized log score for one input text:
    ln(df_c) - ln(N) + sum_w ln((hits(w,c)+1) / (avgU*df_c + N))
    (SimpleNaiveBayesClassifier.assignClassNormalizedList:135-151, words
    keep their repetitions)."""
    words = [w for w in text.split(" ") if w]
    n = model["docs_with_class"]
    rows_c, rows_s = [], []
    for c in model["classes"]:
        dfc = model["class_docs"][c]
        den = model["avg_unique_terms"] * dfc + n
        s = np.log(dfc) - np.log(n)
        for w in words:
            s += np.log((model["hits"].get((c, w), 0) + 1) / den)
        rows_c.append(c)
        rows_s.append(float(s))
    return pa.table({"cls": pa.array(rows_c, pa.large_string()),
                     "log_score": pa.array(rows_s, pa.float64())})


def naive_bayes_assign(model: dict, text: str) -> tuple[str, float]:
    """assignClass (…:102): the max-scoring class with its 0-1 normalized
    confidence (normClassificationResults:283 log-sum-exp)."""
    t = naive_bayes_log_scores(model, text)
    s = t["log_score"].to_numpy()
    c = t["cls"].to_pylist()
    mx = float(s.max())
    norm = np.exp(s - mx) / np.exp(s - mx).sum()
    i = int(np.lexsort((c, -s))[0])
    return c[i], float(norm[i])


def naive_bayes_classify_ds(ds: Dataset, text_col: str, model: dict,
                            out_col: str = "nb_class") -> Dataset:
    """Batch classification: the model broadcasts once (ray.put), each
    batch scores vectorized — terms map to per-class count columns via a
    dictionary lookup, scores accumulate by np.add.at over flattened
    token runs (no per-row Python in the class loop)."""
    classes = model["classes"]
    vocab = sorted({w for (_, w) in model["hits"]})
    vidx = {w: i for i, w in enumerate(vocab)}
    mat = np.zeros((len(classes), len(vocab)), dtype=np.float64)
    for (c, w), h in model["hits"].items():
        mat[classes.index(c), vidx[w]] = h
    n = model["docs_with_class"]
    dens = np.array([model["avg_unique_terms"] * model["class_docs"][c] + n
                     for c in classes])
    # per-class log((hits+1)/den) over the touched vocab + the unseen-word
    # constant log(1/den)
    logp = np.log(mat + 1.0) - np.log(dens)[:, None]
    log_unseen = -np.log(dens)
    priors = np.array([np.log(model["class_docs"][c]) - np.log(n)
                       for c in classes])
    state = ray.put((np.asarray(vocab, dtype=object), logp, log_unseen,
                     priors, classes))

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vdx, lp, lu, pr, cls = ray.get(state)
        toks = pc.split_pattern(
            pc.coalesce(t[text_col], pa.scalar("", t[text_col].type)), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        words = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        didx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        keep = words != ""
        words, didx = words[keep], didx[keep]
        # vectorized vocab lookup: searchsorted over the sorted vocab
        if len(vdx):
            pos = np.searchsorted(vdx, words)
            pos_c = np.minimum(pos, len(vdx) - 1)
            seen = vdx[pos_c] == words
            col = np.where(seen, pos_c, 0)
        else:
            seen = np.zeros(len(words), dtype=bool)
            col = np.zeros(len(words), dtype=np.int64)
        scores = np.tile(pr, (len(t), 1))
        for ci in range(len(cls)):
            contrib = np.where(seen, lp[ci][col], lu[ci])
            np.add.at(scores[:, ci], didx, contrib)
        best = np.argmin(
            np.where(scores.max(axis=1, keepdims=True) == scores,
                     np.arange(len(cls)), len(cls)), axis=1)
        out = t.append_column(out_col, pa.array(
            np.asarray(cls, dtype=object)[best], pa.large_string()))
        return out.append_column(
            out_col + "_log", pa.array(scores[np.arange(len(t)), best],
                                       pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow", batch_size=4096)
