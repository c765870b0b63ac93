"""Text analysis operators for training-data curation.

Each is a stateless/actor map_batches stage over the documents table:
language ID (character n-gram heuristic), quality scoring (length /
punctuation / stopword ratios), token counting (whitespace + BPE-ish regex),
and rolling-hash document fingerprinting.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

_STOPWORDS = frozenset(
    "the a an and or of to in is was for on with as by at from it this that".split()
)

# tiny trigram profiles for a heuristic language guess (deterministic, no
# external models; real deployments would plug a fasttext-style model into
# the same actor-pool stage)
_LANG_PROFILES = {
    "en": ["the", "and", "ing", "ion", "ent"],
    "de": ["der", "ein", "ich", "sch", "und"],
    "fr": ["les", "ent", "que", "des", "ion"],
    "es": ["que", "los", "ent", "ión", "del"],
}

_BPE_RE = re.compile(r"\w+|[^\w\s]")


def language_id(ds: Dataset, key_col: str, text_col: str) -> Dataset:
    """Heuristic n-gram language ID -> (key, lang_guess, confidence)."""

    class LangId:
        def __init__(self):
            self.profiles = {
                lang: set(tris) for lang, tris in _LANG_PROFILES.items()
            }

        def __call__(self, t: pa.Table) -> pa.Table:
            langs, confs = [], []
            for s in t[text_col].to_pylist():
                s = (s or "").lower()
                tris = {s[i:i + 3] for i in range(len(s) - 2)}
                best, score = "und", 0
                for lang, prof in self.profiles.items():
                    hits = len(tris & prof)
                    if hits > score:
                        best, score = lang, hits
                langs.append(best)
                confs.append(score / 5.0)
            return pa.table(
                {key_col: t[key_col], "lang_guess": pa.array(langs, pa.string()),
                 "confidence": pa.array(confs, pa.float64())}
            )

    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=2)


def quality_score(ds: Dataset, key_col: str, text_col: str) -> Dataset:
    """Quality heuristics: n_chars, n_tokens, mean token length, stopword
    ratio, punct ratio — vectorized with pyarrow/numpy kernels."""

    def f(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.split_pattern(texts, " ")
        n_tokens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.float64)
        offsets = np.concatenate([[0], np.cumsum(n_tokens)])
        mean_len = np.array(
            [tok_lens[offsets[i]:offsets[i + 1]].mean() if n_tokens[i] else 0.0
             for i in range(len(n_tokens))]
        )
        stop_mask = pc.is_in(flat, value_set=pa.array(sorted(_STOPWORDS))).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        stop_ratio = np.array(
            [stop_mask[offsets[i]:offsets[i + 1]].mean() if n_tokens[i] else 0.0
             for i in range(len(n_tokens))]
        )
        return pa.table(
            {
                key_col: t[key_col],
                "n_chars": pa.array(n_chars),
                "n_tokens": pa.array(n_tokens),
                "mean_token_len": pa.array(mean_len, pa.float64()),
                "stopword_ratio": pa.array(stop_ratio, pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def token_stats(ds: Dataset, key_col: str, text_col: str) -> Dataset:
    """Token counting: whitespace tokens + BPE-ish regex pieces per doc."""

    class Counter:
        def __init__(self):
            self.rx = _BPE_RE

        def __call__(self, t: pa.Table) -> pa.Table:
            ws = pc.list_value_length(pc.split_pattern(t[text_col], " "))
            bpe = [len(self.rx.findall(s or "")) for s in t[text_col].to_pylist()]
            return pa.table(
                {key_col: t[key_col],
                 "ws_tokens": pa.array(ws.to_numpy(zero_copy_only=False).astype(np.int64)),
                 "bpe_tokens": pa.array(bpe, pa.int64())}
            )

    return ds.map_batches(Counter, batch_format="pyarrow", concurrency=2)


def doc_fingerprint(ds: Dataset, key_col: str, text_col: str, window: int = 16) -> Dataset:
    """Rolling polynomial hash fingerprint (winnowing-lite): min rolling hash
    over character windows — a stable near-identity document signature."""
    B = np.uint64(1099511628211)

    def f(t: pa.Table) -> pa.Table:
        out = np.zeros(len(t), dtype=np.uint64)
        for i, s in enumerate(t[text_col].to_pylist()):
            b = np.frombuffer((s or "").encode(), dtype=np.uint8).astype(np.uint64)
            if len(b) < window:
                h = np.uint64(0)
                for c in b:
                    h = h * B + c
                out[i] = h
                continue
            # rolling hash over all windows, vectorized via cumulative powers
            pw = np.ones(window, dtype=np.uint64)
            for j in range(1, window):
                pw[j] = pw[j - 1] * B
            pw = pw[::-1]
            n = len(b) - window + 1
            idx = np.arange(n)[:, None] + np.arange(window)[None, :]
            hashes = (b[idx] * pw[None, :]).sum(axis=1, dtype=np.uint64)
            out[i] = hashes.min()
        return pa.table({key_col: t[key_col], "fingerprint": pa.array(out, pa.uint64())})

    return ds.map_batches(f, batch_format="pyarrow")
