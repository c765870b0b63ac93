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

# Character-trigram profiles per language: the most frequent trigrams from
# published frequency tables (the same signal the reference's langid
# contribs use). Scoring counts non-overlapping OCCURRENCES of each profile
# trigram in the lowercased text — a deterministic rule that a SQL oracle
# replicates exactly via length(replace(...)) arithmetic, so the operator
# is value-checked end to end (a learned fasttext-style model would slot
# into the same actor-pool stage).
_LANG_PROFILES = {
    "de": ["er ", "en ", "ch ", "der", "ein", "ich", "sch", "und", "die", "ng "],
    "en": ["th", "the", " th", "he ", "ing", "and", "ion", "ent", " of", "ed "],
    "es": ["de ", " de", "os ", "que", "los", "ent", "ión", "del", "as ", "la "],
    "fr": ["es ", " de", "de ", "les", "ent", "que", "des", "ion", "la ", "le "],
    "it": ["di ", " di", "to ", "che", "la ", "re ", "no ", "one", "ell", "zio"],
    "nl": ["en ", "de ", "an ", "van", "een", "het", "aar", "en.", "ij ", "er "],
    "pt": ["de ", "o d", "os ", "que", " co", "ão ", "da ", "em ", "ra ", "as "],
}


_BPE_RE = re.compile(r"\w+|[^\w\s]")


def _count_occurrences(s: str, sub: str) -> int:
    """Non-overlapping left-to-right count — identical to SQL's
    (length(s) - length(replace(s, sub, ''))) / length(sub)."""
    return s.count(sub)


def detect_lang(s: str, threshold: int = 1,
                fallback: str = "und") -> tuple[str, int]:
    """One string -> (language, profile-hit score): the winning profile's
    total trigram occurrences; ties break to the lexicographically
    smallest code; below `threshold` hits -> (fallback, 0-ish score)."""
    s = (s or "").lower()
    best, best_score = fallback, threshold - 1
    for lang, tris in sorted(_LANG_PROFILES.items()):
        sc = sum(_count_occurrences(s, tri) for tri in tris)
        if sc > best_score:
            best, best_score = lang, sc
    return best, max(best_score, 0)


def language_id(ds: Dataset, key_col: str, text_col: str) -> Dataset:
    """Heuristic n-gram language ID -> (key, lang_guess, score).

    score = total occurrences of the winning language's profile trigrams;
    ties break to the lexicographically smallest language code; a text
    matching no profile is 'und' with score 0."""

    class LangId:
        def __call__(self, t: pa.Table) -> pa.Table:
            langs, scores = [], []
            for s in t[text_col].to_pylist():
                lang, sc = detect_lang(s)
                langs.append(lang)
                scores.append(sc)
            return pa.table(
                {key_col: t[key_col], "lang_guess": pa.array(langs, pa.string()),
                 "score": pa.array(scores, pa.int64())}
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
        nz = np.maximum(n_tokens, 1).astype(np.float64)

        def seg_mean(vals: np.ndarray) -> np.ndarray:
            # per-doc mean via cumsum-diff (no per-row Python loop); empty
            # docs divide by the clamped 1 and zero out via the sum
            c = np.concatenate([[0.0], np.cumsum(vals)])
            return (c[offsets[1:]] - c[offsets[:-1]]) / nz

        mean_len = seg_mean(tok_lens)
        stop_mask = pc.is_in(flat, value_set=pa.array(sorted(_STOPWORDS))).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        stop_ratio = seg_mean(stop_mask)
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
    """Rolling polynomial hash fingerprint (winnowing-lite): min hash over
    all `window`-codepoint character windows — a stable near-identity
    document signature. Uses the engine's poly codepoint hash (mod 2^64)
    and emits the top 62 bits (h >> 2) as int64, so the value is portable
    through parquet/pandas and bit-exactly checkable by the DuckDB oracle
    (min over substring(text, i, window) hashes)."""
    from ..util.polyhash import POLY_B

    B = np.uint64(POLY_B)

    def f(t: pa.Table) -> pa.Table:
        out = np.zeros(len(t), dtype=np.uint64)
        pw = np.ones(window, dtype=np.uint64)
        for j in range(1, window):
            pw[j] = pw[j - 1] * B
        pw = pw[::-1].copy()
        for i, s in enumerate(t[text_col].to_pylist()):
            s = s or ""
            cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
            if len(cp) < window:
                h = np.uint64(0)
                for c in cp:
                    h = h * B + c
                out[i] = h
                continue
            n = len(cp) - window + 1
            idx = np.arange(n)[:, None] + np.arange(window)[None, :]
            hashes = (cp[idx] * pw[None, :]).sum(axis=1, dtype=np.uint64)
            out[i] = hashes.min()
        fp = (out >> np.uint64(2)).astype(np.int64)
        return pa.table({key_col: t[key_col], "fingerprint": pa.array(fp, pa.int64())})

    return ds.map_batches(f, batch_format="pyarrow")


_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filters(ds: Dataset, key_col: str, text_col: str,
                   min_words: int = 50, max_words: int = 100_000,
                   min_mean_word_len: float = 3.0,
                   max_mean_word_len: float = 10.0,
                   max_symbol_ratio: float = 0.1,
                   min_alpha_word_frac: float = 0.8,
                   min_stop_hits: int = 2,
                   carry_cols: tuple = ()) -> Dataset:
    """Gopher document-quality rules (Rae et al. 2021, "Scaling Language
    Models: Methods, Analysis & Insights from Training Gopher", App. A):
    per-doc metrics + a pass flag for the standard web-corpus filters —
    word count bounds, mean word length bounds, symbol-to-word ratio
    (# and ...), alphabetic-word fraction, and a minimum count of distinct
    Gopher stop words. Fully vectorized; one pass, no shuffle.

    Returns (key, n_words, mean_word_len, symbol_ratio, alpha_word_frac,
    stop_hits, passes)."""

    def f(t: pa.Table) -> pa.Table:
        # null text must not reach list_value_length: a null list length
        # becomes INT64_MIN through astype and corrupts the segment
        # offsets for the whole batch
        raw_col = pc.cast(t[text_col], pa.string())
        empty = pc.or_kleene(
            pc.is_null(raw_col), pc.equal(raw_col, "")).to_numpy(
            zero_copy_only=False).astype(bool)
        texts = pc.fill_null(raw_col, "")
        toks = pc.split_pattern(texts, " ")
        n_words = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        offsets = np.concatenate([[0], np.cumsum(n_words)])
        nz = np.maximum(n_words, 1).astype(np.float64)

        def seg_sum(vals: np.ndarray) -> np.ndarray:
            c = np.concatenate([[0.0], np.cumsum(vals)])
            return c[offsets[1:]] - c[offsets[:-1]]

        tok_lens = pc.utf8_length(flat).to_numpy(
            zero_copy_only=False).astype(np.float64)
        mean_len = seg_sum(tok_lens) / nz
        # symbol words: '#' anywhere or an ellipsis
        sym = pc.or_(
            pc.match_substring(flat, "#"),
            pc.match_substring(flat, "..."),
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        symbol_ratio = seg_sum(sym) / nz
        alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
            zero_copy_only=False).astype(np.float64)
        alpha_frac = seg_sum(alpha) / nz
        # distinct Gopher stop words present
        hits = np.zeros(len(n_words), dtype=np.int64)
        for w in _GOPHER_STOPS:
            m = pc.equal(flat, w).to_numpy(zero_copy_only=False)
            hits += (seg_sum(m.astype(np.float64)) > 0).astype(np.int64)
        # null/empty docs report 0 words (the split's single empty token
        # only served the segment-offset arithmetic) and never pass
        if empty.any():
            n_words = np.where(empty, 0, n_words)
            mean_len = np.where(empty, 0.0, mean_len)
            symbol_ratio = np.where(empty, 0.0, symbol_ratio)
            alpha_frac = np.where(empty, 0.0, alpha_frac)
            hits = np.where(empty, 0, hits)
        passes = ((n_words >= min_words) & (n_words <= max_words)
                  & (mean_len >= min_mean_word_len)
                  & (mean_len <= max_mean_word_len)
                  & (symbol_ratio <= max_symbol_ratio)
                  & (alpha_frac >= min_alpha_word_frac)
                  & (hits >= min_stop_hits))
        cols = {
            key_col: t[key_col],
            "n_words": pa.array(n_words),
            "mean_word_len": pa.array(mean_len, pa.float64()),
            "symbol_ratio": pa.array(symbol_ratio, pa.float64()),
            "alpha_word_frac": pa.array(alpha_frac, pa.float64()),
            "stop_hits": pa.array(hits, pa.int64()),
            "passes": pa.array(passes.astype(bool), pa.bool_()),
        }
        for c in carry_cols:
            cols[c] = t[c]
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def repetition_filters(ds: Dataset, key_col: str, text_col: str,
                       top_ns: tuple = (2, 3, 4),
                       dup_ns: tuple = (5, 6, 7, 8, 9, 10)) -> Dataset:
    """Gopher repetition rules (Rae et al. 2021 App. A, "repetitious
    documents"): per doc,

    - dup_line_frac: fraction of lines that are exact duplicates of an
      earlier line ('\\n'-split; single-line docs report 0);
    - top{n}_frac for n in top_ns: the share of the doc taken by the most
      frequent word n-gram (token-count share count*n/n_words — the paper
      uses the character share; the token share is tie-free and
      order-equivalent on same-n grams);
    - dup{n}_frac for n in dup_ns: share of tokens covered by n-grams that
      occur more than once.

    One pass; per doc the n-gram identity resolves by iterative pair
    densification over dense token ids (exact — no hashing, no overflow;
    no Python string joins in the hot loop)."""

    def f(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        n_docs = len(texts)
        out = {
            key_col: t[key_col],
            "dup_line_frac": np.zeros(n_docs, dtype=np.float64),
        }
        for n in top_ns:
            out[f"top{n}_frac"] = np.zeros(n_docs, dtype=np.float64)
        for n in dup_ns:
            out[f"dup{n}_frac"] = np.zeros(n_docs, dtype=np.float64)
        for i, s in enumerate(texts):
            s = s or ""
            lines = s.split("\n")
            if len(lines) > 1:
                seen: set = set()
                dups = 0
                for ln in lines:
                    if ln in seen:
                        dups += 1
                    seen.add(ln)
                out["dup_line_frac"][i] = dups / len(lines)
            toks = s.split(" ") if s else []
            nw = len(toks)
            if not nw:
                continue
            # token ids once; n-gram identity by ITERATIVE pair
            # densification — each round pairs the current dense gram id
            # with the next token id (key = g*(nw+1)+id stays < (nw+1)^2,
            # overflow-free) and re-densifies with a 1-D np.unique, so no
            # (nw, n) row-sort matrix and no hash collisions
            uniq = {w: j for j, w in enumerate(dict.fromkeys(toks))}
            ids = np.asarray([uniq[w] for w in toks], dtype=np.int64)
            for n in tuple(top_ns) + tuple(dup_ns):
                if nw < n:
                    continue
                g = ids[: nw - n + 1].copy()
                for j in range(1, n):
                    key = g * np.int64(nw + 1) + ids[j: nw - n + 1 + j]
                    _, g = np.unique(key, return_inverse=True)
                _, inv, counts = np.unique(g, return_inverse=True,
                                           return_counts=True)
                if n in top_ns:
                    out[f"top{n}_frac"][i] = counts.max() * n / nw
                if n in dup_ns:
                    # tokens covered by any repeated n-gram occurrence
                    rep = counts[inv] > 1
                    covered = np.zeros(nw, dtype=bool)
                    for j in np.flatnonzero(rep):
                        covered[j:j + n] = True
                    out[f"dup{n}_frac"][i] = covered.mean()
        cols = {key_col: out[key_col]}
        for k, v in out.items():
            if k != key_col:
                cols[k] = pa.array(v, pa.float64())
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")


def c4_filters(ds: Dataset, key_col: str, text_col: str,
               min_sentences: int = 3, min_line_words: int = 5) -> Dataset:
    """C4 page-cleaning heuristics (Raffel et al. 2020 §2.2): per-doc line
    and sentence metrics plus the page-level drop rules — terminal-
    punctuation line filter (with a minimum words-per-line), minimum
    sentence count, 'lorem ipsum' placeholder pages, and curly-brace
    (code) pages. The original's bad-words list is out of scope (no list
    shipped here); everything else is the published rule set.

    Returns (key, n_lines, n_kept_lines, n_sentences, has_lorem_ipsum,
    has_brace, passes). One vectorized pass, no shuffle."""

    def f(t: pa.Table) -> pa.Table:
        raw = pc.cast(t[text_col], pa.string())
        texts = pc.fill_null(raw, "")
        lines = pc.split_pattern(texts, "\n")
        n_lines = pc.list_value_length(lines).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(lines)
        offsets = np.concatenate([[0], np.cumsum(n_lines)])
        end_punct = pc.match_substring_regex(flat, '[.!?"]$') \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        line_words = pc.list_value_length(pc.split_pattern(flat, " ")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        kept = end_punct * (line_words >= min_line_words)
        csum = np.concatenate([[0.0], np.cumsum(kept)])
        n_kept = (csum[offsets[1:]] - csum[offsets[:-1]]).astype(np.int64)
        n_sent = pc.count_substring_regex(texts, "[.!?]").to_numpy(
            zero_copy_only=False).astype(np.int64)
        lorem = pc.match_substring(pc.utf8_lower(texts), "lorem ipsum") \
            .to_numpy(zero_copy_only=False).astype(bool)
        brace = pc.match_substring(texts, "{").to_numpy(
            zero_copy_only=False).astype(bool)
        passes = (n_sent >= min_sentences) & ~lorem & ~brace
        return pa.table({
            key_col: t[key_col],
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_kept_lines": pa.array(n_kept, pa.int64()),
            "n_sentences": pa.array(n_sent, pa.int64()),
            "has_lorem_ipsum": pa.array(lorem),
            "has_brace": pa.array(brace),
            "passes": pa.array(passes),
        })

    return ds.map_batches(f, batch_format="pyarrow")


# --- PII scrubbing + URL filtering (web-pipeline curation ops; the
# reference's hook point is the UpdateRequestProcessor chain — these are
# the processors a Common-Crawl ingest registers there) -------------------

# RE2 patterns shared verbatim with the DuckDB oracle (both engines are
# RE2-based, so replacement semantics match byte for byte)
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "[PHONE]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def pii_scrub(ds: Dataset, text_col: str, out_col: str | None = None,
              patterns=PII_PATTERNS) -> Dataset:
    """Redact emails / phone numbers / IPv4s, appending per-type match
    counts (n_email, n_phone, n_ip) and the scrubbed text. Patterns apply
    in order, each over the previous replacement's output (so a phone
    inside an already-redacted email is not double counted). One
    vectorized Arrow pass per batch; nulls pass through as empty."""
    import pyarrow.compute as pc

    dest = out_col or (text_col + "_scrubbed")

    def scrub(t: pa.Table) -> pa.Table:
        cur = pc.coalesce(t[text_col], pa.scalar("", t[text_col].type))
        for name, pat, repl in patterns:
            n = pc.count_substring_regex(cur, pat)
            t = t.append_column(f"n_{name}", pc.cast(n, pa.int64()))
            cur = pc.replace_substring_regex(cur, pat, repl)
        return t.append_column(dest, cur)

    return ds.map_batches(scrub, batch_format="pyarrow")


def url_hosts(ds: Dataset, url_col: str) -> Dataset:
    """Host extraction + per-host doc counts (the URL-blocklist filter's
    grouping half): host = authority of http(s) URLs, '' when unparsable.
    Map-side value_counts partials, then a small groupby-sum."""
    import pyarrow.compute as pc

    def hosts(t: pa.Table) -> pa.Table:
        u = pc.coalesce(t[url_col], pa.scalar("", t[url_col].type))
        ex = pc.extract_regex(u, r"^https?://(?P<host>[^/]+)")
        host = pc.coalesce(pc.struct_field(ex, "host"),
                           pa.scalar("", pa.string()))
        vc = pc.value_counts(host)
        return pa.table({
            "host": vc.field("values"),
            "cnt": pc.cast(vc.field("counts"), pa.int64()),
        })

    from ray.data.aggregate import Sum

    return (ds.select_columns([url_col])
            .map_batches(hosts, batch_format="pyarrow")
            .groupby("host").aggregate(Sum("cnt", alias_name="cnt")))


def url_filter(ds: Dataset, url_col: str, blocked_hosts=(),
               blocked_tlds=()) -> Dataset:
    """Drop docs whose URL host is blocklisted (exact host or TLD suffix)
    — the UT1/blocklist curation step. The blocklist broadcasts once via
    ray.put and is read per actor, never re-shipped per batch."""
    import ray as _ray

    ref = _ray.put((frozenset(blocked_hosts), tuple(blocked_tlds)))

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hosts_set, tlds = _ray.get(ref)
        u = pc.coalesce(t[url_col], pa.scalar("", t[url_col].type))
        ex = pc.extract_regex(u, r"^https?://(?P<host>[^/]+)")
        host = pc.coalesce(pc.struct_field(ex, "host"),
                           pa.scalar("", pa.string()))
        hv = host.to_numpy(zero_copy_only=False)
        bad = np.array([h in hosts_set or any(h.endswith("." + d) or h == d
                                              for d in tlds)
                        for h in hv], dtype=bool)
        return t.filter(pa.array(~bad))

    return ds.map_batches(keep, batch_format="pyarrow")
