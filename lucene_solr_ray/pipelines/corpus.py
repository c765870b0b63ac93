"""Deterministic Common-Crawl-style corpus synthesis (FIXTURES.md §F1).

Schema is exactly the BASELINE.json input_hint:
  (url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)
plus a doc_id:int64 key for the engine.

Everything is seeded (default 42) and reproducible: Zipf-distributed
vocabulary (~10k terms, s≈1.1) for head-term skew, log-normal doc lengths,
a small slice of docs containing >255-char tokens (the drop-not-truncate
tokenizer rule), and mixed-script docs. `html` wraps `text` in one of
several templates covering the html-strip cases (tags, comments, entities,
script/style, CDATA); the invariant html_to_text(html).strip() == text
holds byte-identically for every row (block tags frame the body text in
newlines, reference HTMLStripCharFilter semantics) and is pinned by tests.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 10_000
ZIPF_S = 1.1

_SYL = ["ka", "to", "mi", "ra", "zu", "ne", "bo", "li", "sha", "ver",
        "dun", "pel", "gor", "tis", "wam", "hex", "jor", "fen", "cry", "pli"]


def _make_vocab(size: int) -> list[str]:
    out = []
    i = 0
    while len(out) < size:
        s = ""
        j = i
        while True:
            s += _SYL[j % len(_SYL)]
            j //= len(_SYL)
            if j == 0:
                break
        out.append(s + str(i % 7) if i % 13 == 0 else s)
        i += 1
    return out[:size]


_TEMPLATES = [
    "<html><head></head><body><p>{t}</p></body></html>",
    "<html><head><script>var x = 1 < 2 && 3 > 2;</script><style>p{{color:red}}</style></head>"
    "<body><!-- crawler comment --><div class=\"main\">{t}</div></body></html>",
    "<?xml version=\"1.0\"?><!DOCTYPE html><html><body><article>{t}</article>"
    "<!-- trailing --></body></html>",
    "<html><body><p><![CDATA[{raw}]]></p></body></html>",
]


def _wrap_html(text: str, variant: int) -> bytes:
    tpl = _TEMPLATES[variant % len(_TEMPLATES)]
    if "{raw}" in tpl:
        h = tpl.format(raw=text)
    else:
        h = tpl.format(t=_html.escape(text))
    return h.encode("utf-8")


def corpus_table(n_docs: int, seed: int = 42, doclen_mu: float = 4.2,
                 doclen_sigma: float = 0.9) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = np.asarray(_make_vocab(VOCAB_SIZE), dtype=object)
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    probs = ranks ** (-ZIPF_S)
    probs /= probs.sum()

    doclens = np.clip(
        rng.lognormal(mean=doclen_mu, sigma=doclen_sigma, size=n_docs), 10, 5000
    ).astype(np.int64)
    total = int(doclens.sum())
    tokens = rng.choice(VOCAB_SIZE, size=total, p=probs)
    offsets = np.concatenate([[0], np.cumsum(doclens)])

    overlong = "q" * 300  # dropped-not-truncated by the tokenizer
    mixed = "数据 处理 エンジン"  # CJK/Katakana golden-script material

    texts = []
    words = vocab[tokens]
    for i in range(n_docs):
        ws = words[offsets[i]:offsets[i + 1]].tolist()
        if i % 100 == 37:
            ws.insert(len(ws) // 2, overlong)
        if i % 97 == 11:
            ws.append(mixed)
        texts.append(" ".join(ws))

    base_ts = np.datetime64("2024-01-01T00:00:00", "us")
    jitter = rng.integers(0, 86_400_000_000, size=n_docs)
    ts = base_ts + np.arange(n_docs) * np.int64(60_000_000) + jitter

    urls = [f"https://site{i % 1000}.example/page/{i}" for i in range(n_docs)]
    html_col = [_wrap_html(t, i) for i, t in enumerate(texts)]
    langs = ["en" if i % 10 else ("de", "fr", "es", "zh", "ja")[i // 10 % 5] for i in range(1, n_docs + 1)]

    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(html_col, pa.large_binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def synthesize_corpus(n_docs: int, out_path: str, seed: int = 42,
                      row_group_size: int = 4096, doclen_mu: float = 4.2,
                      doclen_sigma: float = 0.9, n_files: int = 1) -> str:
    """Write the corpus as one parquet file, or as a directory of n_files
    part files (ray.data parallelizes reads per file — a single-file corpus
    serializes the read stage, just like a single giant file would on a real
    cluster)."""
    t = corpus_table(n_docs, seed, doclen_mu, doclen_sigma)
    if n_files <= 1:
        pq.write_table(t, out_path, row_group_size=row_group_size)
        return out_path
    import os

    os.makedirs(out_path, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files
    for i in range(n_files):
        part = t.slice(i * per, per)
        if part.num_rows == 0:
            break
        pq.write_table(
            part, os.path.join(out_path, f"part-{i:05d}.parquet"),
            row_group_size=row_group_size,
        )
    return out_path


def write_warc(table: pa.Table, out_path: str, gzip_file: bool = False) -> str:
    """Serialize (url, warc_ts, html) rows to a real multi-record WARC/1.0
    file (response records with an HTTP envelope), the inverse of
    sources.read_warc — test/bench fixture generation only; the reference
    ships TREC fixtures the same way (trecdocs.zip in benchmark/conf)."""
    recs = []
    for i in range(table.num_rows):
        url = table["url"][i].as_py()
        ts = table["warc_ts"][i].as_py()
        html = table["html"][i].as_py() or b""
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
        iso = (ts.strftime("%Y-%m-%dT%H:%M:%S.%f")
               if ts is not None else "2024-01-01T00:00:00.000000") + "Z"
        hdr = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {iso}\r\n"
            f"Content-Length: {len(http)}\r\n"
        ).encode()
        # hdr already ends with CRLF; one more CRLF terminates the header
        # block (WARC/1.0: headers CRLF CRLF block CRLF CRLF)
        recs.append(hdr + b"\r\n" + http + b"\r\n\r\n")
    blob = b"".join(recs)
    if gzip_file:
        import gzip as _gz

        blob = _gz.compress(blob)
    with open(out_path, "wb") as f:
        f.write(blob)
    return out_path
