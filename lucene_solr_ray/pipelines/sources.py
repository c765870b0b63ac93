"""Additional corpus sources (the reference's benchmark feed readers and
Solr document loaders).

read_line_docs replicates LineDocSource (lucene/benchmark/.../feeds/
LineDocSource.java:53): one document per line, `title TAB date TAB body`,
parsed vectorized from ray.data.read_text.

read_json_docs / read_csv_docs replicate the Solr update loaders
(handler/loader/JsonLoader.java:79, handler/loader/CSVLoader.java:36):
each JSON object / CSV row becomes one document, the unique-key field maps
to the engine's int64 doc_id (string keys hash deterministically), and the
normalized stream stages to parquet shards for build/append — the Ray-Data
analogue of the update-request chain feeding the IndexWriter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset


def read_line_docs(paths, start_id: int = 0) -> Dataset:
    """Line-doc corpus -> Dataset(doc_id, title, date, text).

    Doc ids are assigned per line hash of (title, body) — deterministic and
    independent of read parallelism (the engine needs stable int64 keys)."""
    ds = ray.data.read_text(paths)

    def parse(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["text"], "\t", max_splits=2)
        lists = parts.to_pylist()
        titles, dates, bodies = [], [], []
        for row in lists:
            row = row or []
            titles.append(row[0] if len(row) > 0 else "")
            dates.append(row[1] if len(row) > 1 else "")
            bodies.append(row[2] if len(row) > 2 else "")
        from zlib import crc32

        ids = np.array(
            [crc32(f"{a}\x1f{b}".encode()) for a, b in zip(titles, bodies)],
            dtype=np.int64,
        )
        return pa.table(
            {
                "doc_id": pa.array(ids + start_id, pa.int64()),
                "title": pa.array(titles, pa.string()),
                "date": pa.array(dates, pa.string()),
                "text": pa.array(bodies, pa.large_string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")


def normalize_docs(ds: Dataset, id_field: str = "id",
                   text_col: str = "text") -> Dataset:
    """Map loader output onto the engine's corpus contract: int64 `doc_id`
    + large_string text column. Integer unique keys pass through; string or
    absent keys get a deterministic 63-bit polynomial hash (id assignment
    must not depend on read parallelism). The reference's equivalent is the
    uniqueKey handling in the update chain (AddUpdateCommand.java:92)."""
    from ..util.polyhash import poly_hash_strings

    def norm(t: pa.Table) -> pa.Table:
        cols = dict(zip(t.column_names, t.columns))
        key = cols.pop(id_field, None)
        if key is not None and pa.types.is_integer(key.type):
            ids = pa.array(
                key.to_numpy(zero_copy_only=False).astype(np.int64), pa.int64())
        elif key is not None:
            h = poly_hash_strings([x if x is None else str(x)
                                   for x in key.to_pylist()])
            ids = pa.array((h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64),
                           pa.int64())
        else:  # no unique key: hash the text body
            h = poly_hash_strings(cols[text_col].to_pylist())
            ids = pa.array((h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64),
                           pa.int64())
        out = {"doc_id": ids}
        for name, col in cols.items():
            if pa.types.is_string(col.type):
                col = col.cast(pa.large_string())
            out[name] = col
        return pa.table(out)

    return ds.map_batches(norm, batch_format="pyarrow")


def read_json_docs(paths, id_field: str = "id",
                   text_col: str = "text") -> Dataset:
    """NDJSON corpus -> normalized Dataset (JsonLoader.java:79: one JSON
    object per document)."""
    return normalize_docs(ray.data.read_json(paths), id_field, text_col)


def read_csv_docs(paths, id_field: str = "id",
                  text_col: str = "text") -> Dataset:
    """CSV corpus -> normalized Dataset (CSVLoader.java:36: header row
    names the fields, one row per document)."""
    return normalize_docs(ray.data.read_csv(paths), id_field, text_col)


def stage_corpus(ds: Dataset, out_dir: str) -> list[str]:
    """Write a normalized document stream as parquet shards and return the
    file list — the ingestion buffer between a loader and build/append
    (streaming write; block count = read parallelism, so a failed ingest
    re-runs only its own staging dir)."""
    import glob
    import os
    import shutil

    if os.path.isdir(out_dir):  # stale staging from a prior run
        shutil.rmtree(out_dir)
    ds.write_parquet(out_dir)
    return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))


def read_sql(sql: str, views: dict[str, str] | None = None,
             batch_rows: int = 65536) -> Dataset:
    """JDBCStream role (solr/solrj/.../io/stream/JDBCStream.java:126): pull
    tuples from a SQL engine into the dataflow.

    The reference's JDBCStream is a SINGLE connection streaming tuples
    through one node; this is the same shape on DuckDB — the query runs
    once on the driver, record batches stream out zero-copy (Arrow) and
    land as Dataset blocks in the object store, so everything downstream
    is distributed. `views` maps table names to parquet paths registered
    before the query. For partition-parallel extraction at scale, shard
    the query by key range and union the datasets (the Solr pattern:
    parallel(jdbc(...)) with a partitioning WHERE clause)."""
    import duckdb

    con = duckdb.connect()
    try:
        for name, path in (views or {}).items():
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
        reader = con.execute(sql).fetch_record_batch(batch_rows)
        tables = []
        while True:
            try:
                tables.append(pa.Table.from_batches([reader.read_next_batch()]))
            except StopIteration:
                break
        if not tables:
            return ray.data.from_arrow(pa.table({}))
        # one block per record batch: downstream map_batches parallelizes
        return ray.data.from_arrow(tables)
    finally:
        con.close()


_ENT = {"&lt;": "<", "&gt;": ">", "&quot;": '"', "&apos;": "'", "&amp;": "&"}


def _xml_unescape(s: str) -> str:
    # &amp; last so "&amp;lt;" decodes to "&lt;" (one level, like SAX)
    for k in ("&lt;", "&gt;", "&quot;", "&apos;", "&amp;"):
        if k in s:
            s = s.replace(k, _ENT[k])
    return s


def read_enwiki(paths, keep_images: bool = False) -> Dataset:
    """EnwikiContentSource (benchmark/byTask/feeds/EnwikiContentSource.java:54):
    Wikipedia XML dump -> Dataset(doc_id, title, date, text).

    Parity with the reference's SAX handler: per <page> it takes the title,
    the FIRST <id> (page id; later revision/contributor ids are ignored,
    line 175), the <timestamp>, and the <text> body; pages whose title
    starts with "Image:" are skipped unless keep_images (line 141); tabs
    and newlines in the body and tabs in title/date become spaces
    (lines 143-145).

    One read task per dump file (the reference is likewise a single
    sequential SAX pass per stream); at scale pre-split the dump into many
    .xml chunks at <page> boundaries so the parse fans out."""
    import re

    ds = ray.data.read_binary_files(paths)
    page_re = re.compile(rb"<page>(.*?)</page>", re.S)
    title_re = re.compile(r"<title>(.*?)</title>", re.S)
    id_re = re.compile(r"<id>(\d+)</id>")
    ts_re = re.compile(r"<timestamp>(.*?)</timestamp>", re.S)
    text_re = re.compile(r"<text[^>]*>(.*?)</text>", re.S)

    def parse(t: pa.Table) -> pa.Table:
        ids, titles, dates, bodies = [], [], [], []
        for blob in t["bytes"].to_pylist():
            for m in page_re.finditer(blob):
                page = m.group(1).decode("utf-8", errors="replace")
                tm = title_re.search(page)
                title = _xml_unescape(tm.group(1)) if tm else ""
                if not keep_images and title.startswith("Image:"):
                    continue
                im = id_re.search(page)
                xm = text_re.search(page)
                if im is None or xm is None:
                    continue
                sm = ts_re.search(page)
                ids.append(int(im.group(1)))
                titles.append(title.replace("\t", " "))
                dates.append((sm.group(1) if sm else "").replace("\t", " "))
                bodies.append(
                    _xml_unescape(xm.group(1)).replace("\t", " ").replace("\n", " "))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "title": pa.array(titles, pa.string()),
            "date": pa.array(dates, pa.string()),
            "text": pa.array(bodies, pa.large_string()),
        })

    return ds.map_batches(parse, batch_format="pyarrow")


# --- WARC / TREC record containers ----------------------------------------

def _ts_from_iso(s: str | None) -> "np.datetime64 | None":
    if not s:
        return None
    try:
        return np.datetime64(s.rstrip("Z"), "us")
    except ValueError:
        return None


def read_warc(paths, extract_text: bool = True) -> Dataset:
    """WARC/1.0 container reader (the Common-Crawl envelope; the
    reference's analogous container feed is TrecContentSource.java:58 over
    the GOV2 TREC envelope — see read_trec). One read task per .warc(.gz)
    file, the standard CC processing granularity; records are walked by
    Content-Length inside the task, so a multi-GB file streams without
    regex backtracking.

    Emits the north-rule input shape: (doc_id, url, warc_ts, html, text) —
    doc_id = poly-hash(WARC-Record-ID | url) as int64; only 'response'
    records are kept; the HTTP header block is stripped from the payload;
    text is the char-identical html_to_text extraction (htmlstrip.py:115)
    unless extract_text=False."""
    import gzip

    from ..analysis.htmlstrip import html_to_text
    from ..util.polyhash import poly_hash_strings

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse(t: pa.Table) -> pa.Table:
        ids_src, urls, tss, htmls = [], [], [], []
        for blob, path in zip(t["bytes"].to_pylist(), t["path"].to_pylist()):
            if blob[:2] == b"\x1f\x8b":
                # magic-gated: ray's read_binary_files already inflates
                # .gz paths, so only decompress when bytes are really gzip
                blob = gzip.decompress(blob)
            pos, n = 0, len(blob)
            while pos < n:
                # seek the next record header
                start = blob.find(b"WARC/", pos)
                if start < 0:
                    break
                hdr_end = blob.find(b"\r\n\r\n", start)
                if hdr_end < 0:
                    break
                headers = {}
                for line in blob[start:hdr_end].split(b"\r\n")[1:]:
                    k, _, v = line.partition(b":")
                    headers[k.strip().lower()] = v.strip()
                try:
                    clen = int(headers.get(b"content-length", b"0"))
                except ValueError:
                    clen = 0
                body = blob[hdr_end + 4:hdr_end + 4 + clen]
                pos = hdr_end + 4 + clen
                if headers.get(b"warc-type") != b"response":
                    continue
                url = headers.get(b"warc-target-uri", b"").decode(
                    "utf-8", errors="replace")
                rec_id = headers.get(b"warc-record-id", b"").decode(
                    "utf-8", errors="replace")
                # payload = HTTP response: drop its header block
                he = body.find(b"\r\n\r\n")
                html = body[he + 4:] if he >= 0 else body
                ids_src.append(rec_id or url)
                urls.append(url)
                tss.append(_ts_from_iso(
                    headers.get(b"warc-date", b"").decode("ascii",
                                                          errors="replace")))
                htmls.append(html)
        ids = poly_hash_strings(ids_src).view(np.int64)
        cols = {
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.large_binary()),
        }
        if extract_text:
            cols["text"] = pa.array(
                [html_to_text(h).strip() for h in htmls], pa.large_string())
        return pa.table(cols)

    return ds.map_batches(parse, batch_format="pyarrow")


def read_trec(paths, extract_text: bool = True) -> Dataset:
    """TREC GOV2 container reader (TrecContentSource.java:58 +
    TrecGov2Parser.java:36): records are <DOC>..</DOC> blocks holding
    <DOCNO>, a <DOCHDR> HTTP envelope (first line = the fetch URL,
    'Date: ' header = the crawl date), then raw HTML. One read task per
    file, like the reference's sequential per-file reader.

    Emits (doc_id, url, warc_ts, html, text): doc_id = poly-hash(DOCNO),
    warc_ts parsed from the 'Date: ' header when present, trying the
    lenient format list of TrecContentSource.DATE_FORMATS (RFC-1123
    first, then the legacy-collection shapes: 'EEE MMM dd HH:mm:ss yyyy',
    'dd MMM yyyy', 'MMM dd, yyyy', 'yyMMdd')."""
    import gzip
    import re
    from datetime import datetime, timezone
    from email.utils import parsedate_to_datetime

    # TrecContentSource.java:74 DATE_FORMATS, the strptime-expressible set
    _fmts = ("%a %b %d %H:%M:%S %Y", "%d %B %Y", "%d %b %Y",
             "%B %d, %Y", "%b %d, %Y", "%y%m%d")

    def _parse_trec_date(txt: str):
        try:
            return parsedate_to_datetime(txt)
        except (ValueError, TypeError):
            pass
        for f in _fmts:
            try:
                return datetime.strptime(txt, f).replace(tzinfo=timezone.utc)
            except ValueError:
                continue
        return None

    from ..analysis.htmlstrip import html_to_text
    from ..util.polyhash import poly_hash_strings

    ds = ray.data.read_binary_files(paths, include_paths=True)
    doc_re = re.compile(rb"<DOC>(.*?)</DOC>", re.S)
    docno_re = re.compile(rb"<DOCNO>\s*(.*?)\s*</DOCNO>", re.S)
    hdr_re = re.compile(rb"<DOCHDR>\s*(.*?)\s*</DOCHDR>", re.S)
    date_re = re.compile(rb"^Date:\s*(.+?)\s*$", re.M)

    def parse(t: pa.Table) -> pa.Table:
        nos, urls, tss, htmls = [], [], [], []
        for blob, path in zip(t["bytes"].to_pylist(), t["path"].to_pylist()):
            if blob[:2] == b"\x1f\x8b":
                # magic-gated: ray's read_binary_files already inflates
                # .gz paths, so only decompress when bytes are really gzip
                blob = gzip.decompress(blob)
            for m in doc_re.finditer(blob):
                rec = m.group(1)
                nm = docno_re.search(rec)
                if nm is None:
                    continue
                hm = hdr_re.search(rec)
                url, ts = "", None
                html = rec
                if hm is not None:
                    hdr = hm.group(1)
                    url = hdr.split(b"\n", 1)[0].strip().decode(
                        "utf-8", errors="replace")
                    dm = date_re.search(hdr)
                    if dm is not None:
                        dt = _parse_trec_date(
                            dm.group(1).decode("ascii", errors="replace"))
                        if dt is not None:
                            ts = np.datetime64(
                                int(dt.timestamp() * 1_000_000), "us")
                    html = rec[hm.end():]
                nos.append(nm.group(1).decode("utf-8", errors="replace"))
                urls.append(url)
                tss.append(ts)
                htmls.append(html.strip())
        ids = poly_hash_strings(nos).view(np.int64)
        cols = {
            "doc_id": pa.array(ids, pa.int64()),
            "docno": pa.array(nos, pa.string()),
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.large_binary()),
        }
        if extract_text:
            cols["text"] = pa.array(
                [html_to_text(h).strip() for h in htmls], pa.large_string())
        return pa.table(cols)

    return ds.map_batches(parse, batch_format="pyarrow")
