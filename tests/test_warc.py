"""WARC / TREC GOV2 container readers (pipelines/sources.py read_warc /
read_trec; envelope roles of TrecContentSource.java:58 +
TrecGov2Parser.java:36) — round-trip on synthesized multi-record files."""

import gzip

import pyarrow as pa
import pytest

from lucene_solr_ray.analysis.htmlstrip import html_to_text
from lucene_solr_ray.pipelines.corpus import corpus_table, write_warc
from lucene_solr_ray.pipelines.sources import read_trec, read_warc


@pytest.fixture(scope="module")
def warc_corpus(tmp_path_factory):
    t = corpus_table(50)
    return t


def test_warc_roundtrip(tmp_path, warc_corpus, ray_session):
    p = str(tmp_path / "c.warc")
    write_warc(warc_corpus, p)
    out = read_warc(p).to_pandas().sort_values("url").reset_index(drop=True)
    src = warc_corpus.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(out) == len(src)
    assert out["url"].tolist() == src["url"].tolist()
    # html payload byte-identical through the HTTP envelope
    assert [bytes(b) for b in out["html"]] == [bytes(b) for b in src["html"]]
    # the north-rule per-row invariant: byte-identical extracted text
    assert out["text"].tolist() == [
        html_to_text(h).strip() for h in src["html"]]
    # timestamps survive (μs precision)
    assert out["warc_ts"].tolist() == src["warc_ts"].tolist()
    # doc ids deterministic + unique
    assert out["doc_id"].nunique() == len(out)


def test_warc_gzip_and_multifile(tmp_path, warc_corpus, ray_session):
    a = str(tmp_path / "a.warc.gz")
    b = str(tmp_path / "b.warc")
    write_warc(warc_corpus.slice(0, 20), a, gzip_file=True)
    write_warc(warc_corpus.slice(20, 30), b)
    out = read_warc([a, b]).to_pandas()
    assert len(out) == 50
    assert set(out["url"]) == set(warc_corpus["url"].to_pylist())


def test_warc_skips_non_response_records(tmp_path, ray_session):
    body = b"HTTP/1.1 200 OK\r\n\r\n<html><body>hi there</body></html>"
    req = b"GET / HTTP/1.1\r\n\r\n"
    blob = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Record-ID: <urn:uuid:r0>\r\n"
        b"WARC-Target-URI: http://x.example/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(req)}\r\n\r\n".encode() + req + b"\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:r1>\r\n"
        b"WARC-Target-URI: http://x.example/\r\n"
        b"WARC-Date: 2024-01-01T00:00:01Z\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode() + body + b"\r\n\r\n"
    )
    p = tmp_path / "m.warc"
    p.write_bytes(blob)
    out = read_warc(str(p)).to_pandas()
    assert len(out) == 1
    assert out["text"][0] == "hi there"


def test_trec_gov2_roundtrip(tmp_path, ray_session):
    recs = []
    for i in range(5):
        html = f"<html><body><p>doc {i} body text</p></body></html>"
        recs.append(
            f"<DOC>\n<DOCNO>GX000-00-{i:07d}</DOCNO>\n<DOCHDR>\n"
            f"http://site{i}.example/page\n"
            f"HTTP/1.1 200 OK\n"
            f"Date: Tue, 09 Dec 2003 22:39:0{i} GMT\n"
            f"Content-Type: text/html\n</DOCHDR>\n{html}\n</DOC>\n")
    p = tmp_path / "t.trec"
    p.write_bytes("".join(recs).encode())
    pg = tmp_path / "t2.trec.gz"
    pg.write_bytes(gzip.compress("".join(recs).encode()))
    for path in (str(p), str(pg)):
        out = read_trec(path).to_pandas().sort_values("docno")
        assert len(out) == 5
        assert out["docno"].tolist() == [
            f"GX000-00-{i:07d}" for i in range(5)]
        assert out["url"].tolist() == [
            f"http://site{i}.example/page" for i in range(5)]
        assert out["text"].tolist() == [
            f"doc {i} body text" for i in range(5)]
        # Date: header parsed (RFC-1123, the first reference format)
        assert out["warc_ts"].notna().all()


def test_warc_feeds_index_build(tmp_path, warc_corpus, ray_session):
    """Container -> extraction -> index -> query end-to-end."""
    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher

    p = str(tmp_path / "c.warc")
    write_warc(warc_corpus, p)
    staged = str(tmp_path / "staged")
    read_warc(p).write_parquet(staged)
    idx = str(tmp_path / "idx")
    build_index(staged, idx, key_col="doc_id", text_col="text",
                cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    s = IndexSearcher(idx)
    res = s.search("kato OR mito", k=5)
    assert res.num_rows > 0


def test_trec_legacy_date_formats(tmp_path, ray_session):
    """The reference's lenient DATE_FORMATS list
    (TrecContentSource.java:74): legacy-collection date shapes parse."""
    dates = ["Tue, 09 Dec 2003 22:39:08 GMT",   # RFC-1123
             "Tue Dec 09 16:45:08 2003",        # asctime-like
             "1 March 1994",
             "February 3, 1994",
             "910513"]
    recs = []
    for i, d in enumerate(dates):
        recs.append(
            f"<DOC>\n<DOCNO>D{i}</DOCNO>\n<DOCHDR>\n"
            f"http://s{i}.example/\nDate: {d}\n</DOCHDR>\n"
            f"<html><body>doc {i}</body></html>\n</DOC>\n")
    p = tmp_path / "legacy.trec"
    p.write_bytes("".join(recs).encode())
    out = read_trec(str(p)).to_pandas().sort_values("docno")
    assert out["warc_ts"].notna().all(), out["warc_ts"].tolist()
    years = [t.year for t in out["warc_ts"]]
    assert years == [2003, 2003, 1994, 1994, 1991]
