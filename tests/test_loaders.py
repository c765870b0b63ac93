"""Solr-style document loaders (handler/loader/JsonLoader.java:79,
CSVLoader.java:36): JSON/CSV corpora normalize to the engine's corpus
contract and an index built from them matches the parquet-built index."""

import csv
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.pipelines.cli import main as cli_main
from lucene_solr_ray.pipelines.sources import (
    normalize_docs,
    read_csv_docs,
    read_json_docs,
    stage_corpus,
)
from lucene_solr_ray.search import IndexSearcher

DOCS = [
    {"id": i, "text": ("apple banana doc%d" % i) if i % 3
     else ("cherry banana doc%d" % i), "lang": "en"}
    for i in range(40)
]


def _write_corpora(tmp_path):
    jp = str(tmp_path / "c.json")
    with open(jp, "w") as f:
        for d in DOCS:
            f.write(json.dumps(d) + "\n")
    cp = str(tmp_path / "c.csv")
    with open(cp, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["id", "text", "lang"])
        w.writeheader()
        w.writerows(DOCS)
    pp = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([d["id"] for d in DOCS], pa.int64()),
        "text": pa.array([d["text"] for d in DOCS], pa.large_string()),
        "lang": pa.array([d["lang"] for d in DOCS], pa.large_string()),
    }), pp)
    return jp, cp, pp


def test_json_csv_loaders_normalize(ray_session, tmp_path):
    jp, cp, _ = _write_corpora(tmp_path)
    tj = pa.concat_tables(
        [b for b in read_json_docs([jp]).iter_batches(batch_format="pyarrow")])
    tc = pa.concat_tables(
        [b for b in read_csv_docs([cp]).iter_batches(batch_format="pyarrow")])
    for t in (tj, tc):
        t = t.sort_by("doc_id")
        assert t.column_names[0] == "doc_id"
        assert t["doc_id"].type == pa.int64()
        assert t["doc_id"].to_pylist() == [d["id"] for d in DOCS]
        assert t["text"].to_pylist() == [d["text"] for d in DOCS]


def test_string_ids_hash_deterministically(ray_session, tmp_path):
    jp = str(tmp_path / "s.json")
    with open(jp, "w") as f:
        for d in DOCS[:10]:
            f.write(json.dumps({"id": "url://%d" % d["id"],
                                "text": d["text"]}) + "\n")
    a = [b for b in read_json_docs([jp]).iter_batches(batch_format="pyarrow")]
    b = [b for b in read_json_docs([jp]).iter_batches(batch_format="pyarrow")]
    ids_a = sorted(pa.concat_tables(a)["doc_id"].to_pylist())
    ids_b = sorted(pa.concat_tables(b)["doc_id"].to_pylist())
    assert ids_a == ids_b                       # deterministic
    assert len(set(ids_a)) == 10                # distinct
    assert all(i >= 0 for i in ids_a)           # 63-bit non-negative


def test_cli_build_from_each_format_matches(ray_session, tmp_path, capsys):
    jp, cp, pp = _write_corpora(tmp_path)
    results = {}
    for fmt, corpus in [("parquet", pp), ("json", jp), ("csv", cp)]:
        idx = str(tmp_path / ("idx_" + fmt))
        argv = ["build", "--corpus", corpus, "--index-dir", idx,
                "--num-shards", "2", "--num-buckets", "4"]
        if fmt != "parquet":
            argv += ["--format", fmt]
        cli_main(argv)
        capsys.readouterr()
        s = IndexSearcher(idx)
        t = s.match_all("banana")
        results[fmt] = (t["doc_id"].to_pylist(), t["score"].to_pylist())
    assert results["json"] == results["parquet"]
    assert results["csv"] == results["parquet"]


def test_stage_corpus_overwrites_stale(ray_session, tmp_path):
    import ray.data

    out = str(tmp_path / "staged")
    p1 = stage_corpus(normalize_docs(
        ray.data.from_items([{"id": 1, "text": "aa"}])), out)
    p2 = stage_corpus(normalize_docs(
        ray.data.from_items([{"id": 2, "text": "bb"}])), out)
    t = pq.read_table(p2)
    assert t.num_rows == 1 and t["doc_id"].to_pylist() == [2]


def test_large_sparse_doc_ids_end_to_end(ray_session, tmp_path):
    """63-bit doc ids through the WHOLE index lifecycle: long posting
    lists (FOR blocks with >32-bit gaps), search, delete, forceMerge.
    Guards against the codec silently truncating ids mod 2^32."""
    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.index.maintenance import (
        check_index,
        delete_by_ids,
        force_merge,
    )

    n = 400
    rng = np.random.default_rng(5)
    ids = np.sort(rng.choice(2**62, size=n, replace=False)).astype(np.int64)
    texts = ["common tok%d" % (i % 7) for i in range(n)]
    p = str(tmp_path / "big.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.large_string())}), p)
    idx = str(tmp_path / "bigidx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))

    s = IndexSearcher(idx)
    got = sorted(s.match_all("common")["doc_id"].to_pylist())
    assert got == ids.tolist()                      # ids survive exactly
    t3 = sorted(s.match_all("tok3")["doc_id"].to_pylist())
    assert t3 == [int(i) for i, j in zip(ids, range(n)) if j % 7 == 3]

    delete_by_ids(idx, ids[:5].tolist())
    force_merge(idx)
    s2 = IndexSearcher(idx)
    assert sorted(s2.match_all("common")["doc_id"].to_pylist()) == ids[5:].tolist()
    check_index(idx)


def test_read_sql(tmp_path, ray_session):
    from lucene_solr_ray.pipelines.sources import read_sql

    t = pa.table({"k": pa.array([3, 1, 2], pa.int64()),
                  "v": pa.array(["c", "a", "b"])})
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    ds = read_sql("SELECT k, v FROM src WHERE k >= 2 ORDER BY k",
                  views={"src": p})
    got = ds.to_pandas()
    assert got["k"].tolist() == [2, 3]
    assert got["v"].tolist() == ["b", "c"]
    # empty result keeps a usable (empty) dataset
    ds0 = read_sql("SELECT k FROM src WHERE k > 100", views={"src": p})
    assert ds0.count() == 0


def test_read_enwiki(tmp_path, ray_session):
    from lucene_solr_ray.pipelines.sources import read_enwiki

    xml = """<mediawiki>
<page>
  <title>First &amp; Best</title>
  <id>10</id>
  <revision><id>999</id>
    <timestamp>2004-01-01T00:00:00Z</timestamp>
    <text xml:space="preserve">hello
world\ttabbed &lt;b&gt;</text>
  </revision>
</page>
<page>
  <title>Image:Logo.png</title>
  <id>11</id>
  <revision><timestamp>2004-01-02T00:00:00Z</timestamp>
  <text>skip me</text></revision>
</page>
<page>
  <title>Second</title>
  <id>12</id>
  <revision><timestamp>2004-01-03T00:00:00Z</timestamp>
  <text>body two</text></revision>
</page>
</mediawiki>"""
    p = tmp_path / "dump.xml"
    p.write_text(xml)
    got = read_enwiki(str(p)).to_pandas().sort_values("doc_id")
    # Image: page skipped; first <id> wins (page id 10, not revision 999)
    assert got["doc_id"].tolist() == [10, 12]
    assert got["title"].tolist() == ["First & Best", "Second"]
    assert got["date"].iloc[0] == "2004-01-01T00:00:00Z"
    assert got["text"].iloc[0] == "hello world tabbed <b>"
    # keep_images retains the Image: page
    all3 = read_enwiki(str(p), keep_images=True).to_pandas()
    assert sorted(all3["doc_id"].tolist()) == [10, 11, 12]
