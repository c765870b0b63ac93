import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.pipelines import synthesize_corpus
from lucene_solr_ray.pipelines.flagship import dedup_recrawls
from lucene_solr_ray.search import IndexSearcher


def test_dedup_recrawls(tmp_path, ray_session):
    # duplicate urls with newer warc_ts must win
    base = pq.read_table(synthesize_corpus(100, str(tmp_path / "c.parquet")))
    dup = base.slice(0, 10)
    newer = dup.set_column(
        dup.column_names.index("warc_ts"), "warc_ts",
        pa.array([v.as_py() + __import__("datetime").timedelta(days=30)
                  for v in dup["warc_ts"]], pa.timestamp("us")),
    )
    newer = newer.set_column(
        newer.column_names.index("doc_id"), "doc_id",
        pa.array([v.as_py() + 1000 for v in dup["doc_id"]], pa.int64()),
    )
    both = pa.concat_tables([base, newer])
    src = str(tmp_path / "recrawl.parquet")
    pq.write_table(both, src)
    out = dedup_recrawls([src], str(tmp_path / "dedup"))
    t = pq.read_table(out)
    assert t.num_rows == 100
    kept = dict(zip(t["url"].to_pylist(), t["doc_id"].to_pylist()))
    for u, d in zip(newer["url"].to_pylist(), newer["doc_id"].to_pylist()):
        assert kept[u] == d  # newer crawl won


def test_resume_extends_with_new_files(tmp_path, ray_session):
    d = synthesize_corpus(400, str(tmp_path / "multi"), n_files=2)
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4, batch_size=128,
                           files_per_chunk=1)
    # interrupted run: only the first file made it
    part = str(tmp_path / "idx_part")
    build_index(files[:1], part, key_col="doc_id", text_col="text", cfg=cfg)
    # resumed run over the full input reuses the first chunk's stage-1 output
    m = build_index(files, part, key_col="doc_id", text_col="text", cfg=cfg)
    assert len(m["lineage"]) == 2
    fresh = str(tmp_path / "idx_fresh")
    build_index(files, fresh, key_col="doc_id", text_col="text", cfg=cfg)
    a = IndexSearcher(part).search("kato OR mito", k=10)
    b = IndexSearcher(fresh).search("kato OR mito", k=10)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_cli_build_search_check(tmp_path, ray_session):
    from lucene_solr_ray.pipelines import cli

    corpus = synthesize_corpus(150, str(tmp_path / "cli.parquet"))
    idx = str(tmp_path / "cli_idx")
    cli.main(["build", "--corpus", corpus, "--index-dir", idx,
              "--num-shards", "2", "--num-buckets", "4", "--html-col", "html"])
    cli.main(["search", "--index-dir", idx, "--query", "ka OR to", "-k", "5"])
    cli.main(["check", "--index-dir", idx])


def test_read_line_docs(tmp_path, ray_session):
    from lucene_solr_ray.pipelines.sources import read_line_docs

    p = tmp_path / "docs.txt"
    p.write_text(
        "Title One\t2024-01-01\tthe quick brown fox\n"
        "Title Two\t2024-01-02\tjumps over the lazy dog\n"
    )
    ds = read_line_docs(str(p))
    df = ds.to_pandas().sort_values("title").reset_index(drop=True)
    assert list(df["title"]) == ["Title One", "Title Two"]
    assert df["text"][0] == "the quick brown fox"
    assert df["doc_id"].nunique() == 2


def test_cli_analysis_config_flags(tmp_path, ray_session, capsys):
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.pipelines import cli

    corpus = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["John's searching tool",
                          "the searcher found maths"])}), corpus)
    idx = str(tmp_path / "idx")
    cli.main(["build", "--corpus", corpus, "--index-dir", idx,
              "--num-shards", "2", "--num-buckets", "4",
              "--stemmer", "porter", "--protected-words", "maths",
              "--token-filters", '["english_possessive", ["length", 2, 64]]',
              "--store-offsets"])
    capsys.readouterr()
    cli.main(["search", "--index-dir", idx, "--query", "john's", "-k", "3"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["doc_id"] for r in out] == [0]
    cli.main(["search", "--index-dir", idx, "--query", "maths", "-k", "3"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["doc_id"] for r in out] == [1]


def test_dedup_recrawls_tie_breaks_to_highest_id(tmp_path, ray_session):
    """Equal warc_ts re-crawls must resolve deterministically (max doc_id),
    independent of partitioning — the version max-wins tie rule."""
    base = pq.read_table(synthesize_corpus(50, str(tmp_path / "c2.parquet")))
    dup = base.slice(0, 10)
    dup = dup.set_column(
        dup.column_names.index("doc_id"), "doc_id",
        pa.array([v.as_py() + 500 for v in dup["doc_id"]], pa.int64()))
    src = str(tmp_path / "tie.parquet")
    pq.write_table(pa.concat_tables([base, dup]), src)
    out = pq.read_table(dedup_recrawls([src], str(tmp_path / "dedup2")))
    assert out.num_rows == 50
    kept = dict(zip(out["url"].to_pylist(), out["doc_id"].to_pylist()))
    for u, d in zip(dup["url"].to_pylist(), dup["doc_id"].to_pylist()):
        assert kept[u] == d  # higher id wins the tie


def test_dedup_recrawls_double_ingest_and_null_ts(tmp_path, ray_session):
    """The same WARC ingested twice (identical rows) must collapse to one
    row per url; null warc_ts rows must lose, not crash the join."""
    base = pq.read_table(synthesize_corpus(30, str(tmp_path / "c3.parquet")))
    # identical re-ingest of the whole file + one null-ts re-crawl of url 0
    null_row = base.slice(0, 1).set_column(
        base.column_names.index("warc_ts"), "warc_ts",
        pa.array([None], pa.timestamp("us")))
    both = pa.concat_tables([base, base, null_row])
    src = str(tmp_path / "dbl.parquet")
    pq.write_table(both, src)
    out = pq.read_table(dedup_recrawls([src], str(tmp_path / "dedup3")))
    assert out.num_rows == 30
    assert len(set(out["url"].to_pylist())) == 30
    # null-ts re-crawl lost to the real timestamp
    assert out.filter(
        __import__("pyarrow.compute", fromlist=["equal"]).equal(
            out["doc_id"], 0))["warc_ts"][0].as_py() is not None


def test_dedup_recrawls_single_url(tmp_path, ray_session):
    """One distinct url (empty hash partitions) must not lose schemas."""
    base = pq.read_table(synthesize_corpus(5, str(tmp_path / "c4.parquet")))
    one = base.slice(0, 1)
    src = str(tmp_path / "one.parquet")
    pq.write_table(one, src)
    out = pq.read_table(dedup_recrawls([src], str(tmp_path / "dedup4")))
    assert out.num_rows == 1
