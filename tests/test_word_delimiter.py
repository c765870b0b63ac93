"""WordDelimiterGraphFilter subset: part generation, catenation, index
integration (posInc-0 insertions, tf accounting, check_index)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.analysis import word_delimiter_parts
from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.maintenance import check_index
from lucene_solr_ray.search import IndexSearcher

TEXTS = [
    "the PowerShot500 camera",      # 0
    "XMLHttpRequest api design",    # 1
    "plain words only here",        # 2
    "WiFi and wifi duplicated",     # 3
]


def test_part_generation():
    assert word_delimiter_parts("PowerShot500") == [
        "power", "shot", "500", "powershot"]
    assert word_delimiter_parts("XMLHttpRequest") == [
        "xml", "http", "request", "xmlhttprequest"]
    assert word_delimiter_parts("WiFi") == ["wi", "fi", "wifi"]
    assert word_delimiter_parts("plain") == []
    assert word_delimiter_parts("UPPER") == []
    assert word_delimiter_parts("x500") == ["x", "500"]


@pytest.fixture(scope="module")
def wd_index(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("wd")
    p = str(tmp / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(len(TEXTS), dtype=np.int64)),
        "text": pa.array(TEXTS, pa.string()),
    }), p)
    idx = str(tmp / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4, word_delimiter=True))
    return idx


def test_parts_are_searchable(wd_index):
    s = IndexSearcher(wd_index)
    assert s.search("power", k=10)["doc_id"].to_pylist() == [0]
    assert s.search("shot", k=10)["doc_id"].to_pylist() == [0]
    assert s.search("500", k=10)["doc_id"].to_pylist() == [0]
    assert s.search("powershot", k=10)["doc_id"].to_pylist() == [0]
    assert sorted(s.search("xml OR request", k=10)["doc_id"].to_pylist()) == [1]
    # the original token stays (lowercased)
    assert s.search("powershot500", k=10)["doc_id"].to_pylist() == [0]
    # catenated "wifi" from WiFi joins the literal "wifi" occurrence
    assert s.search("wifi", k=10)["doc_id"].to_pylist() == [3]


def test_positions_preserved_for_phrases(wd_index):
    s = IndexSearcher(wd_index)
    # original tokens keep their positions, so the original-token phrase
    # still matches across the expanded token
    assert s.search('"powershot500 camera"', k=10)["doc_id"].to_pylist() == [0]
    # parts stack AT the original's position (documented flattening):
    # "power camera" is adjacent-after via the part's position
    assert s.search('"power camera"', k=10)["doc_id"].to_pylist() == [0]


def test_doclen_excludes_insertions_and_check_index_passes(wd_index):
    s = IndexSearcher(wd_index)
    # doc 0 has 3 visible tokens; freq(the)=1 with doclen 3 scoring
    r = s.reader.shards
    total_dl = sum(int(sh.doclens.sum()) for sh in r)
    assert total_dl == sum(len(t.split()) for t in TEXTS)
    rep = check_index(wd_index)
    assert rep["ok"]
