"""WordDelimiterGraphFilter graph semantics
(miscellaneous/WordDelimiterGraphFilter.java:99 + FlattenGraphFilter.java:32).

Golden position layouts ported from the reference's
TestWordDelimiterGraphFilter (testLotsOfConcatenating's posIncrements
1,0,0,1,1,0,1 for "abc-def-123-456"), plus an index-level test that a
phrase query matches ACROSS a split token — the behavior the posInc-0
subset cannot provide.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.analysis.analyzers import word_delimiter_graph_stream


def _stream(tokens, **kw):
    return word_delimiter_graph_stream(
        list(tokens), list(range(len(tokens))), **kw)


def test_parts_take_consecutive_positions_and_shift():
    # "a WiFi b": WiFi splits at the case change -> wi@1 fi@2, b shifts to 3
    terms, pos, _, over = _stream(["a", "WiFi", "b"])
    assert terms == ["a", "wi", "fi", "b"]
    assert pos == [0, 1, 2, 3]
    # preserve_original stacks the lowercased original at the first part
    assert ("wifi", 1) in {(t, p) for t, p, _ in over}


def test_lots_of_concatenating_reference_layout():
    # TestWordDelimiterGraphFilter.testLotsOfConcatenating:
    # "abc-def-123-456" -> abcdef123456@0 abcdef@0 abc@0 def@1 123456@2
    # 123@2 456@3 (posIncrements 1,0,0,1,1,0,1)
    terms, pos, _, over = _stream(
        ["abc-def-123-456"], catenate_words=True, catenate_numbers=True,
        catenate_all=True, preserve_original=False)
    assert terms == ["abc", "def", "123", "456"]
    assert pos == [0, 1, 2, 3]
    layout = {(t, p) for t, p, _ in over}
    assert layout == {("abcdef123456", 0), ("abcdef", 0), ("123456", 2)}


def test_single_run_token_passthrough_and_offsets():
    terms, pos, offs, over = _stream(["plain"])
    assert terms == ["plain"] and pos == [0] and over == []
    # per-part character offsets slice the token's packed range
    toks = ["PowerShot"]
    packed = [(0 << 32) | 9]
    terms, pos, offs, over = word_delimiter_graph_stream(
        toks, [0], offsets=packed)
    assert terms == ["power", "shot"]
    assert offs == [(0 << 32) | 5, (5 << 32) | 9]
    # original spans the whole token
    assert over[0] == ("powershot", 0, (0 << 32) | 9)


def test_number_word_boundary_splits():
    terms, pos, _, over = _stream(["SD500"], preserve_original=True)
    assert terms == ["sd", "500"]
    assert pos == [0, 1]
    assert ("sd500", 0) in {(t, p) for t, p, _ in over}


def test_phrase_matches_across_split_token(tmp_path, ray_session):
    """Index 'the WiFi router' with graph mode: phrase '"wi fi"' must hit
    (parts at consecutive positions), and 'router' must be at position 3
    (shifted) so '"fi router"' also matches."""
    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher

    f = str(tmp_path / "c.parquet")
    texts = ["the WiFi router works", "plain text here", "wi fi separate"]
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(3, dtype=np.int64)),
        "text": pa.array(texts),
    }), f)
    idx = str(tmp_path / "idx")
    cfg = IndexBuildConfig(num_shards=1, num_buckets=2,
                           word_delimiter_graph=True)
    build_index(f, idx, cfg=cfg)
    s = IndexSearcher(idx)
    hits = sorted(s.match_all('"wi fi"')["doc_id"].to_pylist())
    assert hits == [0, 2]
    # downstream token shifted: "fi router" is adjacent after the split
    hits = sorted(s.match_all('"fi router"')["doc_id"].to_pylist())
    assert hits == [0]
    # catenated form indexed at the first part's position
    hits = sorted(s.match_all("wifi")["doc_id"].to_pylist())
    assert hits == [0]


def test_graph_mode_rejects_conflicting_config():
    from lucene_solr_ray.index import IndexBuildConfig

    with pytest.raises(ValueError):
        IndexBuildConfig(word_delimiter=True, word_delimiter_graph=True)
    with pytest.raises(ValueError):
        IndexBuildConfig(synonym_graph=("a b => ab",),
                         word_delimiter_graph=True)
