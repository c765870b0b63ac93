"""Indexed char offsets (IndexOptions ...AND_OFFSETS) + the postings-offset
highlighter (PostingsHighlighter.java:47 / UnifiedHighlighter.java:132)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.index.reader import ShardReader
from lucene_solr_ray.search import IndexSearcher
from lucene_solr_ray.search.services import (
    highlight_results_offsets,
    passage_from_offsets,
)

TEXTS = [
    "The quick brown Fox jumps over the lazy dog. " * 3,
    "fox fox FOX runs; the dog sleeps all day long in the warm sun",
    "no animals here at all just machines and metal",
    "STOP the stop words; a dog barked at the fox den",
]


@pytest.fixture(scope="module")
def off_idx(tmp_path_factory, ray_session):
    base = tmp_path_factory.mktemp("off_idx")
    corp = str(base / "corpus.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                  "text": pa.array(TEXTS)}),
        corp,
    )
    d = str(base / "idx")
    build_index(corp, d, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4, store_offsets=True))
    return d, corp


def test_offsets_roundtrip_slices_match_terms(off_idx):
    d, _ = off_idx
    checked = 0
    for sh in range(2):
        r = ShardReader(d, sh)
        for term in ("fox", "dog", "quick", "machines"):
            if term not in set(r.terms.tolist()):
                continue
            docs, freqs, offs = r.postings(
                term, with_positions=True, payload_col="offsets")
            assert len(offs) == int(freqs.sum())
            starts, ends = offs >> 32, offs & 0xFFFFFFFF
            occ_docs = np.repeat(docs, freqs)
            for dd, s, e in zip(occ_docs, starts, ends):
                assert TEXTS[int(dd)][int(s):int(e)].lower() == term
                checked += 1
    assert checked >= 8


def test_offsets_align_with_positions(off_idx):
    d, _ = off_idx
    for sh in range(2):
        r = ShardReader(d, sh)
        if "fox" not in set(r.terms.tolist()):
            continue
        _, f1, offs = r.postings("fox", with_positions=True,
                                 payload_col="offsets")
        _, f2, poss = r.postings("fox", with_positions=True)
        assert np.array_equal(f1, f2)
        assert len(offs) == len(poss)
        # later position in the same doc => later char start
        starts = (offs >> 32).astype(np.int64)
        cur = 0
        for f in f1:
            seg_p, seg_s = poss[cur:cur + f], starts[cur:cur + f]
            assert np.all(np.diff(seg_p) > 0)
            assert np.all(np.diff(seg_s) > 0)
            cur += f


def test_store_offsets_requires_positions():
    with pytest.raises(ValueError):
        IndexBuildConfig(store_positions=False, store_offsets=True)


def test_index_without_offsets_reads_empty(tmp_path, ray_session):
    corp = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["plain fox text"])}), corp)
    d = str(tmp_path / "idx")
    build_index(corp, d, cfg=IndexBuildConfig(num_shards=1, num_buckets=2))
    r = ShardReader(d, 0)
    docs, freqs, offs = r.postings("fox", with_positions=True,
                                   payload_col="offsets")
    # shard-absent column -> empty payload (the no-offsets highlight fast
    # path); only row-null payloads on a stored column get -1 fills
    assert len(docs) == 1 and len(offs) == 0


def test_passage_from_offsets_wraps_and_windows():
    text = TEXTS[1]
    sp = np.array([(0 << 32) | 3, (4 << 32) | 7, (8 << 32) | 11,
                   (22 << 32) | 25], np.int64)
    out = passage_from_offsets(text, sp, max_chars=40)
    assert out.count("<b>") == 4
    assert "<b>fox</b>" in out and "<b>dog</b>" in out
    # tight window keeps only the clustered head matches
    tight = passage_from_offsets(text, sp, max_chars=12)
    assert tight.count("<b>") == 3 and "<b>dog</b>" not in tight
    # no spans -> plain prefix
    assert passage_from_offsets("abc def", np.zeros(0, np.int64)) == "abc def"


def test_highlight_results_offsets_end_to_end(off_idx):
    d, corp = off_idx
    s = IndexSearcher(d)
    out = highlight_results_offsets(s, corp, "doc_id", "text", "fox dog", k=4)
    assert "snippet" in out.column_names
    snips = dict(zip(out["doc_id"].to_pylist(), out["snippet"].to_pylist()))
    # every hit's snippet wraps both query terms (all hit docs contain both)
    for did, sn in snips.items():
        assert "<b>" in sn, (did, sn)
    hit1 = snips.get(1, "")
    assert "<b>fox</b>" in hit1 and "<b>FOX</b>" in hit1
    assert "<b>dog</b>" in hit1


def test_highlighter_falls_back_without_offsets(tmp_path, ray_session):
    corp = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["a fox ran", "nothing here"])}), corp)
    d = str(tmp_path / "idx")
    build_index(corp, d, cfg=IndexBuildConfig(num_shards=1, num_buckets=2))
    s = IndexSearcher(d)
    out = highlight_results_offsets(s, corp, "doc_id", "text", "fox", k=2)
    assert any("<b>fox</b>" in x for x in out["snippet"].to_pylist())


def test_offsets_survive_force_merge(off_idx, tmp_path):
    import shutil

    from lucene_solr_ray.index.maintenance import delete_by_ids, force_merge

    d, corp = off_idx
    d2 = str(tmp_path / "fm_idx")
    shutil.copytree(d, d2)
    delete_by_ids(d2, [2])
    force_merge(d2)
    import json

    man = json.load(open(os.path.join(d2, "manifest.json")))
    checked = 0
    for sh in man.get("shard_ids") or range(2):
        r = ShardReader(d2, sh)
        if "fox" not in set(r.terms.tolist()):
            continue
        docs, freqs, offs = r.postings("fox", with_positions=True,
                                       payload_col="offsets")
        starts, ends = offs >> 32, offs & 0xFFFFFFFF
        for dd, s, e in zip(np.repeat(docs, freqs), starts, ends):
            assert TEXTS[int(dd)][int(s):int(e)].lower() == "fox"
            checked += 1
    assert checked >= 4


def test_component_highlight_uses_offsets(off_idx):
    from lucene_solr_ray.pipelines.components import handle_request

    d, corp = off_idx
    resp = handle_request(d, {"q": "fox dog", "rows": 4, "hl": "true"},
                          corpus_paths=corp)
    hl = resp["highlighting"]
    assert hl, resp
    joined = " ".join(hl.values())
    assert "<b>fox</b>" in joined or "<b>Fox</b>" in joined
    assert "<b>dog</b>" in joined


def test_parser_implicit_or():
    from lucene_solr_ray.search.query import Bool, parse_query, query_terms

    n = parse_query("fox dog")
    assert isinstance(n, Bool) and len(n.should) == 2 and n.min_should == 1
    assert query_terms(n) == ["fox", "dog"]
    n2 = parse_query("fox NOT dog")
    assert [t.text for t in n2.should] == ["fox"]
    assert [t.text for t in n2.must_not] == ["dog"]
    n3 = parse_query("a b OR c")
    assert len(n3.should) == 3


def test_phrase_aware_highlighting(tmp_path, ray_session):
    """Exact-phrase queries wrap only occurrences inside a phrase match."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_solr_ray.index import IndexBuildConfig, build_index
    from lucene_solr_ray.search import IndexSearcher
    from lucene_solr_ray.search.services import (collect_phrase_spans,
                                                 highlight_results_offsets)

    corp = str(tmp_path / "c.parquet")
    # doc 0: phrase "red fox" at [4:11]; 'fox' also appears loose at the end
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["the red fox ran; a lone fox slept",
                          "red paint and a fox but never adjacent"]),
    }), corp)
    d = str(tmp_path / "idx")
    build_index(corp, d, cfg=IndexBuildConfig(
        num_shards=1, num_buckets=2, store_offsets=True))
    s = IndexSearcher(d)
    spans = collect_phrase_spans(s, ("red", "fox"), [0, 1])
    # doc 0: exactly the two phrase participants (red@4:7, fox@8:11)
    got = sorted((o >> 32, o & 0xFFFFFFFF) for o in spans[0])
    assert got == [(4, 7), (8, 11)]
    assert spans[1] == []             # terms present but never adjacent
    out = highlight_results_offsets(s, corp, "doc_id", "text",
                                    '"red fox"', k=2)
    sn = dict(zip(out["doc_id"].to_pylist(), out["snippet"].to_pylist()))
    assert "<b>red</b> <b>fox</b>" in sn[0]
    assert "lone <b>fox</b>" not in sn[0]   # loose fox NOT wrapped


def test_multi_payload_postings_match_single_calls(tmp_path, ray_session):
    """postings(payload_col=("offsets","positions")) must equal the two
    single-payload calls on the hard layout: a salted head term (multi-row
    defensive-merge path) plus tombstoned docs (live filtering of both
    payloads)."""
    from lucene_solr_ray.index.maintenance import delete_by_ids

    corp = str(tmp_path / "c.parquet")
    n = 300
    rng = np.random.default_rng(11)
    ids = rng.permutation(n * 2)[:n].astype(np.int64)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["the fox d%d the" % (i % 13) for i in range(n)]),
    }), corp)
    d = str(tmp_path / "idx")
    build_index(corp, d, cfg=IndexBuildConfig(
        num_shards=2, num_buckets=4, batch_size=64, store_offsets=True,
        head_df_ratio=0.01, head_sample_docs=150, head_sub_span=64,
    ))
    delete_by_ids(d, ids[:25].tolist())
    salted = False
    for shid in range(2):
        r = ShardReader(d, shid)
        for term in ("the", "fox"):
            salted |= len(r.term_rows(term)) > 1
            docs, freqs, offs, poss = r.postings(
                term, with_positions=True,
                payload_col=("offsets", "positions"))
            d1, f1, o1 = r.postings(term, with_positions=True,
                                    payload_col="offsets")
            d2, f2, p2 = r.postings(term, with_positions=True)
            np.testing.assert_array_equal(docs, d1)
            np.testing.assert_array_equal(docs, d2)
            np.testing.assert_array_equal(freqs, f1)
            np.testing.assert_array_equal(offs, o1)
            np.testing.assert_array_equal(poss, p2)
            assert len(offs) == len(poss) == int(freqs.sum())
    assert salted, "expected a salted multi-row term in this layout"


def test_postings_offsets_absent_with_deletes(tmp_path, ray_session):
    """An index built WITHOUT store_offsets + tombstones: requesting the
    offsets payload must degrade to an empty array, not crash the live
    filter (regression: boolean-mask IndexError through the highlighter's
    fallback path)."""
    from lucene_solr_ray.index.maintenance import delete_by_ids
    from lucene_solr_ray.search.services import highlight_results_offsets

    corp = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS)}), corp)
    d = str(tmp_path / "idx")
    build_index(corp, d, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    delete_by_ids(d, [0])
    s = IndexSearcher(d)
    for sh in s.reader.shards:
        got = sh.postings("fox", with_positions=True, payload_col="offsets")
        docs, freqs, offs = got
        # shard-absent column stays empty under deletes (no crash, fast
        # path preserved)
        assert len(offs) == 0
    out = highlight_results_offsets(s, corp, "doc_id", "text", "fox", k=5)
    assert 0 not in out["doc_id"].to_pylist()


def test_passage_keeps_trailing_context():
    """The right pad must carry context past the last match (it previously
    cut at the first space after the match, leaving zero right context)."""
    text = "alpha beta gamma delta epsilon zeta eta theta iota"
    # single match on 'beta' [6, 10)
    sp = np.array([(6 << 32) | 10], np.int64)
    out = passage_from_offsets(text, sp, max_chars=40)
    assert "<b>beta</b>" in out
    tail = out.split("</b>", 1)[1]
    assert len(tail) > 10 and "gamma" in tail          # real right context
    head = out.split("<b>", 1)[0]
    assert "alpha" in head                             # left pad intact
