"""Gopher quality filters and paragraph-level exact dedup tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from lucene_solr_ray.dedup.ops import dedup_paragraphs
from lucene_solr_ray.textstats.ops import gopher_filters


def test_gopher_filters_metrics(ray_session):
    texts = [
        " ".join(["the", "be", "to"] + ["word"] * 60),        # passes
        "short doc",                                          # too few words
        " ".join(["the", "of"] + ["x#y"] * 58),               # symbol ratio
        " ".join(["the", "of"] + ["aa"] * 58),                # mean len < 3
        " ".join(["word"] * 60),                              # no stop words
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = gopher_filters(ray.data.from_arrow(t), "doc_id", "text") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.passes.tolist() == [True, False, False, False, False]
    assert out.n_words[0] == 63
    assert out.stop_hits[0] == 3 and out.stop_hits[4] == 0
    assert out.symbol_ratio[2] == pytest.approx(58 / 60)
    toks0 = texts[0].split(" ")
    assert out.mean_word_len[0] == pytest.approx(
        sum(len(w) for w in toks0) / len(toks0))
    assert out.alpha_word_frac[0] == 1.0


def test_dedup_paragraphs_newline(ray_session):
    texts = [
        "alpha beta\ncommon para\ngamma",
        "common para\ndelta",        # 'common para' already seen in doc 0
        "unique here",
    ]
    t = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(texts)})
    out = dedup_paragraphs(ray.data.from_arrow(t), "doc_id", "text") \
        .to_pandas()
    got = set(zip(out.doc_id, out.para_idx))
    assert (0, 0) in got and (0, 1) in got and (0, 2) in got
    assert (1, 0) not in got          # duplicate paragraph dropped
    assert (1, 1) in got and (2, 0) in got


def test_dedup_paragraphs_chunk_fallback(ray_session):
    # single-line corpus: fixed-token chunks; the duplicate chunk loses
    texts = [
        "a b c d e f g h i j",            # chunks: 'a b c d e', 'f g h i j'
        "a b c d e x y z w v",            # first chunk duplicates doc 0's
    ]
    t = pa.table({"doc_id": pa.array(range(2), pa.int64()),
                  "text": pa.array(texts)})
    out = dedup_paragraphs(ray.data.from_arrow(t), "doc_id", "text",
                           chunk_tokens=5).to_pandas()
    got = set(zip(out.doc_id, out.para_idx))
    assert got == {(0, 0), (0, 1), (1, 1)}


def test_dedup_paragraphs_winner_is_lowest(ray_session):
    # same paragraph in three docs: lowest (doc, idx) survives
    texts = ["dup dup dup dup dup"] * 3
    t = pa.table({"doc_id": pa.array([5, 2, 9], pa.int64()),
                  "text": pa.array(texts)})
    out = dedup_paragraphs(ray.data.from_arrow(t), "doc_id", "text") \
        .to_pandas()
    assert list(zip(out.doc_id, out.para_idx)) == [(2, 0)]


def test_repetition_filters(ray_session):
    from lucene_solr_ray.textstats.ops import repetition_filters

    texts = [
        "a b a b a b a b",                 # top2 'a b' 4x of 7 bigrams
        "x\ny\nx\nz\nx",                   # dup lines: 2 of 5
        "all words here are unique now",   # no repetition
    ]
    t = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(texts)})
    out = repetition_filters(ray.data.from_arrow(t), "doc_id", "text",
                             top_ns=(2,), dup_ns=(3,)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc0: bigrams of 8 tokens: 'a b' occurs 4 times -> 4*2/8 = 1.0
    assert out.top2_frac[0] == pytest.approx(1.0)
    # doc0 trigram 'a b a'/'b a b' repeat -> all tokens covered
    assert out.dup3_frac[0] == pytest.approx(1.0)
    assert out.dup_line_frac[0] == 0.0
    # doc1: lines x y x z x -> 2 duplicate lines of 5
    assert out.dup_line_frac[1] == pytest.approx(2 / 5)
    # doc2: unique text
    assert out.top2_frac[2] == pytest.approx(2 / 6)  # every bigram once
    assert out.dup3_frac[2] == 0.0


def test_curate_corpus_composition(ray_session):
    from lucene_solr_ray.pipelines.curation import curate_corpus

    texts = [
        " ".join(["the"] + ["word"] * 30),      # passes, unique
        " ".join(["the"] + ["word"] * 30),      # exact dup of doc 0: loses
        "short the doc",                        # fails min_words
        " ".join(["the"] + ["other"] * 30),     # passes, unique
        " ".join(["nostop"] * 40),              # fails stop-word rule
    ]
    t = pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en", "en", "de", "fr", "en"]),
    })
    out = curate_corpus(ray.data.from_arrow(t), min_words=25,
                        min_stop_hits=1, num_partitions=2).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out.doc_id.tolist() == [0, 3]
    assert out.n_words.tolist() == [31, 31]
    assert out.lang.tolist() == ["en", "fr"]


def test_curate_corpus_empty_survivors(ray_session):
    from lucene_solr_ray.pipelines.curation import curate_corpus

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["tiny", "also tiny"]),
        "lang": pa.array(["en", "en"]),
    })
    out = curate_corpus(ray.data.from_arrow(t), min_words=25,
                        num_partitions=2).to_pandas()
    assert len(out) == 0


def test_duplicate_ngram_spans(ray_session):
    """ExactSubstr spans (Lee et al. 2021 role): k-gram repeated anywhere
    in the corpus -> maximal position runs, end exclusive."""
    import ray.data

    from lucene_solr_ray.dedup.ops import duplicate_ngram_spans

    texts = [
        "the quick brown fox jumps over the lazy dog",   # 0
        "xx yy the quick brown fox jumps zz qq ww",      # 1: shares 4 grams
        "totally unrelated words here now",              # 2
        "aa aa aa aa aa bb cc dd ee ff",                 # 3: self-repeat
    ]
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = duplicate_ngram_spans(ray.data.from_arrow(t), "doc_id", "text",
                                k=3, min_count=2).to_pandas()
    spans = {(r.doc_id, r.span_start, r.span_end)
             for r in out.itertuples()}
    # docs 0/1 share 'the quick brown fox jumps': 3-gram starts 0..2 in
    # doc 0 (tokens 0-4), starts 2..4 in doc 1 (tokens 2-6)
    assert (0, 0, 5) in spans
    assert (1, 2, 7) in spans
    # doc 3: 'aa aa aa' occurs at starts 0,1,2 -> one span [0, 5)
    assert (3, 0, 5) in spans
    # doc 2 has no duplicated grams
    assert not any(d == 2 for d, _, _ in spans)


def test_duplicate_ngram_spans_no_dups(ray_session):
    """A corpus with no repeated k-gram must return an empty span table,
    not crash on the schema-less filtered join side."""
    import ray.data

    from lucene_solr_ray.dedup.ops import duplicate_ngram_spans

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["aa bb cc dd", "ee ff gg hh"],
                                   pa.string())})
    out = duplicate_ngram_spans(ray.data.from_arrow(t), "doc_id", "text",
                                k=3, min_count=2)
    assert out.count() == 0
    assert set(out.schema().names) >= {"doc_id", "span_start", "span_end"}


def test_scrub_duplicate_substrings(ray_session):
    import ray.data

    from lucene_solr_ray.dedup.ops import scrub_duplicate_substrings

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "xx yy the quick brown fox jumps zz qq ww",
        "totally unrelated words here now",
    ]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = scrub_duplicate_substrings(
        ray.data.from_arrow(t), "doc_id", "text", k=3, min_count=2
    ).to_pandas().set_index("doc_id")["text"].to_dict()
    # shared 'the quick brown fox jumps' removed from BOTH docs
    assert out[0] == "over the lazy dog"
    assert out[1] == "xx yy zz qq ww"
    assert out[2] == texts[2]  # untouched


def test_scrub_no_dups_passthrough(ray_session):
    import ray.data

    from lucene_solr_ray.dedup.ops import scrub_duplicate_substrings

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["aa bb cc dd", "ee ff gg hh"],
                                   pa.string())})
    out = scrub_duplicate_substrings(
        ray.data.from_arrow(t), "doc_id", "text", k=3
    ).to_pandas().set_index("doc_id")["text"].to_dict()
    assert out == {0: "aa bb cc dd", 1: "ee ff gg hh"}
