"""SolrTextTagger (handler/tagger) — span extraction + overlap policies."""

import pyarrow as pa
import pytest
import ray

from lucene_solr_ray.search.tagger import (_reduce_ldr, _reduce_no_sub,
                                           tag_documents)


def run(texts, phrases, overlaps="NO_SUB"):
    ds = ray.data.from_arrow(pa.table({
        "id": list(range(len(texts))), "body": texts}))
    out = tag_documents(ds, "id", "body", phrases,
                        overlaps=overlaps).to_pandas()
    if not len(out):
        return []
    return sorted(map(tuple, out[["id", "start_pos", "end_pos", "tag"]]
                      .itertuples(index=False)))


def test_basic_tags(ray_session):
    got = run(["new york is big", "i love new york city pizza"],
              ["new york", "new york city", "pizza"])
    assert got == [
        (0, 0, 2, "new york"),
        (1, 2, 5, "new york city"),  # NO_SUB drops the contained match
        (1, 5, 6, "pizza"),
    ]


def test_all_policy(ray_session):
    got = run(["i love new york city pizza"],
              ["new york", "new york city", "york city"], overlaps="ALL")
    assert got == [
        (0, 2, 4, "new york"),
        (0, 2, 5, "new york city"),
        (0, 3, 5, "york city"),
    ]


def test_no_sub_keeps_overlapping_non_contained(ray_session):
    # 'new york' (2,4) is contained in (2,5); 'york city' (3,5) also
    # contained -> only the 3-token span survives
    got = run(["i love new york city pizza"],
              ["new york", "new york city", "york city"])
    assert got == [(0, 2, 5, "new york city")]


def test_ldr_policy(ray_session):
    # overlapping equal-length chain: a b / b c / c d -> LDR keeps the
    # RIGHT-most longest first (c d), then (a b) remains
    got = run(["a b c d"], ["a b", "b c", "c d"],
              overlaps="LONGEST_DOMINANT_RIGHT")
    assert got == [(0, 0, 2, "a b"), (0, 2, 4, "c d")]


def test_reducers_unit():
    spans = [(0, 2, "x"), (0, 3, "y"), (4, 5, "z")]
    assert _reduce_no_sub(spans) == [(0, 3, "y"), (4, 5, "z")]
    assert _reduce_ldr(spans) == [(0, 3, "y"), (4, 5, "z")]


def test_repeated_and_case(ray_session):
    got = run(["Pizza pizza PIZZA"], ["pizza"])
    assert got == [(0, 0, 1, "pizza"), (0, 1, 2, "pizza"),
                   (0, 2, 3, "pizza")]


def test_no_matches_and_garbage(ray_session):
    assert run(["nothing here"], ["absent phrase"]) == []
    with pytest.raises(ValueError):
        run(["x"], ["x"], overlaps="BOGUS")
