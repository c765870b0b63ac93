"""TermsComponent / facet.pivot / UpdateRequestProcessor chain tests."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.pipelines.urp import apply_chain, register_processor
from lucene_solr_ray.relational.ops import pivot_facets
from lucene_solr_ray.search.services import terms_enum

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("tc_idx"))
    cfg = IndexBuildConfig(num_shards=2, num_buckets=4, batch_size=256,
                           keyword_fields=("lang",))
    build_index(DOCS, d, key_col="doc_id", text_col="text", cfg=cfg)
    return d


@pytest.fixture(scope="module")
def raw():
    t = pq.read_table(DOCS, columns=["doc_id", "text", "lang"])
    return (list(zip(t["doc_id"].to_pylist(),
                     [s.split(" ") for s in t["text"].to_pylist()])),
            t["lang"].to_pylist())


def _df_map(docs):
    from collections import Counter

    c = Counter()
    for _, toks in docs:
        c.update(set(toks))
    return c


# ---------------------------------------------------------------------------
# TermsComponent
# ---------------------------------------------------------------------------

def test_terms_enum_count_sort(idx, raw):
    docs, _ = raw
    c = _df_map(docs)
    got = terms_enum(idx, prefix="s", limit=5, sort="count")
    want = sorted(((t, n) for t, n in c.items() if t.startswith("s")),
                  key=lambda x: (-x[1], x[0]))[:5]
    assert list(zip(got["term"].to_pylist(), got["df"].to_pylist())) == want


def test_terms_enum_index_sort_and_bounds(idx, raw):
    docs, _ = raw
    c = _df_map(docs)
    got = terms_enum(idx, lower="f", upper="m", sort="index", limit=None)
    want = sorted(t for t in c if "f" <= t <= "m")
    assert got["term"].to_pylist() == want


def test_terms_enum_regex_and_mincount(idx, raw):
    docs, _ = raw
    c = _df_map(docs)
    got = terms_enum(idx, regex=".a.*", mincount=2, limit=None,
                     sort="index")
    import re

    want = sorted(t for t, n in c.items()
                  if re.fullmatch(".a.*", t) and n >= 2)
    assert got["term"].to_pylist() == want


def test_terms_enum_keyword_field(idx, raw):
    _, langs = raw
    from collections import Counter

    c = Counter(langs)
    got = terms_enum(idx, field="lang", sort="count", limit=None)
    want = sorted(c.items(), key=lambda x: (-x[1], x[0]))
    assert list(zip(got["term"].to_pylist(), got["df"].to_pylist())) == want


# ---------------------------------------------------------------------------
# facet.pivot
# ---------------------------------------------------------------------------

def test_pivot_facets_matches_pandas_rollup(ray_session):
    t = pq.read_table(DOCS, columns=["lang", "source"])
    ds = ray.data.from_arrow(t)
    got = pivot_facets(ds, ["lang", "source"]).to_pandas()
    df = t.to_pandas()

    leaf = df.groupby(["lang", "source"]).size()
    # leaf level
    for (lg, src), n in leaf.items():
        row = got[(got.lang == lg) & (got.source == src)]
        assert len(row) == 1 and int(row.cnt.iloc[0]) == n
    # level 1
    for lg, n in df.groupby("lang").size().items():
        row = got[(got.lang == lg) & (got.source == "(all)")]
        assert len(row) == 1 and int(row.cnt.iloc[0]) == n
    # grand total
    row = got[(got.lang == "(all)") & (got.source == "(all)")]
    assert len(row) == 1 and int(row.cnt.iloc[0]) == len(df)
    assert len(got) == len(leaf) + df.lang.nunique() + 1


# ---------------------------------------------------------------------------
# UpdateRequestProcessor chain
# ---------------------------------------------------------------------------

def test_urp_chain_end_to_end(ray_session):
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "body": pa.array(["  Hello <b>World</b>  ", "", None], pa.string()),
        "tags": pa.array([["a", "b"], ["c"], []],
                         pa.list_(pa.string())),
    })
    chain = [
        ("clone", {"src": "body", "dest": "raw"}),
        ("html_strip", {"field": "body"}),
        ("trim", {"field": "body"}),
        ("remove_blank", {"field": "body"}),
        ("default_value", {"field": "body", "value": "n/a"}),
        ("lower", {"field": "body"}),
        ("regex_replace", {"field": "body", "pattern": "world",
                           "replacement": "ray"}),
        ("field_length", {"field": "body", "dest": "body_len"}),
        ("concat", {"field": "tags", "dest": "tags_s", "delimiter": "|"}),
        ("count_values", {"field": "tags", "dest": "n_tags"}),
        ("uuid", {"key": "doc_id", "dest": "id"}),
        ("signature", {"field": "body", "dest": "sig"}),
        ("truncate", {"field": "body", "max_length": 8}),
    ]
    out = apply_chain(ray.data.from_arrow(t), chain).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out.raw.tolist() == ["  Hello <b>World</b>  ", "", None]
    assert out.body.tolist() == ["hello ra", "n/a", "n/a"]
    assert out.body_len.tolist() == [9, 3, 3]  # length BEFORE truncate
    assert out.tags_s.tolist() == ["a|b", "c", ""]
    assert out.n_tags.tolist() == [2, 1, 0]
    # deterministic keyed uuid: same key -> same id across runs
    out2 = apply_chain(ray.data.from_arrow(t), chain).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.id.tolist() == out2.id.tolist()
    assert len(set(out.id)) == 3
    # identical bodies hash identically
    assert out.sig[1] == out.sig[2]


def test_urp_unknown_processor_fails_fast(ray_session):
    with pytest.raises(ValueError, match="unknown update processor"):
        apply_chain(ray.data.range(1), [("nope", {})])


def test_urp_custom_processor(ray_session):
    def shout(t: pa.Table, p: dict) -> pa.Table:
        import pyarrow.compute as pc

        out = pc.binary_join_element_wise(t[p["field"]], "!", "")
        i = t.column_names.index(p["field"])
        return t.set_column(i, p["field"], out)

    register_processor("shout", shout)
    t = pa.table({"s": pa.array(["a", "b"], pa.string())})
    out = apply_chain(ray.data.from_arrow(t),
                      [("shout", {"field": "s"})]).to_pandas()
    assert sorted(out.s) == ["a!", "b!"]


def test_urp_langid(ray_session):
    """langid processor (solr/contrib/langid role): trigram profiles
    detect the language; empty/profile-less text falls back."""
    import pyarrow as pa
    import ray

    from lucene_solr_ray.pipelines.urp import apply_chain

    t = pa.table({
        "id": [0, 1, 2, 3],
        "body": [
            "the quick brown fox jumped over the lazy dog and the cat",
            "der hund und die katze sind schnell und ich singe",
            "los gatos que corren de la casa del pueblo",
            "zzz qqq xxx",
        ],
    })
    out = apply_chain(
        ray.data.from_arrow(t),
        [("langid", {"field": "body", "dest": "lang_detected"})],
    ).to_pandas().sort_values("id")
    assert list(out["lang_detected"]) == ["en", "de", "es", "und"]
