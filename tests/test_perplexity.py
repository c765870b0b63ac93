"""CCNet-style LM perplexity scoring (textstats/perplexity.py) — exact
parity with an in-memory bigram model, bucket edges, join-based scale
path."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from lucene_solr_ray.search.freetext import build_freetext
from lucene_solr_ray.textstats.perplexity import perplexity_scores

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def lm_dir(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("pp_lm") / "lm")
    build_freetext(DOCS, d, n=2)
    return d


@pytest.fixture(scope="module")
def hand_model():
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    uni, big, total = Counter(), Counter(), 0
    for s in texts.values():
        ws = s.split(" ")
        total += len(ws)
        uni.update(ws)
        big.update(zip(ws[:-1], ws[1:]))
    return texts, uni, big, total, len(uni)


def hand_pp(s, uni, big, total, v):
    ws = s.split(" ")
    ln = 0.0
    for i, w in enumerate(ws):
        if i == 0:
            ln += math.log((uni[w] + 1) / (total + v))
        else:
            ln += math.log((big.get((ws[i - 1], w), 0) + 1)
                           / (uni[ws[i - 1]] + v))
    return math.exp(-ln / len(ws))


def test_exact_parity(lm_dir, hand_model, ray_session):
    texts, uni, big, total, v = hand_model
    ds = ray.data.read_parquet(DOCS, columns=["doc_id", "text"])
    out = perplexity_scores(ds, "doc_id", "text", lm_dir).to_pandas()
    out = out.set_index("doc_id")["perplexity"]
    assert len(out) == len(texts)
    for d in list(texts)[::97]:
        assert out[d] == pytest.approx(
            hand_pp(texts[d], uni, big, total, v), rel=1e-9)


def test_buckets(lm_dir, hand_model, ray_session):
    texts, uni, big, total, v = hand_model
    pps = sorted(hand_pp(s, uni, big, total, v) for s in texts.values())
    lo, hi = pps[len(pps) // 3], pps[2 * len(pps) // 3]
    ds = ray.data.read_parquet(DOCS, columns=["doc_id", "text"])
    out = perplexity_scores(ds, "doc_id", "text", lm_dir,
                            bucket_bounds=(lo, hi)).to_pandas()
    counts = out["bucket"].value_counts().to_dict()
    assert set(counts) == {"head", "middle", "tail"}
    # terciles: each bucket holds roughly a third
    for n in counts.values():
        assert abs(n - len(texts) / 3) <= len(texts) / 10
    # bucket assignment consistent with the score column
    for ppv, b in zip(out["perplexity"], out["bucket"]):
        want = "head" if ppv < lo else ("middle" if ppv < hi else "tail")
        assert b == want


def test_unseen_text_scores_worse(lm_dir, hand_model, ray_session):
    """Out-of-distribution gibberish must land at higher perplexity than
    every in-corpus doc — the signal the CCNet filter relies on."""
    texts, uni, big, total, v = hand_model
    max_pp = max(hand_pp(s, uni, big, total, v) for s in texts.values())
    t = pa.table({"doc_id": [0], "text": ["zq zzx vbn qqq mmm zq zzx"]})
    out = perplexity_scores(ray.data.from_arrow(t), "doc_id", "text",
                            lm_dir).to_pandas()
    assert float(out["perplexity"].iloc[0]) > max_pp


def test_empty_docs_surface_as_tail(lm_dir, ray_session):
    """Token-less docs (incl. a trailing one in the batch) must not crash
    and must surface with perplexity -1 / bucket 'tail'."""
    t = pa.table({"doc_id": [0, 1, 2, 3],
                  "text": ["fast query merge", "", "slow scan", None]})
    out = perplexity_scores(ray.data.from_arrow(t), "doc_id", "text",
                            lm_dir).to_pandas().set_index("doc_id")
    assert len(out) == 4
    for d in (1, 3):
        assert out.loc[d, "perplexity"] == -1.0
        assert out.loc[d, "bucket"] == "tail"
    assert out.loc[0, "perplexity"] > 0


def test_adversarial_gram_skew(tmp_path, ray_session):
    """Zipf-extreme skew: one gram dominates the (doc, gram) stream (the
    head-term shape a web corpus produces). The native hash-join legs must
    stay correct — every row of the hot key lands in ONE partition, the
    exact case the old fixed-16-bucket pandas join materialized as a
    single giant DataFrame."""
    import ray.data

    # 60 docs of 'the the the ...' + a diverse tail
    texts = ["the " * 40 + "end"] * 60 + [
        f"tok{i} alpha beta gamma tok{i}" for i in range(40)]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array([s.strip() for s in texts], pa.string()),
    })
    src = str(tmp_path / "skew.parquet")
    pq.write_table(t, src)
    lm = str(tmp_path / "lm_skew")
    build_freetext(src, lm, n=2)
    out = perplexity_scores(
        ray.data.read_parquet(src), "doc_id", "text", lm
    ).to_pandas().set_index("doc_id")
    assert len(out) == len(texts)
    # hand model parity on both a hot doc and a tail doc
    tt = pq.read_table(src, columns=["doc_id", "text"])
    texts_d = dict(zip(tt["doc_id"].to_pylist(), tt["text"].to_pylist()))
    uni, big, total = Counter(), Counter(), 0
    for s in texts_d.values():
        ws = s.split(" ")
        total += len(ws)
        uni.update(ws)
        big.update(zip(ws[:-1], ws[1:]))
    for d in (0, 59, 70, 99):
        want = hand_pp(texts_d[d], uni, big, total, len(uni))
        assert out.loc[d, "perplexity"] == pytest.approx(want, rel=1e-9)
    # identical hot docs score identically (no partition-dependent drift)
    hot = out.loc[0:59, "perplexity"]
    assert hot.nunique() == 1
