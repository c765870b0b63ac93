"""SimpleNaiveBayesClassifier (classification/SimpleNaiveBayesClassifier
.java:48) — hand-computed parity on a tiny corpus, batch path consistency,
lang recovery on the synthetic corpus."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray

from lucene_solr_ray.relational.ml import (naive_bayes_assign,
                                           naive_bayes_classify_ds,
                                           naive_bayes_log_scores,
                                           train_naive_bayes)

DOCS = "/root/testdata/sf0.001/documents.parquet"


@pytest.fixture(scope="module")
def tiny_model(ray_session):
    t = pa.table({
        "text": ["apple banana apple", "apple", "carrot daikon",
                 "banana carrot", "apple banana"],
        "cls": ["A", "A", "B", "B", None],
    })
    return train_naive_bayes(ray.data.from_arrow(t), "text", "cls")


def hand_score(model_unused, text):
    """Independent re-derivation of the reference formula on the tiny
    corpus (docs-with-class N=4; avgU over ALL 5 text docs)."""
    # unique (doc, term) pairs: d0{apple,banana} d1{apple} d2{carrot,daikon}
    # d3{banana,carrot} d4{apple,banana} -> 9 pairs / 5 docs
    avg_u = 9 / 5
    n = 4
    hits = {("A", "apple"): 2, ("A", "banana"): 1,
            ("B", "carrot"): 2, ("B", "banana"): 1, ("B", "daikon"): 1}
    out = {}
    for c, dfc in (("A", 2), ("B", 2)):
        den = avg_u * dfc + n
        s = math.log(dfc) - math.log(n)
        for w in text.split():
            s += math.log((hits.get((c, w), 0) + 1) / den)
        out[c] = s
    return out


def test_model_stats(tiny_model):
    m = tiny_model
    assert m["classes"] == ["A", "B"]
    assert m["class_docs"] == {"A": 2, "B": 2}
    assert m["docs_with_class"] == 4
    assert m["avg_unique_terms"] == pytest.approx(9 / 5)
    assert m["hits"][("A", "apple")] == 2
    assert m["hits"][("B", "carrot")] == 2
    assert ("A", "carrot") not in m["hits"]
    # null-class doc contributes to avgU but not to any class hits
    assert all(c in ("A", "B") for c, _ in m["hits"])


@pytest.mark.parametrize("text,want_cls", [
    ("apple apple", "A"), ("carrot daikon", "B"),
    # 'banana' hits both classes once with equal priors/dens: a tie,
    # broken to the first class in sorted order
    ("banana", "A"),
])
def test_hand_parity(tiny_model, text, want_cls):
    t = naive_bayes_log_scores(tiny_model, text)
    got = dict(zip(t["cls"].to_pylist(), t["log_score"].to_pylist()))
    want = hand_score(tiny_model, text)
    assert got["A"] == pytest.approx(want["A"])
    assert got["B"] == pytest.approx(want["B"])
    cls, conf = naive_bayes_assign(tiny_model, text)
    assert cls == want_cls
    assert 0.0 < conf <= 1.0


def test_batch_path_matches_single(tiny_model, ray_session):
    texts = ["apple apple", "carrot daikon", "banana", "apple carrot",
             "zzz unseen words"]
    ds = ray.data.from_arrow(pa.table({"text": texts}))
    out = naive_bayes_classify_ds(ds, "text", tiny_model).to_pandas()
    out = out.sort_index()
    for txt, cls, lg in zip(out["text"], out["nb_class"],
                            out["nb_class_log"]):
        t = naive_bayes_log_scores(tiny_model, txt)
        scores = dict(zip(t["cls"].to_pylist(), t["log_score"].to_pylist()))
        best = max(scores, key=lambda c: (scores[c], [c]))
        # tie -> first class in sorted order
        bm = max(scores.values())
        best = min(c for c, s in scores.items() if s == bm)
        assert cls == best
        assert lg == pytest.approx(scores[best])


def test_planted_topic_recovery(ray_session):
    """Plant class-specific vocabulary on top of shared noise; training
    then reclassifying the corpus must recover the planted classes."""
    rng = np.random.RandomState(7)
    shared = [f"w{i}" for i in range(50)]
    themes = {"sports": ["goal", "match", "team"],
              "cooking": ["oven", "recipe", "spice"],
              "tech": ["cpu", "kernel", "compiler"]}
    texts, classes = [], []
    for i in range(300):
        c = list(themes)[i % 3]
        toks = list(rng.choice(shared, size=8))
        toks += list(rng.choice(themes[c], size=4))
        rng.shuffle(toks)
        texts.append(" ".join(toks))
        classes.append(c)
    ds = ray.data.from_arrow(pa.table({"text": texts, "cls": classes}))
    model = train_naive_bayes(ds, "text", "cls")
    out = naive_bayes_classify_ds(ds, "text", model).to_pandas()
    acc = float((out["nb_class"] == out["cls"]).mean())
    assert acc > 0.95
