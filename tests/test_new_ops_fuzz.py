"""Randomized parity fuzz for the continuation-session operators:
payload aggregation, block-join score modes, query-time grouping and
edismax — each checked against a brute-force model over random corpora."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_solr_ray.index import IndexBuildConfig, build_index
from lucene_solr_ray.search import IndexSearcher

VOCAB = ["alpha", "beta", "gamma", "delta", "epsi", "zeta"]


def _write(tmp, texts, name="c.parquet", extra=None):
    p = str(tmp / name)
    cols = {"doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts)}
    cols.update(extra or {})
    pq.write_table(pa.table(cols), p)
    return p


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_payload_fuzz(tmp_path, ray_session, seed):
    from lucene_solr_ray.search.services import payload_score

    rng = np.random.default_rng(seed)
    texts, truth = [], {}
    for d in range(60):
        toks = []
        for i in range(int(rng.integers(1, 20))):
            w = str(rng.choice(VOCAB))
            if rng.random() < 0.6:
                pay = int(rng.integers(0, 100))
                toks.append(f"{w}|{pay}")
                truth.setdefault((d, w), []).append(pay)
            else:
                toks.append(w)
                truth.setdefault((d, w), [])
        texts.append(" ".join(toks))
    p = _write(tmp_path, texts)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=3, num_buckets=4,
                                             payload_delimiter="|"))
    s = IndexSearcher(idx)
    for term in VOCAB:
        for fn, agg in (("max", max), ("min", min), ("sum", sum),
                        ("avg", lambda v: sum(v) / len(v))):
            t = payload_score(s, term, fn)
            got = dict(zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))
            want = {d: (float(agg(v)) if v else 0.0)
                    for (d, w), v in truth.items() if w == term}
            assert got == pytest.approx(want), (term, fn, seed)


@pytest.mark.parametrize("seed", [5, 23])
def test_block_join_and_grouping_fuzz(tmp_path, ray_session, seed):
    from lucene_solr_ray.search.services import (grouping_search,
                                                 to_parent_block_join)

    rng = np.random.default_rng(seed)
    langs = ["aa", "bb", "cc"]
    texts = [" ".join(rng.choice(VOCAB, size=int(rng.integers(2, 15))))
             for _ in range(80)]
    lang_col = [str(rng.choice(langs)) for _ in texts]
    p = _write(tmp_path, texts, extra={"lang": pa.array(lang_col)})
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(
        num_shards=3, num_buckets=4, string_docvalues_fields=("lang",)))
    s = IndexSearcher(idx, dtype=np.float64)
    span = int(rng.integers(3, 9))
    for term in rng.choice(VOCAB, size=3, replace=False):
        t = s.match_all(str(term))
        docs = t["doc_id"].to_pylist()
        scores = t["score"].to_pylist()
        # block join, mode total
        bj = to_parent_block_join(s, str(term), lambda i: i // span,
                                  score_mode="total")
        want: dict[int, float] = {}
        for d, sc in zip(docs, scores):
            want[d // span] = want.get(d // span, 0.0) + sc
        got = dict(zip(bj["parent_id"].to_pylist(), bj["score"].to_pylist()))
        assert got == pytest.approx(want), (term, "block_join")
        # grouping
        g = grouping_search(s, str(term), "lang", n_groups=2,
                            docs_per_group=3)
        best: dict[str, float] = {}
        for d, sc in zip(docs, scores):
            lg = lang_col[d]
            best[lg] = max(best.get(lg, -1e18), sc)
        top = sorted(best, key=lambda x: (-best[x], x))[:2]
        want_rows = []
        for r, lg in enumerate(top):
            members = sorted(
                [(d, sc) for d, sc in zip(docs, scores)
                 if lang_col[d] == lg],
                key=lambda x: (-x[1], x[0]))[:3]
            want_rows += [(lg, d, r + 1, i + 1)
                          for i, (d, _) in enumerate(members)]
        got_rows = list(zip(g["grp"].to_pylist(), g["doc_id"].to_pylist(),
                            g["grp_rank"].to_pylist(),
                            g["doc_rank"].to_pylist()))
        assert got_rows == want_rows, (term, "grouping")


@pytest.mark.parametrize("seed", [7, 41])
def test_edismax_fuzz(tmp_path, ray_session, seed):
    from lucene_solr_ray.search.query import edismax

    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(VOCAB, size=int(rng.integers(2, 12))))
             for _ in range(70)]
    p = _write(tmp_path, texts)
    idx = str(tmp_path / "idx")
    build_index(p, idx, cfg=IndexBuildConfig(num_shards=2, num_buckets=4))
    s = IndexSearcher(idx, dtype=np.float64)
    for _ in range(4):
        terms = list(rng.choice(VOCAB, size=int(rng.integers(1, 4)),
                                replace=False))
        mm = int(rng.integers(1, len(terms) + 1))
        node = edismax(" ".join(terms), [""], mm=mm)
        got = dict(zip(s.match_all(node)["doc_id"].to_pylist(),
                       s.match_all(node)["score"].to_pylist()))
        per = {t: dict(zip(s.match_all(t)["doc_id"].to_pylist(),
                           s.match_all(t)["score"].to_pylist()))
               for t in terms}
        want = {}
        for d in set().union(*per.values()) if per else set():
            hit = [per[t][d] for t in terms if d in per[t]]
            if len(hit) >= mm:
                want[d] = sum(hit)
        assert got == pytest.approx(want), (terms, mm, seed)
