"""Operator-level tests for the relational / dedup / ANN / textstats /
multimodal layers, cross-checked against DuckDB or pandas on sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def rd():
    import ray.data
    return ray.data


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "documents", "embeddings", "events"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_rollup_pre_aggregate(ray_session, con):
    from lucene_solr_ray.relational import rollup

    ds = rd().read_parquet(f"{SF}/lineitem.parquet",
                           columns=["l_returnflag", "l_linenumber"])
    out = rollup(ds, ["l_returnflag"],
                 [("sum", "l_linenumber", "s"), ("count", None, "c")]).to_pandas()
    exp = con.execute(
        "SELECT l_returnflag, sum(l_linenumber) AS s, count(*) AS c "
        "FROM lineitem GROUP BY 1").df()
    pd.testing.assert_frame_equal(canon(out).astype({"s": "int64"}),
                                  canon(exp).astype({"s": "int64"}))


def test_hash_and_bucketed_join_agree(ray_session, con):
    from lucene_solr_ray.relational import bucketed_join, hash_join

    orders = rd().read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = rd().read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_name"])

    a = hash_join(orders, cust, on="o_custkey", right_on="c_custkey",
                  num_partitions=4).to_pandas()
    exp = con.execute(
        "SELECT o_orderkey, o_custkey, c_custkey, c_name FROM orders "
        "JOIN customer ON o_custkey = c_custkey").df()
    assert len(a) == len(exp)
    # bucketed fallback join needs same-named key on both sides
    import pyarrow as pa

    cust2 = cust.map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"], "c_name": t["c_name"]}),
        batch_format="pyarrow")
    b = bucketed_join(orders, cust2, on="o_custkey", num_buckets=4).to_pandas()
    assert len(b) == len(exp)
    assert set(b["o_orderkey"]) == set(exp["o_orderkey"])


def test_bucketed_join_preserves_int_types(ray_session):
    """The null-padded tagged union must not leak pandas float64 promotion
    into the output: int64 columns stay int64 even when the other side
    lacks them and carries string columns (the curation_pipeline r4 bug)."""
    import pyarrow as pa

    from lucene_solr_ray.relational import bucketed_join

    left = rd().from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "n_words": pa.array([10, 20, 30], pa.int64()),
        "lang": pa.array(["en", "de", "fr"]),
    }))
    right = rd().from_arrow(pa.table({
        "k": pa.array([2, 3, 4], pa.int64()),
        "tag": pa.array(["x", "y", "z"]),
    }))
    out = bucketed_join(left, right, on="k", num_buckets=2)
    sch = out.schema()
    types = dict(zip(sch.names, sch.types))
    assert types["n_words"] == pa.int64(), types
    assert types["k"] == pa.int64(), types
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert list(df["k"]) == [2, 3]
    assert list(df["n_words"]) == [20, 30]

    # left join: padding nulls on the int side become nulls, not NaN floats
    lo = bucketed_join(right, left, on="k", num_buckets=2, how="left")
    lt = dict(zip(lo.schema().names, lo.schema().types))
    assert lt["n_words"] == pa.int64(), lt
    ldf = lo.to_pandas().sort_values("k").reset_index(drop=True)
    assert ldf["n_words"].isna().tolist() == [False, False, True]


def test_percentile_matches_duckdb(ray_session, con):
    from lucene_solr_ray.relational.ops import percentile_exact

    ds = rd().read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
    got = percentile_exact(ds, "o_totalprice", 0.5)
    exp = con.execute("SELECT quantile_cont(o_totalprice, 0.5) FROM orders").fetchone()[0]
    assert abs(got - exp) < 1e-9


def test_dedup_exact_and_signatures(ray_session):
    from lucene_solr_ray.dedup import dedup_exact, minhash_signatures, simhash_signatures

    docs = rd().read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    w = dedup_exact(docs, "doc_id", "text").to_pandas()
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    exp = t.groupby("text")["doc_id"].min()
    assert sorted(w["doc_id"]) == sorted(exp.tolist())

    sig = minhash_signatures(docs, "doc_id", "text", num_hashes=16).to_pandas()
    assert len(sig) == len(t)
    # near-identical docs share most minhash rows; identical docs share all
    sh = simhash_signatures(docs, "doc_id", "text").to_pandas()
    assert sh["simhash"].nunique() > 1


def test_minhash_lsh_finds_duplicates(ray_session, tmp_path):
    import pyarrow as pa

    from lucene_solr_ray.dedup import dedup_minhash_lsh, ngram_jaccard_pairs

    # construct a corpus with two near-duplicate pairs
    texts = [f"totally unrelated document number {i} with words {i*7} {i*13}"
             for i in range(50)]
    texts[10] = "the quick brown fox jumps over the lazy dog near the river bank"
    texts[20] = "the quick brown fox jumps over the lazy dog near the river bend"
    t = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    p = str(tmp_path / "dup.parquet")
    pq.write_table(t, p)
    ds = rd().read_parquet(p)
    pairs = dedup_minhash_lsh(ds, "doc_id", "text", num_hashes=32, bands=16)
    pdf = pairs.to_pandas()
    assert (10, 20) in set(zip(pdf["left_id"], pdf["right_id"]))
    verified = ngram_jaccard_pairs(ds, pairs, "doc_id", "text", threshold=0.5)
    vdf = verified.to_pandas()
    got = set(zip(vdf["left_id"], vdf["right_id"]))
    assert (10, 20) in got


def test_minhash_verified_at_web_duplication_rate(ray_session, tmp_path):
    """Adversarial 40% duplication (the web-corpus regime): the distributed
    join-verify must return exactly the brute-force answer with no driver
    text dictionary involved."""
    import pyarrow as pa

    from lucene_solr_ray.dedup import dedup_minhash_verified
    from lucene_solr_ray.dedup.ops import _shingle_set

    rng = np.random.default_rng(7)
    n_base, texts = 300, []
    for i in range(n_base):
        words = [f"w{rng.integers(0, 400)}" for _ in range(12)]
        texts.append(" ".join(words))
    # 40% exact/near duplicates: 200 extra docs copying a base doc, half
    # with one word swapped (still J >= 0.8 at k=3 usually not — use exact
    # copies for the planted truth, plus noisy copies that may or may not
    # clear the threshold; truth is recomputed below, not assumed)
    for j in range(200):
        src = int(rng.integers(0, n_base))
        t = texts[src]
        if j % 2:
            ws = t.split(" ")
            ws[0] = "zz%d" % j
            t = " ".join(ws)
        texts.append(t)
    ids = np.arange(len(texts), dtype=np.int64)
    p = str(tmp_path / "web.parquet")
    pq.write_table(pa.table({"doc_id": pa.array(ids),
                             "text": pa.array(texts, pa.string())}), p)
    ds = rd().read_parquet(p)
    out = dedup_minhash_verified(ds, "doc_id", "text", threshold=0.8,
                                 num_hashes=32, bands=16).to_pandas()
    got = set(zip(out["left_id"].astype(int), out["right_id"].astype(int)))

    # brute-force truth over all pairs (n=500 -> 125k pairs, fine in-test)
    sets = [_shingle_set(t, 3) for t in texts]
    truth = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = sets[a], sets[b]
            if len(sa & sb) / max(1, len(sa | sb)) >= 0.8:
                truth.add((a, b))
    assert truth, "test corpus must contain true near-dups"
    # no false positives ever (exact verify); recall structural for exact
    # copies, ~1 - (1-J^2)^16 for near ones — allow the probabilistic tail
    assert got <= truth
    assert len(got) >= 0.98 * len(truth)


def test_ann_brute_force_exact(ray_session):
    from lucene_solr_ray.ann import brute_force_knn, lsh_knn

    emb = rd().read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    q = m[:2]
    got = brute_force_knn(emb, "vec_id", "embedding", q, k=5)
    # numpy reference
    sims = q @ m.T
    ids = np.asarray(t["vec_id"].to_pylist())
    for qi in range(2):
        order = np.lexsort((ids, -sims[qi]))[:5]
        exp = ids[order].tolist()
        rows = got.filter(__import__("pyarrow").compute.equal(got["query_id"], qi))
        assert rows["key"].to_pylist() == exp
    # LSH recall: top-1 (the vector itself) is always found
    lsh = lsh_knn(emb, "vec_id", "embedding", q, k=5, num_planes=8, probes=3)
    top1 = {r["query_id"]: r["key"] for r in lsh.to_pylist() if r["rank"] == 1}
    assert top1[0] == ids[np.argmax(sims[0])]


def test_textstats_and_multimodal(ray_session):
    import pyarrow as pa

    from lucene_solr_ray.multimodal import decode_images, extract_image_features, sample_frames
    from lucene_solr_ray.textstats import doc_fingerprint, language_id, quality_score, token_stats

    docs = rd().read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    q = quality_score(docs, "doc_id", "text").to_pandas()
    assert (q["n_tokens"] > 0).all()
    ts = token_stats(docs, "doc_id", "text").to_pandas()
    assert (ts["ws_tokens"] == ts["bpe_tokens"]).all()  # no punctuation corpus
    fp = doc_fingerprint(docs, "doc_id", "text").to_pandas()
    assert fp["fingerprint"].nunique() > 1
    li = language_id(docs, "doc_id", "text").to_pandas()
    assert set(li.columns) == {"doc_id", "lang_guess", "score"}

    blobs = docs.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "blob": pa.array(
            [s.encode() for s in t["text"].to_pylist()], pa.large_binary())}),
        batch_format="pyarrow")
    d = decode_images(blobs, "doc_id", "blob").to_pandas()
    assert (d["height"] >= 16).all()
    f = extract_image_features(blobs, "doc_id", "blob", feat_dim=8).to_pandas()
    assert len(f["features"].iloc[0]) == 8
    fr = sample_frames(blobs, "doc_id", "blob", every_n=20).to_pandas()
    assert len(fr) >= len(d)
    # strict mode raises the honest stub error
    from lucene_solr_ray.multimodal.ops import _FakeDecoder

    with pytest.raises(NotImplementedError):
        _FakeDecoder(strict=True).decode(b"xx")


def test_lsh_bucketed_index(ray_session, tmp_path):
    """Bucketed layout: search touches only probe partitions yet finds the
    planted exact duplicates (same bucket structurally)."""
    import os

    from lucene_solr_ray.ann.knn import build_lsh_index, lsh_index_search

    emb = rd().read_parquet(f"{SF}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    idx = str(tmp_path / "annidx")
    build_lsh_index(emb, idx, "vec_id", "embedding", num_planes=8)
    n_parts = len([d for d in os.listdir(idx) if d.startswith("bucket=")])
    assert n_parts > 30  # corpus spreads across many partitions
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    q = m[:2]
    got = lsh_index_search(idx, q, k=1, probes=1)
    # top-1 of each query is the query vector itself (identical bucket)
    ids = np.asarray(t["vec_id"].to_pylist())
    top1 = {r["query_id"]: r["key"] for r in got.to_pylist() if r["rank"] == 1}
    assert top1[0] == ids[0] and top1[1] == ids[1]


def test_taxonomy_facet_counts(ray_session, con):
    """Ancestor-rollup path counts == SQL prefix union; drill-down keeps
    only the subtree at/under the prefix."""
    import ray.data as rd

    from lucene_solr_ray.relational import taxonomy_facet_counts

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "lang"])
    got = canon(taxonomy_facet_counts(docs, ["source", "lang"]).to_pandas())
    exp = canon(con.execute("""
        SELECT path, count(*) AS cnt FROM (
          SELECT source AS path FROM documents
          UNION ALL SELECT source || '/' || lang FROM documents
        ) GROUP BY path""").df())
    assert got["path"].tolist() == exp["path"].tolist()
    assert got["cnt"].astype(int).tolist() == exp["cnt"].astype(int).tolist()

    # drill-down: src0 subtree only (the root itself + its children)
    sub = taxonomy_facet_counts(docs, ["source", "lang"],
                                prefix="src0").to_pandas()
    assert all(p == "src0" or p.startswith("src0/") for p in sub["path"])
    root = int(sub.loc[sub["path"] == "src0", "cnt"].iloc[0])
    kids = int(sub.loc[sub["path"] != "src0", "cnt"].sum())
    assert root == kids  # children partition the parent count


def test_minhash_lsh_distributed_join_sieve_parity(ray_session, tmp_path,
                                                   monkeypatch):
    """The three LSH plans — driver lexsort, broadcast sieve, distributed
    join sieve (the 10^12-doc path for O(corpus) multi-bucket key sets) —
    must emit the same candidate pairs."""
    import pyarrow as pa

    from lucene_solr_ray.dedup import dedup_minhash_lsh
    from lucene_solr_ray.dedup import ops as dops

    texts = [f"filler document number {i} with words {i*7} {i*13}"
             for i in range(60)]
    for a, b in ((5, 25), (12, 40), (33, 50)):
        texts[a] = f"shared near duplicate content block variant {a} tail x"
        texts[b] = f"shared near duplicate content block variant {a} tail y"
    t = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    p = str(tmp_path / "dj.parquet")
    pq.write_table(t, p)

    def run():
        ds = rd().read_parquet(p)
        out = dedup_minhash_lsh(ds, "doc_id", "text",
                                num_hashes=32, bands=16).to_pandas()
        return set(zip(out["left_id"], out["right_id"]))

    base = run()                                   # driver lexsort plan
    monkeypatch.setattr(dops, "_DRIVER_LEXSORT_GATE", 0)
    broadcast = run()                              # broadcast sieve plan
    monkeypatch.setattr(dops, "_SIEVE_BROADCAST_GATE", 0)
    joined = run()                                 # distributed join plan
    assert base == broadcast == joined
    assert {(5, 25), (12, 40), (33, 50)} <= base


def test_relatedness_facet(ray_session):
    import ray.data

    from lucene_solr_ray.relational.ops import relatedness_facet

    # buckets: a (3 docs, 2 fg), b (2 docs, 0 fg), c (1 doc, 1 fg)
    rows = [("a", 1), ("a", 1), ("a", 0), ("b", 0), ("b", 0), ("c", 1)]
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows]),
        "fg": pa.array([r[1] for r in rows], pa.int64()),
    }))
    out = relatedness_facet(ds, "k", "fg")
    got = {v: (f, b, r) for v, f, b, r in zip(
        out["value"].to_pylist(), out["fg_count"].to_pylist(),
        out["bg_count"].to_pylist(), out["relatedness"].to_pylist())}
    # fg_size=3, N=6
    # a: fg_pop=2/3, bg_pop=3/6=.5 -> (2/3-.5)/(2/3) = .25
    # b: fg_pop=0, bg_pop=2/6 -> (0-1/3)/(1/3) = -1.0
    # c: fg_pop=1/3, bg_pop=1/6 -> (1/3-1/6)/(1/3) = .5
    assert got == {"a": (2, 3, 0.25), "b": (0, 2, -1.0), "c": (1, 1, 0.5)}
    # sorted by relatedness desc, value asc
    assert out["value"].to_pylist() == ["c", "a", "b"]


def test_sessionize_unit_aware(ray_session):
    """timestamp[ns] and timestamp[s] columns must sessionize identically
    to timestamp[us] (ticks follow the column unit)."""
    import ray.data

    from lucene_solr_ray.relational.ops import sessionize

    base = np.datetime64("2024-01-01T00:00:00", "us")
    # gaps: 10 min (same session), 40 min (new session)
    ts_us = pa.array([base, base + np.timedelta64(600, "s"),
                      base + np.timedelta64(3000, "s")], pa.timestamp("us"))
    want = [0, 0, 1]
    for unit in ("s", "ms", "us", "ns"):
        t = pa.table({
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "ts": ts_us.cast(pa.timestamp(unit)),
        })
        out = sessionize(ray.data.from_arrow(t), "user_id", "ts",
                         ["ts", "event_id"], 1800.0,
                         keep_cols=["event_id"]).to_pandas()
        got = dict(zip(out["event_id"], out["session_id"]))
        assert [got[1], got[2], got[3]] == want, unit


def test_group_topk_and_unique_high_cardinality(ray_session):
    """The segmented kernels must handle ~1M distinct groups in seconds —
    the per-group pandas map_groups this replaced ran one Python call per
    group (minutes at this cardinality)."""
    import time

    import numpy as np
    import pyarrow as pa

    from lucene_solr_ray.relational.ops import group_top_k, unique_first

    n = 2_000_000
    rng = np.random.RandomState(7)
    t = pa.table({
        "k": pa.array(rng.randint(0, 1_000_000, n), pa.int64()),
        "v": pa.array(rng.rand(n)),
        "tag": pa.array(rng.randint(0, 50, n), pa.int64()),
    })
    ds = rd().from_arrow(t)
    t0 = time.time()
    out = group_top_k(ds, "k", "v", 1, descending=True)
    n_top = out.count()
    t1 = time.time()
    uo = unique_first(ds, ["k"])
    n_uniq = uo.count()
    t2 = time.time()
    n_keys = len(np.unique(t["k"].to_numpy()))
    assert n_top == n_keys
    assert n_uniq == n_keys
    assert t1 - t0 < 60 and t2 - t1 < 60, (t1 - t0, t2 - t1)

    # correctness on a small slice: top-1 by v matches a numpy argmax
    small = pa.table({
        "k": pa.array([1, 1, 2, 2, 2], pa.int64()),
        "v": pa.array([0.5, 0.9, 0.1, 0.8, 0.3]),
        "tag": pa.array([0, 1, 2, 3, 4], pa.int64()),
    })
    out = group_top_k(rd().from_arrow(small), "k", "v", 1).to_pandas()
    got = dict(zip(out["k"], out["tag"]))
    assert got == {1: 1, 2: 3}
