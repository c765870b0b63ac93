"""Streaming-expression front-end: parser, evaluators, stream composition.

Mirrors the reference's StreamExpressionParser / Lang registry test shapes
(solrj io/stream/StreamExpressionTest.java role) against DuckDB oracles on
the sf0.001 tables.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from lucene_solr_ray.relational.streams import (
    SExpr, StreamContext, compile_evaluator, parse_expression, run_expression,
)

SF = "/root/testdata/sf0.001"


def tables():
    return {
        name: os.path.join(SF, f"{name}.parquet")
        for name in ("lineitem", "orders", "customer", "nation", "documents")
    }


def duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name, path in tables().items():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def test_parse_nested_and_named():
    e = parse_expression(
        'rollup(search(col1, q="body:web", rows=5), over="a,b", sum(x), count(*))'
    )
    assert e.name == "rollup"
    assert isinstance(e.args[0], SExpr) and e.args[0].name == "search"
    assert e.args[0].args == ["col1"]
    assert e.args[0].named["q"] == "body:web"
    assert e.args[0].named["rows"] == "5"
    assert e.named["over"] == "a,b"
    assert [a.name for a in e.args[1:]] == ["sum", "count"]
    assert e.args[2].args == ["*"]


def test_parse_quoted_escapes_and_alias():
    e = parse_expression(r'select(table(t), concat(a, "x\"y") as c)')
    alias = e.args[1]
    assert alias.name == "__alias" and alias.args[1] == "c"
    assert alias.args[0].args[1] == 'x"y'


def test_parse_errors():
    for bad in ["rollup(", "f(a,)", 'f("unterminated)', "f(a))", "noparens"]:
        with pytest.raises(ValueError):
            parse_expression(bad)


# ---------------------------------------------------------------------------
# evaluators
# ---------------------------------------------------------------------------

def _ev(src: str, t: pa.Table | None = None, ctx=None):
    return compile_evaluator(parse_expression(src), ctx or StreamContext())(t)


def test_evaluator_arithmetic_vectorized():
    t = pa.table({"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0]})
    np.testing.assert_allclose(_ev("add(a, mult(2, b))", t), [9, 12, 15])
    np.testing.assert_allclose(_ev("pow(a, 2)", t), [1, 4, 9])
    np.testing.assert_allclose(_ev("log(a)", t), np.log([1, 2, 3]))
    np.testing.assert_allclose(_ev("round(div(b, a))", t), [4, 2, 2])


def test_evaluator_bool_string_if():
    t = pa.table({"a": [1, 5, 10], "s": ["x", "y", "z"]})
    np.testing.assert_array_equal(
        _ev("and(gt(a, 2), lt(a, 8))", t), [False, True, False])
    np.testing.assert_array_equal(
        _ev('if(gteq(a, 5), "hi", "lo")', t), ["lo", "hi", "hi"])
    np.testing.assert_array_equal(
        _ev('concat(upper(s), "-", a)', t), ["X-1", "Y-5", "Z-10"])


def test_evaluator_temporal():
    t = pa.table({"d": pa.array(
        pd.to_datetime(["2024-01-15 10:30:00", "2025-12-31 23:59:59"]))})
    np.testing.assert_array_equal(_ev("year(d)", t), [2024, 2025])
    np.testing.assert_array_equal(_ev("month(d)", t), [1, 12])
    np.testing.assert_array_equal(_ev("hour(d)", t), [10, 23])


def test_evaluator_column_stats():
    ctx = StreamContext()
    ctx.lets["xs"] = np.array([1.0, 2.0, 3.0, 4.0])
    ctx.lets["ys"] = np.array([2.0, 4.0, 6.0, 8.0])
    assert _ev("mean(xs)", ctx=ctx) == 2.5
    assert abs(_ev("corr(xs, ys)", ctx=ctx) - 1.0) < 1e-12
    assert _ev("l2norm(array(3, 4))", ctx=ctx) == 5.0
    assert _ev("euclidean(xs, ys)", ctx=ctx) == pytest.approx(
        np.linalg.norm([1, 2, 3, 4]))


# ---------------------------------------------------------------------------
# stream composition vs DuckDB oracle
# ---------------------------------------------------------------------------

def test_rollup_having_sort_oracle(ray_session):
    got = run_expression(
        'sort(having(rollup(table(lineitem), over="l_returnflag,l_linestatus",'
        ' count(*), sum(l_quantity)), gt(count(*), 100)),'
        ' by="l_returnflag asc, l_linestatus asc")',
        tables=tables(),
    ).to_pandas()
    want = duck("""
        SELECT l_returnflag, l_linestatus, count(*) AS cnt,
               sum(l_quantity) AS sq
        FROM lineitem GROUP BY 1, 2 HAVING count(*) > 100 ORDER BY 1, 2
    """)
    assert len(got) == len(want)
    np.testing.assert_array_equal(
        got["l_returnflag"].to_numpy(), want["l_returnflag"].to_numpy())
    np.testing.assert_array_equal(
        got["count(*)"].to_numpy(), want["cnt"].to_numpy())
    np.testing.assert_allclose(
        np.sort(got["sum(l_quantity)"].to_numpy()),
        np.sort(want["sq"].to_numpy().astype(float)))


def test_select_computed_and_top(ray_session):
    got = run_expression(
        'top(select(table(orders), o_orderkey, mult(o_totalprice, 2) as dbl),'
        ' n=5, sort="dbl desc")',
        tables=tables(),
    ).to_pandas()
    want = duck("""
        SELECT o_orderkey, o_totalprice * 2 AS dbl FROM orders
        ORDER BY dbl DESC LIMIT 5
    """)
    np.testing.assert_array_equal(
        got["o_orderkey"].to_numpy(), want["o_orderkey"].to_numpy())
    np.testing.assert_allclose(got["dbl"].to_numpy(), want["dbl"].to_numpy())


def test_inner_join_oracle(ray_session):
    got = run_expression(
        'innerJoin(table(orders), table(customer), on="o_custkey=c_custkey")',
        tables=tables(),
    ).to_pandas()
    want = duck(
        "SELECT count(*) c FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey")
    assert len(got) == int(want["c"][0])


def test_intersect_complement(ray_session):
    inter = run_expression(
        'intersect(table(orders), table(customer), on="o_custkey=c_custkey")',
        tables=tables(),
    )
    want = duck("""
        SELECT count(*) c FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer)
    """)
    assert inter.count() == int(want["c"][0])

    comp = run_expression(
        'complement(table(customer), table(orders), on="c_custkey=o_custkey")',
        tables=tables(),
    )
    want2 = duck("""
        SELECT count(*) c FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """)
    assert comp.count() == int(want2["c"][0])


def test_unique_and_cartesian(ray_session):
    uq = run_expression(
        'unique(select(table(orders), o_orderpriority), over="o_orderpriority")',
        tables=tables(),
    ).to_pandas()
    want = duck("SELECT count(DISTINCT o_orderpriority) c FROM orders")
    assert len(uq) == int(want["c"][0])

    ex = run_expression(
        'cartesianProduct(select(table(documents), doc_id, text), text as tok)',
        tables=tables(),
    )
    want2 = duck(
        "SELECT count(*) c FROM (SELECT unnest(string_split(text, ' ')) FROM documents)")
    assert ex.count() == int(want2["c"][0])


def test_let_get_tuple_cell(ray_session):
    ctx = StreamContext(tables=tables())
    out = run_expression(
        'let(a=table(nation), b=3.5, get(a))', ctx=ctx).to_pandas()
    assert len(out) == duck("SELECT count(*) c FROM nation")["c"][0]
    assert ctx.lets["b"] == 3.5

    tup = run_expression(
        'let(x=stats(table(orders), sum(o_totalprice)),'
        ' tuple(m=col(x, "sum(o_totalprice)")))',
        ctx=StreamContext(tables=tables()),
    ).to_pandas()
    want = duck("SELECT sum(o_totalprice) s FROM orders")
    assert tup["m"][0][0] == pytest.approx(float(want["s"][0]))

    cell = run_expression(
        'cell(rows, top(table(nation), n=3, sort="n_nationkey asc"))',
        tables=tables(),
    ).to_pandas()
    assert [r["n_nationkey"] for r in cell["rows"][0]] == [0, 1, 2]


def test_echo_list_priority_null_eval(ray_session):
    assert run_expression('echo("hello world")').to_pandas()["echo"][0] == \
        "hello world"

    both = run_expression(
        'list(echo("a"), echo("b"))').to_pandas()["echo"].tolist()
    assert both == ["a", "b"]

    pr = run_expression(
        'priority(noop(), echo("low"))').to_pandas()
    assert pr["echo"][0] == "low"

    nl = run_expression('null(table(nation))', tables=tables()).to_pandas()
    assert nl["nullCount"][0] == int(duck("SELECT count(*) c FROM nation")["c"][0])

    ev = run_expression('eval("echo(\\"inner\\")")').to_pandas()
    assert ev["echo"][0] == "inner"


def test_random_deterministic_and_fetch(ray_session):
    a = run_expression('random(orders, rows=7, seed=11)', tables=tables())
    b = run_expression('random(orders, rows=7, seed=11)', tables=tables())
    ka = sorted(a.to_pandas()["o_orderkey"])
    assert len(ka) == 7
    assert ka == sorted(b.to_pandas()["o_orderkey"])

    f = run_expression(
        'fetch(customer, top(table(orders), n=5, sort="o_orderkey asc"),'
        ' on="o_custkey=c_custkey", fl="c_name")',
        tables=tables(),
    ).to_pandas()
    assert "c_name" in f.columns and len(f) == 5


def test_search_stream(ray_session, tmp_path):
    import glob

    from lucene_solr_ray.index import IndexBuildConfig
    from lucene_solr_ray.pipelines.flagship import build_corpus_index

    idx = str(tmp_path / "expr_idx")
    files = sorted(glob.glob(os.path.join(SF, "documents.parquet")))
    build_corpus_index(files, idx,
                       cfg=IndexBuildConfig(num_shards=2, num_buckets=4),
                       from_html=False)
    out = run_expression(
        'select(search(docs, q="merge", rows=5), doc_id, score)',
        collections={"docs": idx},
    ).to_pandas()
    assert len(out) <= 5 and {"doc_id", "score"} == set(out.columns)
    assert (out["score"] > 0).all()


def test_analyze_stream(ray_session, sf_dir):
    """analyze(text) emits one row per token of the standard chain
    (regression: the (terms, positions) tuple leaked into the column)."""
    got = run_expression('analyze("Hello, World! FOO")')
    assert got.to_pandas()["term"].tolist() == ["hello", "world", "foo"]


def test_facet_stream(ray_session):
    got = run_expression(
        'facet(table(documents), buckets="lang", count(*), sum(n_chars), '
        'bucketSorts="count(*) desc, lang asc", bucketSizeLimit=3)',
        tables=tables(),
    ).to_pandas()
    want = duck("""
        SELECT lang, count(*) AS cnt, sum(n_chars) AS s
        FROM documents GROUP BY lang
        ORDER BY cnt DESC, lang ASC LIMIT 3""")
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["count(*)"].astype(int).tolist() == want["cnt"].astype(int).tolist()
    assert got["sum(n_chars)"].astype(int).tolist() == want["s"].astype(int).tolist()


def test_timeseries_stream(ray_session):
    got = run_expression(
        'timeseries(table(orders), field="o_orderdate", gap="month", '
        'count(*))',
        tables=tables(),
    ).to_pandas()
    want = duck("""
        SELECT date_trunc('month', o_orderdate) AS b, count(*) AS cnt
        FROM orders GROUP BY b ORDER BY b""")
    assert len(got) == len(want)
    assert got["count(*)"].astype(int).tolist() == want["cnt"].astype(int).tolist()


def test_stddev_metric(ray_session):
    got = run_expression(
        'rollup(table(documents), over="lang", stddev(n_chars), count(*))',
        tables=tables(),
    ).to_pandas().sort_values("lang").reset_index(drop=True)
    want = duck("""
        SELECT lang, stddev_samp(n_chars) AS sd, count(*) AS cnt
        FROM documents GROUP BY lang ORDER BY lang""")
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["stddev(n_chars)"].tolist() == pytest.approx(
        want["sd"].tolist(), rel=1e-9)


def test_nodes_and_shortest_path_verbs(ray_session, tmp_path):
    import pyarrow.parquet as pq

    p = str(tmp_path / "edges.parquet")
    pq.write_table(pa.table({
        "src": pa.array([0, 0, 1, 2, 3], pa.int64()),
        "dst": pa.array([1, 2, 3, 3, 4], pa.int64()),
    }), p)
    tbls = {"edges": p}
    got = run_expression(
        'nodes(edges, walk="src->dst", root="0", depth=2)',
        tables=tbls).to_pandas()
    lv = dict(zip(got["node"], got["level"]))
    assert lv == {0: 0, 1: 1, 2: 1, 3: 2}
    sp = run_expression(
        'shortestPath(edges, edge="src->dst", from=0, to=4, maxDepth=4)',
        tables=tbls).to_pandas()
    assert sp["node"].tolist() == [0, 1, 3, 4] or sp["node"].tolist() == [0, 2, 3, 4]


def test_facet2d_matches_pandas(ray_session):
    """facet2D (Facet2DStream.java:57): top-x by metric then top-y within
    each — parity with a pandas nested top-k."""
    import pandas as pd
    import pyarrow.parquet as pq

    from lucene_solr_ray.relational.streams import run_expression

    got = run_expression(
        'facet2D(table(documents), x="lang", y="source", '
        'dimensions="3,2", count(*))',
        tables={"documents": "/root/testdata/sf0.001/documents.parquet"},
    ).to_pandas()
    df = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                       columns=["lang", "source"]).to_pandas()
    cells = (df.groupby(["lang", "source"]).size()
             .rename("count(*)").reset_index())
    xt = (cells.groupby("lang")["count(*)"].sum()
          .sort_values(ascending=False))
    top_x = sorted(xt.index[:3], key=lambda v: (-xt[v], v))
    want = []
    for xv in top_x:
        sub = cells[cells["lang"] == xv].sort_values(
            ["count(*)", "source"], ascending=[False, True]).head(2)
        want += [(xv, r["source"], r["count(*)"]) for _, r in
                 sub.iterrows()]
    assert list(map(tuple, got[["lang", "source", "count(*)"]]
                    .itertuples(index=False))) == want
