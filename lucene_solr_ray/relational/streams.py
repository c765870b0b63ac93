"""Streaming-expression front-end: the reference's /stream language.

Three layers, mirroring the reference's registry design
(solr/solrj/src/java/org/apache/solr/client/solrj/io/Lang.java:38-361):

1. a parser for the s-expression grammar
   (io/stream/expr/StreamExpressionParser.java:40 role) — `name(arg, arg,
   key=value, ...)`, nested expressions, double-quoted strings;
2. a vectorized evaluator registry (io/eval/*, 249 files in the reference;
   here the arithmetic / boolean / string / temporal / column-statistics
   core as numpy kernels over Arrow batches, plus the math families —
   matrices, sequences, time series, statistics with real t/F p-values,
   probability distributions, model fit + predict, k-means, FFT — from
   evaluators.py);
3. stream constructors that compose the EXISTING Ray Data operators in
   `relational.ops`, `pipelines.sources` and `search.searcher` — every
   stream stays a lazy Dataset; only the explicitly tuple-shaped streams
   (`tuple`, `cell`, `echo`, `let` echoes) materialize, and those are
   one-row by construction.

The reference evaluates these expressions tuple-at-a-time on one
coordinator node unless wrapped in parallel(); here every per-tuple
evaluator runs vectorized inside map_batches and every relational stream is
a distributed Dataset op, so parallel()/export()/shuffle() are identity
wrappers — the Ray Data executor IS the parallel stream.

Module-owned verbs are intentionally NOT registered here: update/delete/
commit (index.maintenance), topic/daemon (search.topic), train/features/
knn (relational.ml), significantTerms (search.services). They have direct
Python APIs; the expression language covers the relational composition
layer the reference routes through /stream.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data import Dataset

from . import ops

# intersect/complement right sides up to this many keys broadcast via
# ray.put (one copy in the object store, read per task); above it the
# key column would strain the driver heap, so the plan switches to a
# distributed left_semi/left_anti hash join (same gate discipline as
# dedup/ops.py:34 _SIEVE_BROADCAST_GATE)
_SEMI_BROADCAST_GATE = 5_000_000

__all__ = [
    "SExpr", "parse_expression", "StreamContext", "run_expression",
    "compile_evaluator",
]


# ---------------------------------------------------------------------------
# parser (StreamExpressionParser.java:40 role)
# ---------------------------------------------------------------------------

@dataclass
class SExpr:
    """One parsed expression node: name(args..., named=...)."""

    name: str
    args: list = field(default_factory=list)       # SExpr | str
    named: dict = field(default_factory=dict)      # str -> SExpr | str

    def __repr__(self) -> str:  # round-trippable-ish, for error messages
        parts = [repr(a) if isinstance(a, SExpr) else str(a) for a in self.args]
        parts += [f"{k}={v!r}" if isinstance(v, SExpr) else f"{k}={v}"
                  for k, v in self.named.items()]
        return f"{self.name}({', '.join(parts)})"


_BARE_END = set(',()="')


def parse_expression(src: str) -> SExpr:
    """Parse one streaming expression. Raises ValueError on malformed input."""
    s = src
    n = len(s)
    pos = 0

    def err(msg: str):
        return ValueError(f"{msg} at {pos} in {src!r}")

    def skip_ws():
        nonlocal pos
        while pos < n and s[pos].isspace():
            pos += 1

    def parse_quoted() -> str:
        nonlocal pos
        assert s[pos] == '"'
        pos += 1
        out = []
        while pos < n:
            c = s[pos]
            if c == "\\" and pos + 1 < n and s[pos + 1] in '\\"':
                out.append(s[pos + 1])
                pos += 2
                continue
            if c == '"':
                pos += 1
                return "".join(out)
            out.append(c)
            pos += 1
        raise err("unterminated string")

    def parse_bare() -> str:
        nonlocal pos
        start = pos
        while pos < n and s[pos] not in _BARE_END:
            pos += 1
        tok = s[start:pos].strip()
        if not tok:
            raise err("empty token")
        return tok

    def parse_value():
        nonlocal pos
        skip_ws()
        if pos >= n:
            raise err("unexpected end")
        if s[pos] == '"':
            return parse_quoted()
        tok = parse_bare()
        skip_ws()
        if pos < n and s[pos] == "(":
            call = parse_call(tok)
            skip_ws()
            # trailing "as alias" (SelectStream computed-column syntax:
            # select(s, add(a,b) as c))
            if s[pos:pos + 3] in ("as ", "as\t"):
                pos += 3
                skip_ws()
                return SExpr("__alias", [call, parse_bare()])
            return call
        return tok

    def parse_call(name: str) -> SExpr:
        nonlocal pos
        assert s[pos] == "("
        pos += 1
        node = SExpr(name)
        skip_ws()
        if pos < n and s[pos] == ")":
            pos += 1
            return node
        while True:
            v = parse_value()
            skip_ws()
            if isinstance(v, str) and pos < n and s[pos] == "=":
                pos += 1
                node.named[v] = parse_value()
                skip_ws()
            else:
                node.args.append(v)
            if pos >= n:
                raise err("missing ')'")
            if s[pos] == ",":
                pos += 1
                continue
            if s[pos] == ")":
                pos += 1
                return node
            raise err(f"unexpected {s[pos]!r}")

    skip_ws()
    head = parse_bare()
    skip_ws()
    if pos >= n or s[pos] != "(":
        raise err("expected '(' after stream name")
    node = parse_call(head)
    skip_ws()
    if pos != n:
        raise err("trailing input")
    return node


_NUM_RE = re.compile(r"^-?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _coerce(tok):
    """Bare-token literal coercion (StreamFactory.constructPrimitiveObject)."""
    if not isinstance(tok, str):
        return tok
    if _NUM_RE.match(tok):
        f = float(tok)
        return int(f) if f.is_integer() and "." not in tok and "e" not in tok.lower() else f
    if tok == "true":
        return True
    if tok == "false":
        return False
    return tok


# ---------------------------------------------------------------------------
# evaluator registry (io/eval/* role, Lang.java:117-361 names)
# ---------------------------------------------------------------------------

def _variadic(fn):
    def apply(*xs):
        out = xs[0]
        for x in xs[1:]:
            out = fn(out, x)
        return out
    return apply


def _num(x):
    if isinstance(x, np.ndarray) and x.dtype == object:
        return x.astype(np.float64)
    return x


def _wrap_num(fn):
    return lambda *xs: fn(*(_num(x) for x in xs))


def _str_concat(*xs):
    parts = []
    size = next((len(x) for x in xs if isinstance(x, np.ndarray)), None)
    for x in xs:
        if isinstance(x, np.ndarray):
            parts.append(x.astype(str))
        else:
            parts.append(np.full(size or 1, str(x)))
    out = parts[0]
    for p in parts[1:]:
        out = np.char.add(out, p)
    return out


def _dt(x) -> pd.DatetimeIndex:
    return pd.DatetimeIndex(pd.to_datetime(np.asarray(x)))


def _percentile(arr, p):
    # reference PercentileEvaluator: commons-math Percentile (R-6/estimation
    # LEGACY). numpy 'linear' (R-7) differs; use 'inverted_cdf'-free simple
    # approach matching DuckDB quantile_cont for oracle parity.
    return float(np.quantile(_num(np.asarray(arr)), p / 100.0, method="linear"))


_EVALUATORS: dict = {
    # arithmetic (variadic where the reference's are)
    "add": _wrap_num(_variadic(np.add)),
    "sub": _wrap_num(_variadic(np.subtract)),
    "mult": _wrap_num(_variadic(np.multiply)),
    "div": _wrap_num(_variadic(np.divide)),
    "mod": _wrap_num(np.mod),
    "pow": _wrap_num(np.power),
    "abs": _wrap_num(np.abs),
    "log": _wrap_num(np.log),        # NaturalLogEvaluator
    "log10": _wrap_num(np.log10),
    "sqrt": _wrap_num(np.sqrt),
    "cbrt": _wrap_num(np.cbrt),
    "ceil": _wrap_num(np.ceil),
    "ceiling": _wrap_num(np.ceil),
    "floor": _wrap_num(np.floor),
    "round": _wrap_num(lambda x: np.round(x)),
    "trunc": _wrap_num(np.trunc),
    "sin": _wrap_num(np.sin), "cos": _wrap_num(np.cos), "tan": _wrap_num(np.tan),
    "asin": _wrap_num(np.arcsin), "acos": _wrap_num(np.arccos),
    "atan": _wrap_num(np.arctan),
    "sinh": _wrap_num(np.sinh), "cosh": _wrap_num(np.cosh),
    "tanh": _wrap_num(np.tanh),
    "expr": None,  # placeholder, set below (avoid name clash with builtins)
    # boolean
    "and": _variadic(np.logical_and),
    "or": _variadic(np.logical_or),
    "not": np.logical_not,
    "eor": np.logical_xor,
    "eq": lambda a, b: np.asarray(a) == np.asarray(b),
    "gt": _wrap_num(np.greater),
    "gteq": _wrap_num(np.greater_equal),
    "lt": _wrap_num(np.less),
    "lteq": _wrap_num(np.less_equal),
    "if": lambda c, a, b: np.where(c, a, b),
    "coalesce": _variadic(lambda a, b: np.where(pd.isna(a), b, a)),
    # string
    "concat": _str_concat,
    "upper": lambda x: np.char.upper(np.asarray(x, dtype=str)),
    "lower": lambda x: np.char.lower(np.asarray(x, dtype=str)),
    "trim": lambda x: np.char.strip(np.asarray(x, dtype=str)),
    # temporal (TemporalEvaluator* names)
    "year": lambda x: _dt(x).year.to_numpy(),
    "month": lambda x: _dt(x).month.to_numpy(),
    "day": lambda x: _dt(x).day.to_numpy(),
    "dayOfYear": lambda x: _dt(x).dayofyear.to_numpy(),
    "hour": lambda x: _dt(x).hour.to_numpy(),
    "minute": lambda x: _dt(x).minute.to_numpy(),
    "second": lambda x: _dt(x).second.to_numpy(),
    "epoch": lambda x: (_dt(x).asi8 // 10**6),  # ms, like the reference
    "week": lambda x: _dt(x).isocalendar().week.to_numpy().astype(np.int64),
    "quarter": lambda x: _dt(x).quarter.to_numpy(),
    # column statistics (driver-scale arrays bound via let/col)
    "mean": lambda a: float(np.mean(_num(np.asarray(a)))),
    "var": lambda a: float(np.var(_num(np.asarray(a)), ddof=1)),
    "stddev": lambda a: float(np.std(_num(np.asarray(a)), ddof=1)),
    "sumSq": lambda a: float(np.sum(_num(np.asarray(a)) ** 2)),
    "percentile": _percentile,
    "corr": lambda a, b: float(np.corrcoef(_num(np.asarray(a)),
                                           _num(np.asarray(b)))[0, 1]),
    "cov": lambda a, b: float(np.cov(_num(np.asarray(a)),
                                     _num(np.asarray(b)), ddof=1)[0, 1]),
    "l1norm": lambda a: float(np.sum(np.abs(_num(np.asarray(a))))),
    "l2norm": lambda a: float(np.linalg.norm(_num(np.asarray(a)))),
    "linfnorm": lambda a: float(np.max(np.abs(_num(np.asarray(a))))),
    "euclidean": lambda a, b: float(np.linalg.norm(_num(np.asarray(a)) - _num(np.asarray(b)))),
    "manhattan": lambda a, b: float(np.sum(np.abs(_num(np.asarray(a)) - _num(np.asarray(b))))),
    "chebyshev": lambda a, b: float(np.max(np.abs(_num(np.asarray(a)) - _num(np.asarray(b))))),
    "cosine": lambda a, b: 1.0 - float(
        np.dot(_num(np.asarray(a)), _num(np.asarray(b)))
        / (np.linalg.norm(_num(np.asarray(a))) * np.linalg.norm(_num(np.asarray(b))))
    ),
    "zscores": lambda a: ((_num(np.asarray(a)) - np.mean(_num(np.asarray(a))))
                          / np.std(_num(np.asarray(a)), ddof=1)),
    "minMaxScale": lambda a: ((_num(np.asarray(a)) - np.min(_num(np.asarray(a))))
                              / (np.max(_num(np.asarray(a))) - np.min(_num(np.asarray(a))))),
    "normalizeSum": lambda a: _num(np.asarray(a)) / np.sum(_num(np.asarray(a))),
    "array": lambda *xs: np.asarray(list(xs)),
    "valueAt": lambda a, i: np.asarray(a)[int(i)],
    "length": lambda a: len(np.asarray(a)),
    "rev": lambda a: np.asarray(a)[::-1],
    "asc": lambda a: np.sort(np.asarray(a)),
    "precision": lambda a, d: np.round(_num(np.asarray(a)), int(d)),
    "val": lambda x: x,
}
del _EVALUATORS["expr"]

# extended families (matrices, sequences, time series, statistics with real
# t/F p-values, probability distributions, model fit + predict, clustering,
# FFT) live in evaluators.py; core entries keep precedence on name clashes
from .evaluators import EXTENDED_EVALUATORS  # noqa: E402

for _k, _v in EXTENDED_EVALUATORS.items():
    _EVALUATORS.setdefault(_k, _v)
del _k, _v

_METRIC_KINDS = {"sum": "sum", "min": "min", "max": "max",
                 "avg": "mean", "count": "count",
                 # StatsStream stddev metric (io/stream/metrics/
                 # StdMetric.java role): sample stddev, Welford-combined
                 # across blocks by Ray's Std aggregate
                 "std": "std", "stddev": "std"}


def compile_evaluator(node, ctx: "StreamContext"):
    """Compile an evaluator s-expr -> fn(pa.Table | None) -> ndarray/scalar.

    Identifier resolution order per token: table column, let binding,
    literal. Quoted strings arrive already as str and are literal only when
    they don't name a column (the reference resolves field names the same
    way: eval/FieldValueEvaluator.java:36)."""

    def ev(nd, t: pa.Table | None):
        if isinstance(nd, str):
            if t is not None and nd in t.column_names:
                return t[nd].to_numpy(zero_copy_only=False)
            if nd in ctx.lets:
                return ctx.lets[nd]
            return _coerce(nd)
        if nd.name == "col":
            var, fld = nd.args
            src = ctx.lets[var] if isinstance(var, str) else build_stream(var, ctx)
            if isinstance(src, Dataset):
                # driver-scale extraction, like the reference's ColumnEvaluator
                # over a let-bound tuple list (eval/ColumnEvaluator.java:40)
                return src.select_columns([fld]).to_pandas()[fld].to_numpy()
            return np.asarray(src)
        if nd.name in _METRIC_KINDS and t is not None:
            # metric reference in a post-rollup predicate: having(rollup(...,
            # count(*)), gt(count(*), N)) names the output COLUMN, exactly
            # like the reference's HavingStream over RollupStream output
            label = f"{nd.name}({nd.args[0] if nd.args else '*'})"
            if label in t.column_names:
                return t[label].to_numpy(zero_copy_only=False)
        fn = _EVALUATORS.get(nd.name)
        if fn is None:
            raise ValueError(f"unknown evaluator {nd.name!r}")
        args = [ev(a, t) for a in nd.args]
        return fn(*args)

    return lambda t=None: ev(node, t)


# ---------------------------------------------------------------------------
# stream constructors (Lang.java:38-99 names)
# ---------------------------------------------------------------------------

class StreamContext:
    """Execution context: named parquet tables, named index collections,
    let-variable bindings (StreamContext.java:38 role)."""

    def __init__(self, tables: dict[str, str] | None = None,
                 collections: dict[str, str] | None = None):
        self.tables = dict(tables or {})
        self.collections = dict(collections or {})
        self.lets: dict = {}
        self._searchers: dict = {}

    def searcher(self, collection: str):
        from ..search.searcher import IndexSearcher

        if collection not in self._searchers:
            self._searchers[collection] = IndexSearcher(
                self.collections[collection])
        return self._searchers[collection]


def _csv(v) -> list[str]:
    return [x.strip() for x in str(v).split(",") if x.strip()]


def _sort_keys(spec) -> list[tuple[str, bool]]:
    keys = []
    for part in _csv(spec):
        bits = part.split()
        keys.append((bits[0], len(bits) > 1 and bits[1].lower() == "desc"))
    return keys


def _metrics(nodes):
    aggs = []
    for m in nodes:
        if not isinstance(m, SExpr) or m.name not in _METRIC_KINDS:
            raise ValueError(f"expected metric, got {m!r}")
        col = None if m.name == "count" else m.args[0]
        label = f"{m.name}({m.args[0] if m.args else '*'})"
        aggs.append((_METRIC_KINDS[m.name], col, label))
    return aggs


def _one_tuple(cols: dict) -> Dataset:
    return ray.data.from_arrow(pa.table({k: [v] for k, v in cols.items()}))


def _explode(ds: Dataset, fld: str, out: str | None = None) -> Dataset:
    """cartesianProduct: one output tuple per value of a multivalued field
    (io/stream/CartesianProductStream.java:47). List columns flatten
    zero-copy; string columns split on whitespace."""
    out = out or fld

    def ex(t: pa.Table) -> pa.Table:
        col = t[fld]
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            lists = col.combine_chunks()
        else:
            import pyarrow.compute as pc
            lists = pc.split_pattern(col, " ").combine_chunks()
        import pyarrow.compute as pc
        lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(len(t)), lens)
        cols = {}
        for name in t.column_names:
            if name == fld:
                continue
            cols[name] = t[name].take(pa.array(idx))
        cols[out] = pc.list_flatten(lists)
        return pa.table(cols)

    return ds.map_batches(ex, batch_format="pyarrow")


def build_stream(node: SExpr, ctx: StreamContext) -> Dataset:
    """Construct the lazy Dataset for a parsed stream expression."""
    name, args, named = node.name, node.args, node.named

    def sub(i=0) -> Dataset:
        return build_stream(args[i], ctx)

    if name == "table":  # extension: named parquet table as a source
        return ray.data.read_parquet(ctx.tables[args[0]])

    if name in ("jdbc", "sql"):
        from ..pipelines.sources import read_sql
        return read_sql(str(named.get("sql") or args[0]), views=ctx.tables)

    if name == "search":
        coll = args[0]
        q = str(named.get("q", "*:*"))
        rows = int(_coerce(named.get("rows", 10)))
        tbl = ctx.searcher(coll).search(q, k=rows)
        out = ray.data.from_arrow(tbl)
        if "fl" in named:
            fl = _csv(named["fl"])
            keep = [c for c in ("doc_id", "score", "rank") if c in fl] or ["doc_id"]
            out = out.select_columns(keep)
        return out

    if name == "select":
        ds = sub()
        exprs: dict = {}
        for a in args[1:]:
            if isinstance(a, str):
                m = re.match(r"^(\S+)\s+as\s+(\S+)$", a)
                if m:
                    exprs[m.group(2)] = m.group(1)
                else:
                    exprs[a] = a
            elif a.name == "__alias":  # select(s, add(a,b) as c)
                fn = compile_evaluator(a.args[0], ctx)
                exprs[a.args[1]] = (lambda f: lambda t: pa.array(f(t)))(fn)
            else:
                raise ValueError(
                    "computed select columns need an alias: "
                    "select(s, add(a,b) as c) or c=add(a,b)")
        for out_name, expr in named.items():
            if isinstance(expr, SExpr):
                fn = compile_evaluator(expr, ctx)
                exprs[out_name] = (lambda f: lambda t: pa.array(f(t)))(fn)
            else:
                exprs[out_name] = str(expr)
        return ops.select(ds, exprs)

    if name == "having":
        ds = sub()
        fn = compile_evaluator(args[1], ctx)
        return ops.having(ds, lambda t: pa.array(np.asarray(fn(t), dtype=bool)))

    if name == "sort":
        return ops.sort_limit(sub(), _sort_keys(named.get("by") or args[1]))

    if name in ("top", "rank"):
        k = int(_coerce(named.get("n", 10)))
        return ops.sort_limit(sub(), _sort_keys(named["sort"]), k=k)

    if name in ("rollup", "hashRollup"):
        keys = _csv(named.get("over", ""))
        return ops.rollup(sub(), keys, _metrics(args[1:]))

    if name == "facet":
        # FacetStream (io/stream/FacetStream.java:72): bucketed metrics
        # pushed into the engine (here: Ray groupby), with bucketSorts and
        # bucketSizeLimit
        keys = _csv(named["buckets"])
        out = ops.rollup(sub(), keys, _metrics(args[1:]))
        sorts = named.get("bucketSorts")
        if sorts:
            out = ops.sort_limit(out, _sort_keys(sorts))
        lim = named.get("bucketSizeLimit")
        return out.limit(int(_coerce(lim))) if lim else out

    if name == "facet2D":
        # Facet2DStream (io/stream/Facet2DStream.java:57): nested terms
        # facet — top dimX x-buckets by the metric, top dimY y-buckets
        # within each, both metric-desc with value-asc ties (the json.facet
        # the reference pushes down, appendJson:352-384). The x-level
        # metric aggregates the raw stream (exact for every metric kind,
        # where a sum-of-partials would break avg/min/max).
        xf, yf = str(named["x"]), str(named["y"])
        dims = str(_coerce(named.get("dimensions", "10,10")))
        parts = dims.split(",")
        dx, dy = int(parts[0]), int(parts[1] if len(parts) > 1 else parts[0])
        mets = (_metrics(args[1:]) if len(args) > 1
                else [("count", None, "count(*)")])
        kind, col, label = mets[0]
        src = sub()
        cells = ops.rollup(src, [xf, yf], [mets[0]])
        xtop = ops.sort_limit(
            ops.rollup(src, [xf], [(kind, col, "__xt")]),
            [("__xt", True), (xf, False)], k=dx)
        xt_rows = {r[xf]: r["__xt"] for r in xtop.take(dx)}

        def in_top(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc2

            return t.filter(pc2.is_in(t[xf], pa.array(list(xt_rows))))

        kept = ops.group_top_k(cells.map_batches(in_top,
                                                 batch_format="pyarrow"),
                               xf, label, dy, tiebreak_cols=[yf])

        def attach(t: pa.Table) -> pa.Table:
            xv = t[xf].to_numpy(zero_copy_only=False)
            return t.append_column("__xt", pa.array(
                [xt_rows[v] for v in xv], pa.float64()))

        out = ops.sort_limit(
            kept.map_batches(attach, batch_format="pyarrow"),
            [("__xt", True), (xf, False), (label, True), (yf, False)])
        return out.drop_columns(["__xt"])

    if name == "timeseries":
        # TimeSeriesStream (io/stream/TimeSeriesStream.java:63): date_trunc
        # bucketing + metrics; gap filling is not applicable (buckets come
        # from the data, the reference fills from start/end params)
        fld = named["field"]
        gap = str(named.get("gap", "day"))
        out = ops.timeseries(sub(), fld, gap, _metrics(args[1:]),
                             bucket_name=named.get("bucketName", "bucket"))
        return ops.sort_limit(out, [("bucket", False)])

    if name == "stats":
        return ops.rollup(sub(), [], _metrics(args[1:]), pre_aggregate=False)

    if name == "unique":
        over = _csv(named.get("over") or args[1])
        # first tuple per key in full-row lexicographic order: deterministic
        # without the reference's sorted-input precondition; segmented
        # kernel (ops.unique_first), never one pandas call per group
        return ops.unique_first(sub(), list(over))

    if name in ("innerJoin", "hashJoin", "leftOuterJoin", "outerHashJoin"):
        left, right = sub(0), sub(1)
        on = named["on"]
        how = "left_outer" if name in ("leftOuterJoin", "outerHashJoin") else "inner"
        pairs = [p.split("=") for p in _csv(on)]
        l_on = tuple(p[0] for p in pairs)
        r_on = tuple(p[-1] for p in pairs)
        return ops.hash_join(left, right, on=l_on, how=how,
                             right_on=r_on if r_on != l_on else None)

    if name in ("intersect", "complement"):
        left, right = sub(0), sub(1)
        l_on, _, r_on = _csv(named["on"])[0].partition("=")
        r_on = r_on or l_on
        anti = name == "complement"
        # size-gated: a small right side materializes to a broadcast key
        # set, like the reference's in-memory hash
        # (io/stream/IntersectStream.java:40) — but the reference streams
        # its sorted merge precisely so the right side need not fit in
        # memory (IntersectStream.java:43); above the gate we do the
        # distributed equivalent, a hash-partitioned semi/anti join, and
        # never land the key column on the driver
        # materialize once: the size gate consumes the stream for count()
        # and the chosen plan consumes it again — without this, an
        # expensive right-side subtree would execute twice
        right_keys = right.select_columns([r_on]).materialize()
        n_right = right_keys.count()
        if n_right <= _SEMI_BROADCAST_GATE:
            keys = right_keys.to_pandas()[r_on].to_numpy()
            return ops.broadcast_semi(left, keys, l_on, anti=anti)
        if r_on != l_on:
            right_keys = right_keys.rename_columns({r_on: l_on})
        return left.join(
            right_keys, join_type=("left_anti" if anti else "left_semi"),
            on=(l_on,), num_partitions=ops.scaled_partitions(n_right))

    if name == "fetch":
        import pyarrow.parquet as pq
        tbl_name = args[0]
        ds = sub(1)
        on = named.get("on", "id")
        l_on, _, r_on = on.partition("=")
        r_on = r_on or l_on
        cols = sorted(set(_csv(named.get("fl", ""))) | {r_on})
        small = pq.read_table(ctx.tables[tbl_name], columns=cols)
        return ops.broadcast_join(ds, small, on=l_on, right_on=r_on)

    if name == "cartesianProduct":
        spec = args[1]
        if isinstance(spec, str):
            m = re.match(r"^(\S+)\s+as\s+(\S+)$", spec)
            return _explode(sub(), m.group(1), m.group(2)) if m else _explode(sub(), spec)
        raise ValueError("cartesianProduct takes a field name")

    if name == "merge":
        keys = _sort_keys(named.get("on", ""))
        out = sub(0)
        for i in range(1, len(args)):
            out = out.union(sub(i))
        return ops.sort_limit(out, keys) if keys else out

    if name in ("list", "plist"):
        out = sub(0)
        for i in range(1, len(args)):
            out = out.union(sub(i))
        return out

    if name == "nodes":
        # gatherNodes verb (io/graph/GatherNodesStream.java expression
        # form): nodes(table, walk="from->to", root="1,2", depth=N)
        from .graph import gather_nodes

        frm, _, to = str(named["walk"]).partition("->")
        roots = [int(x) for x in _csv(named["root"])]
        out = gather_nodes(ctx.tables[args[0]], frm.strip(), to.strip(),
                           roots, depth=int(_coerce(named.get("depth", 1))))
        return ray.data.from_arrow(out)

    if name == "shortestPath":
        from .graph import shortest_path

        frm, _, to = str(named["edge"]).partition("->")
        path = shortest_path(
            ctx.tables[args[0]], frm.strip(), to.strip(),
            int(_coerce(named["from"])), int(_coerce(named["to"])),
            max_depth=int(_coerce(named.get("maxDepth", 6))))
        if path is None:
            return ray.data.from_arrow(pa.table(
                {"node": pa.array([], pa.int64()),
                 "step": pa.array([], pa.int64())}))
        return ray.data.from_arrow(pa.table({
            "node": pa.array(path, pa.int64()),
            "step": pa.array(range(len(path)), pa.int64()),
        }))

    if name == "random":
        src = ray.data.read_parquet(ctx.tables[args[0]])
        rows = int(_coerce(named.get("rows", 10)))
        seed = int(_coerce(named.get("seed", 42)))
        return src.random_shuffle(seed=seed).limit(rows)

    if name in ("parallel", "shuffle", "export"):
        # Ray Data's streaming executor is the reference's worker fan-out
        # (io/stream/ParallelStream.java:48); partitionKeys/workers are
        # satisfied by the engine's own hash partitioning
        inner = next(a for a in args if isinstance(a, SExpr))
        return build_stream(inner, ctx)

    if name == "echo":
        return _one_tuple({"echo": str(args[0])})

    if name == "tuple":
        cols = {}
        for k, v in named.items():
            if _is_stream_node(v):
                cols[k] = build_stream(v, ctx).to_pandas().to_dict("records")
            elif isinstance(v, SExpr):
                cols[k] = compile_evaluator(v, ctx)()
            else:
                cols[k] = ctx.lets.get(v, _coerce(v))
        return _one_tuple(cols)

    if name == "cell":
        # one tuple holding the entire (small) inner stream as a list
        rows = sub(1).to_pandas().to_dict("records")
        return _one_tuple({str(args[0]): rows})

    if name == "let":
        for k, v in named.items():
            if k == "echo":
                continue
            if _is_stream_node(v):
                ctx.lets[k] = build_stream(v, ctx)
            elif isinstance(v, SExpr):
                ctx.lets[k] = compile_evaluator(v, ctx)()
            else:
                ctx.lets[k] = _coerce(v)
        stream_args = [a for a in args if isinstance(a, SExpr)]
        if stream_args:
            return build_stream(stream_args[0], ctx)
        bound = [k for k in named if k != "echo"]
        echo = named.get("echo")
        if echo in (None, "false"):
            names = bound[-1:]  # reference echoes the last binding
        elif str(echo).lower() == "true":
            names = bound
        else:
            names = _csv(echo)
        return _one_tuple({k: _as_cell(ctx.lets[k]) for k in names})

    if name in ("get", "stream"):
        v = ctx.lets[args[0]]
        return v if isinstance(v, Dataset) else _one_tuple({args[0]: _as_cell(v)})

    if name == "eval":
        expr = args[0]
        if isinstance(expr, str):
            return build_stream(parse_expression(expr), ctx)
        # reference form: first tuple's expr_s field holds the expression
        first = build_stream(expr, ctx).take(1)
        return build_stream(parse_expression(first[0]["expr_s"]), ctx)

    if name == "priority":
        high, low = sub(0), sub(1)
        return high if high.limit(1).count() > 0 else low

    if name == "null":
        return _one_tuple({"nullCount": sub().count()})

    if name == "noop":
        return ray.data.from_arrow(pa.table({}))

    if name == "analyze":
        from ..analysis.analyzers import standard_analyzer
        toks, _positions = standard_analyzer(str(args[0]))
        return ray.data.from_arrow(pa.table({"term": list(toks)}))

    raise ValueError(
        f"unknown stream {name!r} (module-owned verbs — update/delete/"
        "commit/topic/daemon/train/knnSearch/significantTerms — have direct "
        "Python APIs; see index.maintenance, search.topic, relational.ml)")


def _is_stream_node(v) -> bool:
    """True when the SExpr should be built as a STREAM in a binding
    position. Some names are dual-registered (the reference's Lang.java
    maps 'rank' to both RankStream and RankEvaluator and resolves by
    context); the stream form always takes a stream as its first arg."""
    if not isinstance(v, SExpr) or v.name not in _STREAM_NAMES:
        return False
    if v.name in _EVALUATORS:
        # the stream form's first arg is itself a STREAM expression;
        # rank(array(...)) is the evaluator, rank(search(...), ...) the
        # stream — testing for "any SExpr" would misroute nested
        # evaluator calls into build_stream (recurse for rank(rank(...)))
        return bool(v.args) and _is_stream_node(v.args[0])
    return True


def _as_cell(v):
    if isinstance(v, Dataset):
        return v.to_pandas().to_dict("records")
    if isinstance(v, np.ndarray):
        return v.tolist()
    return v


_STREAM_NAMES = frozenset({
    "table", "jdbc", "sql", "search", "select", "having", "sort", "top",
    "rank", "rollup", "hashRollup", "facet", "facet2D", "timeseries", "stats", "unique", "innerJoin",
    "hashJoin", "leftOuterJoin", "outerHashJoin", "intersect", "complement",
    "fetch", "cartesianProduct", "merge", "list", "plist", "random",
    "nodes", "shortestPath",
    "parallel", "shuffle", "export", "echo", "tuple", "cell", "let", "get",
    "stream", "eval", "priority", "null", "noop", "analyze",
})


def run_expression(expr: str, ctx: StreamContext | None = None,
                   tables: dict[str, str] | None = None,
                   collections: dict[str, str] | None = None) -> Dataset:
    """Parse and execute one streaming expression, returning the lazy
    Dataset (the /stream handler role, handler/StreamHandler.java:142)."""
    ctx = ctx or StreamContext(tables=tables, collections=collections)
    return build_stream(parse_expression(expr), ctx)
