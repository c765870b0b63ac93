"""Relational dataflow operators (the Solr streaming-expression layer).

Each op is the Ray-Data-native form of a reference TupleStream / collector
(SURVEY.md §2.8-2.11): SelectStream -> vectorized map_batches projection,
RollupStream -> partial per-batch aggregation + small groupby, HashJoinStream
-> Dataset.join (hash-partitioned) or a broadcast lookup for small sides,
FacetsCollector -> groupby().count(), ExpandComponent dedup ->
groupby(key).map_groups(first), ParallelStream -> the Ray Data executor
itself.

Scale notes are inline: every wide op states its shuffle key; small sides are
broadcast once via ray.put, never per batch.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum


# ---------------------------------------------------------------------------
# per-record ops (narrow, no shuffle)
# ---------------------------------------------------------------------------

def select(ds: Dataset, exprs: dict[str, Callable[[pa.Table], pa.Array] | str]) -> Dataset:
    """SelectStream: projection / rename / computed columns.

    exprs maps output name -> source column name or fn(table)->Array.
    """

    def project(t: pa.Table) -> pa.Table:
        cols = {}
        for name, e in exprs.items():
            cols[name] = t[e] if isinstance(e, str) else e(t)
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def having(ds: Dataset, pred: Callable[[pa.Table], pa.Array]) -> Dataset:
    """HavingStream / filter: vectorized boolean predicate."""
    return ds.map_batches(lambda t: t.filter(pred(t)), batch_format="pyarrow")


def explode_tokens(ds: Dataset, key_col: str, text_col: str, out_col: str = "term") -> Dataset:
    """CartesianProductStream-style explode: one row per whitespace token."""

    def ex(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        flat = pc.list_flatten(toks)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.repeat(t[key_col].to_numpy(zero_copy_only=False), lens)
        return pa.table({key_col: pa.array(keys), out_col: flat})

    return ds.map_batches(ex, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# sorts / limits
# ---------------------------------------------------------------------------

def sort_limit(ds: Dataset, keys: list[tuple[str, bool]], k: int | None = None) -> Dataset:
    """SortStream / RankStream / ExportWriter: full sort (range-partitioned
    shuffle) with optional top-k cut."""
    cols = [c for c, _ in keys]
    desc = [d for _, d in keys]
    out = ds.sort(cols, descending=desc)
    return out.limit(k) if k is not None else out


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------

_AGGS = {"sum": Sum, "count": Count, "mean": Mean, "min": Min, "max": Max, "std": Std}


def rollup(
    ds: Dataset,
    keys: list[str],
    aggs: list[tuple[str, str | None, str]],
    pre_aggregate: bool = True,
    int_outputs: tuple = (),
) -> Dataset:
    """RollupStream / StatsStream: groupby aggregate.

    aggs: (kind, column|None, output_name). When pre_aggregate, sums/counts
    are combined per batch first (map-side combine) so the shuffle moves one
    row per (key, batch) instead of every input row — the partial+final
    pattern the reference's distributed faceting uses.

    int_outputs: output names that must come back int64 even if Ray's
    combine promoted them through float (empty partials become None/NaN and
    the final block dtype would otherwise depend on scheduling). Count
    aggregates are always included; pass sum/min/max names over integer
    inputs explicitly — deriving them from ds.schema() would trigger a
    partial execution of the upstream pipeline.
    """
    simple = all(kind in ("sum", "count") for kind, _, _ in aggs)
    if pre_aggregate and simple and keys:
        sum_cols = [(c, name) for kind, c, name in aggs if kind == "sum"]
        count_names = [name for kind, _, name in aggs if kind == "count"]

        # Arrow-native partial with an explicit typed result: an EMPTY batch
        # still yields a typed empty table, so downstream block schemas never
        # degrade to the schema-less pandas form whose dtype resolution was
        # run-to-run unstable (round-1 hash_match flake on rollup entries).
        def partial(t: pa.Table) -> pa.Table:
            specs = [(c, "sum") for c, _ in sum_cols]
            if count_names:
                specs.append(([], "count_all"))
            g = t.group_by(keys, use_threads=False).aggregate(specs)
            cols = {k: g[k] for k in keys}
            for c, name in sum_cols:
                cols[name] = g[f"{c}_sum"]
            for name in count_names:
                cols[name] = pc.cast(g["count_all"], pa.int64())
            return pa.table(cols)

        part = ds.map_batches(partial, batch_format="pyarrow")
        final_aggs = [Sum(name, alias_name=name) for _, _, name in aggs]
        out = part.groupby(keys).aggregate(*final_aggs)
    else:
        ray_aggs = []
        for kind, col, name in aggs:
            cls = _AGGS[kind]
            ray_aggs.append(cls(alias_name=name) if col is None else cls(col, alias_name=name))
        out = ds.groupby(keys if keys else None).aggregate(*ray_aggs)

    # Deterministic output dtypes: Ray's combine can promote an integer sum /
    # min / max through float when some partials are empty (None -> NaN), so
    # the final block dtype depended on scheduling. Cast integer-derived
    # aggregates back to int64 explicitly.
    int_out = [name for kind, _, name in aggs if kind == "count"]
    int_out += [n for n in int_outputs if n not in int_out]
    if int_out:
        def cast_ints(t: pa.Table) -> pa.Table:
            for name in int_out:
                if name in t.column_names and not pa.types.is_integer(t[name].type):
                    i = t.column_names.index(name)
                    t = t.set_column(i, name, pc.cast(pc.round(t[name]), pa.int64()))
            return t

        out = out.map_batches(cast_ints, batch_format="pyarrow")
    return out


def facet_counts(ds: Dataset, key: str, count_name: str = "cnt") -> Dataset:
    """FacetsCollector terms faceting: count per category (map-side combined)."""
    return rollup(ds, [key], [("count", None, count_name)])


def parse_facet_interval(spec: str):
    """Parse Solr interval-faceting syntax
    (solr/core/.../request/IntervalFacets.java:70-90): '['/'(' start ','
    end ')'/']', '*' = unbounded (bracket kind ignored for '*'),
    '\\'-escaped commas/brackets, surrounding whitespace stripped.
    Returns (key, lo, hi, lo_incl, hi_incl); lo/hi None = unbounded."""
    s = spec.strip()
    if len(s) < 3 or s[0] not in "([" or s[-1] not in ")]":
        raise ValueError(f"invalid interval: {spec!r}")
    lo_incl, hi_incl = s[0] == "[", s[-1] == "]"
    body = s[1:-1]
    parts, cur, esc = [], [], False
    for ch in body:
        if esc:
            cur.append(ch)
            esc = False
        elif ch == "\\":
            esc = True
        elif ch == ",":
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if len(parts) != 1:
        # exactly one unescaped comma, as the reference's parser enforces
        raise ValueError(f"invalid interval (need one comma): {spec!r}")
    parts.append("".join(cur))
    lo_s, hi_s = parts[0].strip(), parts[1].strip()
    lo = None if lo_s == "*" else lo_s
    hi = None if hi_s == "*" else hi_s
    return s, lo, hi, lo_incl, hi_incl


def interval_facets(ds: Dataset, field: str, intervals: list[str],
                    count_name: str = "cnt") -> pa.Table:
    """Solr interval facets (request/IntervalFacets.java:102): per interval,
    the count of docs whose field value falls inside — identical to the
    matching range query's count, but all intervals are answered in ONE
    pass (a doc may land in several overlapping intervals). Numeric fields
    compare numerically, everything else lexicographically (the
    reference's case-sensitive string comparison).

    Map-side partials (one row per interval per batch) + a tiny
    groupby(interval) sum: the shuffle is bounded by len(intervals)."""
    from ray.data.aggregate import Sum

    all_specs = [parse_facet_interval(s) for s in intervals]
    # aggregate over UNIQUE interval keys (a spec listed twice must not
    # groupby-sum into a doubled count), then answer per original order
    specs = list({s[0]: s for s in all_specs}.values())

    def part(t: pa.Table) -> pa.Table:
        col = t[field]
        numeric = pa.types.is_integer(col.type) or pa.types.is_floating(col.type)
        if numeric:
            vals = col.to_numpy(zero_copy_only=False).astype(np.float64)
            valid = ~np.isnan(vals)
            conv = float
        else:
            raw = col.to_pylist()
            vals = np.array(["" if v is None else str(v) for v in raw])
            valid = np.array([v is not None for v in raw], dtype=bool)
            conv = str
        keys, counts = [], []
        for key, lo, hi, li, hi_i in specs:
            m = valid.copy()
            if lo is not None:
                lov = conv(lo)
                m &= (vals >= lov) if li else (vals > lov)
            if hi is not None:
                hiv = conv(hi)
                m &= (vals <= hiv) if hi_i else (vals < hiv)
            keys.append(key)
            counts.append(int(np.count_nonzero(m)))
        return pa.table({"interval": pa.array(keys, pa.string()),
                         count_name: pa.array(counts, pa.int64())})

    agg = ds.select_columns([field]).map_batches(
        part, batch_format="pyarrow"
    ).groupby("interval").aggregate(Sum(count_name, alias_name=count_name))
    got = {r["interval"]: r[count_name] for r in agg.take_all()}
    return pa.table({
        "interval": pa.array([s[0] for s in all_specs], pa.string()),
        count_name: pa.array([int(got.get(s[0], 0)) for s in all_specs],
                             pa.int64()),
    })


def pivot_facets(ds: Dataset, fields: list[str], count_name: str = "cnt",
                 all_label: str = "(all)",
                 null_label: str = "(null)") -> pa.Table:
    """facet.pivot (solr/core/.../component/PivotFacetProcessor.java):
    hierarchical counts over a field list, emitted as the full ROLLUP
    lattice — one row per (f1, ..., fk) leaf plus every rolled-up level
    (rolled-up positions carry `all_label`) and the grand total.

    Scale shape: ONE map-side-combined groupby over the leaf key (the only
    shuffle, bucket-cardinality rows); every higher level re-aggregates the
    leaf table driver-side, which is vocabulary-sized, never corpus-sized —
    the reference likewise refines from per-shard leaf buckets rather than
    re-scanning."""
    leaf = rollup(ds, list(fields), [("count", None, count_name)]).to_pandas()
    import pandas as pd

    # null facet values keep their own bucket at EVERY level (pandas
    # groupby drops NaN keys by default, which would make level counts
    # disagree with the grand total); the relabel below is the single
    # mechanism guarding that — pick null_label to avoid colliding with a
    # genuine string value
    for f in fields:
        leaf[f] = leaf[f].astype(object).where(leaf[f].notna(), null_label)
    parts = [leaf]
    for k in range(len(fields) - 1, -1, -1):
        if k == 0:
            lvl = pd.DataFrame({count_name: [int(leaf[count_name].sum())]})
        else:
            lvl = (leaf.groupby(list(fields[:k]), as_index=False)
                   [count_name].sum())
        for f in fields[k:]:
            lvl[f] = all_label
        parts.append(lvl[list(fields) + [count_name]])
    out = pd.concat(parts, ignore_index=True)
    cols = {f: pa.array(out[f].astype(str), pa.string()) for f in fields}
    cols[count_name] = pa.array(out[count_name].astype("int64"), pa.int64())
    return pa.table(cols)


def relatedness_facet(ds: Dataset, key: str, fg_col: str,
                      round_nd: int = 6) -> pa.Table:
    """RelatednessAgg (solr/.../search/facet/RelatednessAgg.java:52): per
    facet bucket, how related the bucket is to a foreground doc set vs the
    background (all docs):

        fg_pop = fg_count(bucket) / fg_size
        bg_pop = bg_count(bucket) / background_size
        relatedness = (fg_pop - bg_pop) / max(fg_pop, bg_pop)   (0 when both 0)

    `fg_col` is a 0/1 foreground indicator column. One map-side combined
    groupby(bucket) computes (fg_count, bg_count) partials — the shuffle
    moves only bucket-cardinality rows; totals come from the same partials,
    so the corpus is scanned once. Final scoring is driver-side over the
    (tiny) bucket table. Returns (value, fg_count, bg_count, relatedness)
    sorted by relatedness desc, value asc."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([key, fg_col]).group_by([key], use_threads=False) \
            .aggregate([(fg_col, "sum"), ([], "count_all")])
        return pa.table({
            "value": g[key],
            "fg": pc.cast(g[f"{fg_col}_sum"], pa.int64()),
            "bg": pc.cast(g["count_all"], pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("value") \
        .aggregate(Sum("fg", alias_name="fg"), Sum("bg", alias_name="bg"))
    rows = agg.take_all()  # bucket cardinality, tiny
    vals = np.asarray([r["value"] for r in rows], dtype=object)
    fg = np.asarray([int(r["fg"]) for r in rows], dtype=np.int64)
    bg = np.asarray([int(r["bg"]) for r in rows], dtype=np.int64)
    fg_size = int(fg.sum())
    n = int(bg.sum())
    fg_pop = fg / float(max(fg_size, 1))
    bg_pop = bg / float(max(n, 1))
    mx = np.maximum(fg_pop, bg_pop)
    rel = np.divide(fg_pop - bg_pop, mx,
                    out=np.zeros(len(mx), np.float64), where=mx > 0)
    # round-half-away-from-zero, replicating DuckDB's round(x, nd) so an
    # oracle sorting by the rounded score sees the identical tie order
    p = 10.0 ** round_nd
    ax = np.abs(rel) * p
    fl = np.floor(ax)
    rel = np.sign(rel) * (fl + (ax - fl >= 0.5)) / p
    order = np.lexsort((vals.astype("U"), -rel))
    return pa.table({
        "value": pa.array(vals[order].tolist(), pa.string()),
        "fg_count": pa.array(fg[order], pa.int64()),
        "bg_count": pa.array(bg[order], pa.int64()),
        "relatedness": pa.array(rel[order], pa.float64()),
    })


def taxonomy_facet_counts(ds: Dataset, levels: list[str], sep: str = "/",
                          prefix: str | None = None,
                          count_name: str = "cnt") -> Dataset:
    """Taxonomy facet counts (facet/taxonomy/FastTaxonomyFacetCounts.java:39,
    FacetLabel path semantics): each doc contributes one count to EVERY
    ancestor path of its category path levels[0]/levels[1]/... — the
    side-car taxonomy index's rolled-up view, with no side-car needed:
    prefix paths are materialized vectorized per batch (map-side partial
    counts), then one small groupby sums them. `prefix` drills down
    (DrillDownQuery.java:52 role): only paths at or under it are returned.

    Shuffle key: path (cardinality = taxonomy size, tiny vs corpus)."""
    def partial(t: pa.Table) -> pa.Table:
        cur = None
        parts = []
        sep_s = pa.scalar(sep, pa.large_string())
        for c in levels:
            col = pc.cast(t[c], pa.large_string())
            cur = col if cur is None else pc.binary_join_element_wise(
                cur, col, sep_s)
            parts.append(cur.combine_chunks())
        allp = pa.chunked_array(parts)
        g = pa.table({"path": allp}).group_by(
            ["path"], use_threads=False).aggregate([([], "count_all")])
        paths, cnt = g["path"], g["count_all"].cast(pa.int64())
        if prefix is not None:
            keep = pc.or_(pc.equal(paths, prefix),
                          pc.starts_with(paths, prefix + sep))
            paths, cnt = pc.filter(paths, keep), pc.filter(cnt, keep)
        return pa.table({"path": paths, count_name: cnt})

    # rollup() supplies the groupby-Sum plus the int64 re-cast guard (Ray's
    # combine can promote an integer Sum through float on empty partials)
    return rollup(ds.map_batches(partial, batch_format="pyarrow"),
                  ["path"], [("sum", count_name, count_name)],
                  pre_aggregate=False, int_outputs=(count_name,))


def facet_top_k_refined(
    ds: Dataset, key: str, k: int, overrequest: int | None = None,
    count_name: str = "cnt",
) -> pa.Table:
    """Distributed top-k facet with refinement (Solr JSON facets
    refine:true, solr/.../search/facet/FacetFieldProcessor.java merge +
    refinement phases): pass 1 keeps each block's local top-(k+overrequest)
    value counts plus the block's cut threshold; the merged lower bounds
    pick a refine set of R = max(4k, k+overrequest) candidates whose counts
    pass 2 re-counts EXACTLY (broadcast key-set filter + map-side combine),
    so every returned bucket count is exact. A TPUT-style certificate
    (k-th exact count >= best unrefined lower bound + sum of block
    thresholds) detects the residual case where a value unreported by every
    block could still belong in the global top-k; when it fails the op
    falls back to the exact full rollup.

    Shuffle cost: pass 1 moves <= blocks*(k+over+1) rows and pass 2 <= R
    rows per block — independent of key cardinality, vs one row per
    (block, distinct value) for the exact rollup. At web-scale facet keys
    (hosts, shingles, urls) that is a bounded merge instead of an
    all-to-all shuffle.
    """
    return _facet_top_k_refined(ds, key, k, overrequest, count_name)[0]


def _facet_top_k_refined(
    ds: Dataset, key: str, k: int, overrequest: int | None = None,
    count_name: str = "cnt",
) -> tuple[pa.Table, bool]:
    """facet_top_k_refined internals; returns (result, certified) where
    certified=False means the exact-rollup fallback ran."""
    m = k + (overrequest if overrequest is not None else max(10, k))

    def local_top(t: pa.Table) -> pa.Table:
        ktype = t.schema.field(key).type
        if t.num_rows == 0:
            return pa.table({key: pa.array([], ktype),
                             count_name: pa.array([], pa.int64()),
                             "__thresh": pa.array([], pa.int64())})
        g = t.group_by([key], use_threads=False).aggregate([([], "count_all")])
        cnt = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(-cnt, kind="stable")
        top = order[:m]
        t_b = int(cnt[order[m]]) if len(order) > m else 0
        data = pa.table({
            key: pc.take(g[key], pa.array(top)),
            count_name: pa.array(cnt[top]),
            "__thresh": pa.array(np.zeros(len(top), dtype=np.int64)),
        })
        sentinel = pa.table({
            key: pa.array([None], ktype),
            count_name: pa.array([0], pa.int64()),
            "__thresh": pa.array([t_b], pa.int64()),
        })
        return pa.concat_tables([data, sentinel])

    # materialized: it is the compacted partial (small) and is consumed
    # twice (threshold sum + candidate merge)
    pass1 = ds.select_columns([key]).map_batches(
        local_top, batch_format="pyarrow").materialize()
    thresh_sum = int(pass1.sum("__thresh") or 0)

    def drop_sentinels(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t[key])).select([key, count_name])

    merged = pass1.map_batches(drop_sentinels, batch_format="pyarrow") \
        .groupby(key).aggregate(Sum(count_name, alias_name=count_name))
    R = max(4 * k, m)
    cand_rows = merged.sort(count_name, descending=True).limit(R + 1).take_all()
    if not cand_rows:
        empty = pa.table({key: pa.array([], pa.string()),
                          count_name: pa.array([], pa.int64())})
        return empty, True
    cand = [r[key] for r in cand_rows[:R]]
    spill_lower = int(cand_rows[R][count_name]) if len(cand_rows) > R else 0

    cand_ref = ray.put(cand)

    def exact_partial(t: pa.Table) -> pa.Table:
        vs = _cached_broadcast(cand_ref, transform=pa.array)
        t = t.filter(pc.is_in(t[key], value_set=vs))
        g = t.group_by([key], use_threads=False).aggregate([([], "count_all")])
        return pa.table({key: g[key],
                         count_name: pc.cast(g["count_all"], pa.int64())})

    exact = ds.select_columns([key]).map_batches(
        exact_partial, batch_format="pyarrow"
    ).groupby(key).aggregate(Sum(count_name, alias_name=count_name)).take_all()
    exact.sort(key=lambda r: (-int(r[count_name]), r[key]))
    kth = int(exact[k - 1][count_name]) if len(exact) >= k else 0
    # STRICT >: an unexamined value's true count is bounded by
    # spill_lower + thresh_sum, and at equality it could still TIE the
    # k-th candidate and win the key-ascending tiebreak
    certified = kth > spill_lower + thresh_sum

    if not certified:
        # exact fallback: the full rollup (cardinality-sized shuffle)
        rows = facet_counts(ds.select_columns([key]), key, count_name) \
            .sort([count_name, key], descending=[True, False]) \
            .limit(k).take_all()
        return pa.table({
            key: pa.array([r[key] for r in rows]),
            count_name: pa.array([int(r[count_name]) for r in rows],
                                 pa.int64()),
        }), False

    topk = exact[:k]
    return pa.table({
        key: pa.array([r[key] for r in topk]),
        count_name: pa.array([int(r[count_name]) for r in topk], pa.int64()),
    }), True


def range_facet(
    ds: Dataset, col: str, start: float, end: float, width: float,
    bucket_name: str = "bucket", count_name: str = "cnt",
) -> Dataset:
    """LongRangeFacetCounts: fixed-width histogram buckets of a numeric col."""

    def bucketize(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = (v >= start) & (v < end)
        b = np.floor((v[keep] - start) / width).astype(np.int64)
        return pa.table({bucket_name: pa.array(b)})

    return rollup(ds.map_batches(bucketize, batch_format="pyarrow"), [bucket_name],
                  [("count", None, count_name)])


def timeseries(
    ds: Dataset, ts_col: str, unit: str, aggs: list[tuple[str, str | None, str]],
    bucket_name: str = "bucket",
) -> Dataset:
    """TimeSeriesStream: date_trunc bucketing + aggregate."""

    def trunc(t: pa.Table) -> pa.Table:
        b = pc.floor_temporal(t[ts_col], unit=unit)
        return t.append_column(bucket_name, b)

    return rollup(ds.map_batches(trunc, batch_format="pyarrow"), [bucket_name], aggs)


def percentile_exact(ds: Dataset, col: str, q: float) -> float:
    """Exact linear-interpolated quantile (PercentileAgg exact mode).

    Distributed sort of the single projected column, then a take of the two
    straddling ranks — never materializes the column on the driver. (The
    sketch path for 100 TB is a t-digest partial per batch + driver merge.)"""
    n = ds.count()
    if n == 0:
        return float("nan")
    h = (n - 1) * q
    lo = int(np.floor(h))
    hi = min(lo + 1, n - 1)
    s = ds.select_columns([col]).sort(col)
    frag = s.split_at_indices([lo, hi + 1])[1]
    vals = [r[col] for r in frag.take(hi + 1 - lo)]
    v_lo = float(vals[0])
    v_hi = float(vals[-1])
    return v_lo + (v_hi - v_lo) * (h - lo)


def distinct(ds: Dataset, cols: list[str]) -> Dataset:
    """UniqueStream / DistinctValuesCollector: distinct rows of cols."""
    return ds.select_columns(cols).groupby(cols).aggregate(Count(alias_name="__c")).select_columns(cols)


# ---------------------------------------------------------------------------
# grouping / collapse
# ---------------------------------------------------------------------------

def _sort_key_array(col) -> np.ndarray:
    """Column -> numpy array usable in np.lexsort: numerics/datetimes pass
    through, anything else becomes ascending ordinal codes (np.unique)."""
    v = col.to_numpy(zero_copy_only=False)
    if v.dtype.kind in "biufM":
        return v
    _, inv = np.unique(v, return_inverse=True)
    return inv


def _descending(v: np.ndarray) -> np.ndarray:
    if v.dtype.kind == "M":
        v = v.astype(np.int64)
    if v.dtype.kind in "bu":
        v = v.astype(np.int64)
    return -v


def group_top_k(
    ds: Dataset, key: str, order_col: str, k: int, descending: bool = True,
    tiebreak_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """Two-pass grouping collapse: top-k rows per group by order_col
    (grouping/FirstPassGroupingCollector + ExpandComponent semantics).
    Shuffle key: `key`. Ties on order_col break by tiebreak_cols ascending
    (default: every other column, for a deterministic cut).

    Runs as a hash-partitioned SEGMENTED kernel (one lexsort + positional
    mask per partition), not one pandas call per group — a corpus with
    millions of groups costs num_partitions Python calls, the
    partitioned_window design."""
    if num_partitions is None:
        num_partitions = max(4, int(ray.cluster_resources().get("CPU", 4)))

    def run(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        n = len(t)
        if not n:
            return t
        ties = tiebreak_cols or [c for c in t.column_names
                                 if c != order_col]
        arrays = [_sort_key_array(t[c]) for c in reversed(ties)]
        ov = _sort_key_array(t[order_col])
        arrays.append(_descending(ov) if descending else ov)
        keys = _sort_key_array(t[key])
        arrays.append(keys)
        order = np.lexsort(arrays)
        ks = keys[order]
        first = np.ones(n, dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(first)
        seg = np.diff(np.append(starts, n))
        pos = np.arange(n) - np.repeat(starts, seg)
        return t.take(pa.array(order[pos < k]))

    tagged = _window_hash_part(ds, key, num_partitions)
    return tagged.groupby("__part").map_groups(run, batch_format="pyarrow")


def unique_first(ds: Dataset, over: list[str],
                 num_partitions: int | None = None) -> Dataset:
    """UniqueStream (io/stream/UniqueStream.java:43) without the sorted-
    input precondition: the first tuple per `over` key in FULL-ROW
    lexicographic order — deterministic under any partitioning. Same
    segmented-kernel shape as group_top_k: high-cardinality key sets cost
    num_partitions Python calls, never one per group."""
    if num_partitions is None:
        num_partitions = max(4, int(ray.cluster_resources().get("CPU", 4)))

    def run(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__part"])
        n = len(t)
        if not n:
            return t
        arrays = [_sort_key_array(t[c]) for c in reversed(t.column_names)]
        key_arrs = [_sort_key_array(t[c]) for c in over]
        arrays.extend(reversed(key_arrs))
        order = np.lexsort(arrays)
        # a row starts a new group when ANY key column changes
        first = np.zeros(n, dtype=bool)
        first[0] = True
        for ka in key_arrs:
            ks = ka[order]
            first[1:] |= ks[1:] != ks[:-1]
        return t.take(pa.array(order[first]))

    tagged = _window_hash_part(ds, over[0], num_partitions)
    return tagged.groupby("__part").map_groups(run, batch_format="pyarrow")


def collapse_first(ds: Dataset, key: str, order_col: str) -> Dataset:
    """One row per key, minimal order_col (SignatureUpdateProcessor dedup /
    field collapse). Implemented as a min-reduction rather than map_groups
    when only the winner id is needed."""
    return group_top_k(ds, key, order_col, 1, descending=False)


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

# worker-process-level memo for broadcast objects: tasks re-fetch via a local
# zero-copy plasma read, and any per-worker transform (e.g. arrow -> pandas)
# runs once per worker instead of once per batch. LRU-bounded: a long-lived
# worker running many pipelines must not pin one private deserialized copy
# per broadcast table forever.
_BCAST_CACHE: dict = {}
_BCAST_CACHE_MAX = 4


def _cached_broadcast(ref, transform=None):
    key = ref.hex()
    if key not in _BCAST_CACHE:
        val = ray.get(ref)
        while len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        _BCAST_CACHE[key] = transform(val) if transform else val
    else:  # LRU refresh
        _BCAST_CACHE[key] = _BCAST_CACHE.pop(key)
    return _BCAST_CACHE[key]

def broadcast_join(
    big: Dataset, small: pa.Table, on: str, right_on: str | None = None,
    how: str = "inner", suffix: str = "_r",
) -> Dataset:
    """FetchStream / JoinUtil-style broadcast lookup join: the small side is
    put in the object store ONCE and read by every task (never re-shipped
    per batch); lookup is a vectorized pandas merge per batch. No shuffle."""
    right_on = right_on or on
    small_ref = ray.put(small)

    def fetch(df: pd.DataFrame) -> pd.DataFrame:
        lookup = _cached_broadcast(small_ref, lambda t: t.to_pandas())
        out = df.merge(
            lookup, how=how, left_on=on, right_on=right_on, suffixes=("", suffix)
        )
        if right_on != on and right_on in out.columns:
            out = out.drop(columns=[right_on])
        return out

    return big.map_batches(fetch, batch_format="pandas")


def broadcast_semi(big: Dataset, keys: pa.Array | np.ndarray, on: str, anti: bool = False) -> Dataset:
    """IntersectStream/ComplementStream: semi/anti join via broadcast key set."""
    key_ref = ray.put(np.unique(np.asarray(keys)))

    def sieve(t: pa.Table) -> pa.Table:
        ks = _cached_broadcast(key_ref)
        v = t[on].to_numpy(zero_copy_only=False)
        m = np.isin(v, ks, invert=anti)
        return t.filter(pa.array(m))

    return big.map_batches(sieve, batch_format="pyarrow")


def scaled_partitions(n_rows: int, rows_per_partition: int = 2_000_000,
                      cap: int = 4096) -> int:
    """Hash-join/shuffle partition count scaled to data volume AND cluster
    size — never a fixed constant (ParallelStream.java:48 takes worker
    count as an input for the same reason). Volume dominates at scale
    (bounded rows per aggregator); the CPU term keeps mid-size inputs
    parallel; small inputs stay at 2 partitions because each hash-shuffle
    aggregator is an actor whose spin-up costs real seconds — and asking
    for more aggregators than the cluster can schedule stalls the join
    behind min_hash_shuffle_aggregator_wait_time_in_s."""
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    by_volume = n_rows // rows_per_partition + 1
    by_cpu = min(ncpu, n_rows // 50_000 + 1)
    return int(min(cap, max(2, by_volume, by_cpu)))


def hash_join(
    left: Dataset, right: Dataset, on: str | tuple, how: str = "inner",
    num_partitions: int = 16, right_on: str | tuple | None = None,
    left_suffix: str | None = None, right_suffix: str = "_r",
) -> Dataset:
    """HashJoinStream / InnerJoinStream for two large sides: Ray Data's
    hash-partitioned Dataset.join (shuffle both sides on the key)."""
    on_t = (on,) if isinstance(on, str) else tuple(on)
    r_t = None if right_on is None else ((right_on,) if isinstance(right_on, str) else tuple(right_on))
    return left.join(
        right, join_type=how, num_partitions=num_partitions, on=on_t,
        right_on=r_t, left_suffix=left_suffix, right_suffix=right_suffix,
    )


# reserved sentinel key values for safe_join's zero-row-side guard; the
# two sides use DIFFERENT values so the sentinels can never match each other
_SENT_I64_L = -(1 << 62) - 11
_SENT_I64_R = -(1 << 62) - 12
_SENT_STR_L = "\x00\x00__lsr_join_sentinel_l"
_SENT_STR_R = "\x00\x00__lsr_join_sentinel_r"


def _sentinel_row(schema: pa.Schema, on: str, side: str) -> pa.Table:
    """One-row table with the reserved sentinel in the key column and nulls
    elsewhere."""
    typ = schema.field(on).type
    if pa.types.is_integer(typ):
        key = pa.array([_SENT_I64_L if side == "l" else _SENT_I64_R]).cast(typ)
    elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
        key = pa.array([_SENT_STR_L if side == "l" else _SENT_STR_R]).cast(typ)
    else:
        raise ValueError(
            f"safe_join supports int/string keys, got {typ}; use bucketed_join")
    cols = {f.name: (key if f.name == on else pa.nulls(1, f.type))
            for f in schema}
    return pa.table(cols)


def safe_join(
    left: Dataset, right: Dataset, on: str, how: str = "inner",
    num_partitions: int = 16, right_suffix: str = "_r",
    l_schema: pa.Schema | None = None, r_schema: pa.Schema | None = None,
) -> Dataset:
    """Native hash join hardened against Ray 2.49's zero-row-side crash.

    Empty hash PARTITIONS are fine, but a side whose every block was
    filtered away reaches the join aggregator schema-less and finalize
    raises ArrowInvalid (pyarrow Table.join on a columnless table). Fix:
    union ONE sentinel row per side — reserved key values that can never
    match anything — so every aggregator sees a typed block, then filter
    the sentinels from the output. Fully streaming: no count()/materialize
    of the inputs (a count() would re-execute the whole upstream plan).

    Callers whose sides may be fully filtered should pass `l_schema` /
    `r_schema` (a pa.Schema) so no `.schema()` call has to execute the
    plan; otherwise the side's schema is fetched lazily."""
    import ray.data as _rd

    ls = l_schema if l_schema is not None else left.schema()
    rs = r_schema if r_schema is not None else right.schema()
    if hasattr(ls, "base_schema"):  # ray Schema wrapper
        ls = pa.schema(list(zip(ls.names, ls.types)))
    if hasattr(rs, "base_schema"):
        rs = pa.schema(list(zip(rs.names, rs.types)))
    how = {"left": "left_outer", "right": "right_outer",
           "outer": "full_outer"}.get(how, how)
    lw = left.union(_rd.from_arrow(_sentinel_row(ls, on, "l")))
    rw = right.union(_rd.from_arrow(_sentinel_row(rs, on, "r")))
    j = lw.join(rw, join_type=how, num_partitions=num_partitions, on=(on,),
                right_suffix=right_suffix)
    typ = ls.field(on).type
    if pa.types.is_integer(typ):
        sl, sr = _SENT_I64_L, _SENT_I64_R
    else:
        sl, sr = _SENT_STR_L, _SENT_STR_R

    def strip(t: pa.Table) -> pa.Table:
        k = t[on]
        m = pc.and_(pc.not_equal(k, sl), pc.not_equal(k, sr))
        # null keys (legit data) must survive the sentinel strip
        return t.filter(pc.fill_null(m, True))

    return j.map_batches(strip, batch_format="pyarrow")


def bucketed_join(
    left: Dataset, right: Dataset, on: str, num_buckets: int = 16,
    how: str = "inner", right_suffix: str = "_r",
) -> Dataset:
    """Explicit partitioned hash join (the portable pattern when Dataset.join
    is unavailable): tag both sides with bucket=hash(key)%B, group each
    bucket, join pairwise with pandas. Kept as the documented fallback and
    for joins needing custom per-bucket logic (as-of / range joins)."""

    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    # unified schema so the two tagged sides can union (missing cols -> null)
    all_fields = [(n, l_types[n]) for n in l_cols]
    all_fields += [(n, r_types[n]) for n in r_cols if n not in l_cols]

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            v = t[on].to_numpy(zero_copy_only=False)
            b = (v.astype(np.int64) % num_buckets).astype(np.int32)
            cols = {}
            for n, typ in all_fields:
                cols[n] = t[n] if n in t.column_names else pa.nulls(len(t), typ)
            cols["__bucket"] = pa.array(b)
            cols["__side"] = pa.array(np.full(len(v), side, dtype=np.int8))
            return pa.table(cols)
        return f

    lt = left.map_batches(tag(0), batch_format="pyarrow")
    rt = right.map_batches(tag(1), batch_format="pyarrow")

    # output column -> the Arrow type it must carry (pandas promotes an
    # int64 column to float64 when the null-padded union rows pass through
    # the merge, even though the merge itself drops them; the tuple streams
    # never widen types across a join — io/stream/HashJoinStream.java:45)
    out_types: dict[str, pa.DataType] = dict(l_types)
    for n in r_cols:
        if n == on:
            continue
        out_types[n if n not in l_cols else n + right_suffix] = r_types[n]

    def join_group(df: pd.DataFrame) -> pa.Table:
        lf = df[df["__side"] == 0][[c for c in l_cols if c in df.columns]]
        rf = df[df["__side"] == 1][[c for c in r_cols if c in df.columns]]
        out = lf.merge(rf, how=how, on=on, suffixes=("", right_suffix))
        t = pa.Table.from_pandas(out, preserve_index=False)
        # restore the recorded Arrow types (casting away any pandas widening)
        cols = []
        for c in t.column_names:
            arr = t[c]
            typ = out_types.get(c)
            if typ is not None and arr.type != typ:
                if pa.types.is_floating(arr.type) and not pa.types.is_floating(typ):
                    # outer-join padding NaNs become nulls, not cast errors
                    arr = pc.if_else(pc.is_nan(arr), pa.scalar(None, arr.type), arr)
                arr = arr.cast(typ)
            cols.append(arr)
        return pa.table(dict(zip(t.column_names, cols)))

    # union the two tagged sides; schemas differ -> align by promoting to a
    # common schema with nulls (pandas concat semantics inside map_groups)
    both = lt.union(rt)
    return both.groupby("__bucket").map_groups(join_group, batch_format="pandas")


def sampled_facet_counts(
    ds: Dataset, key: str, id_col: str, rate: float = 0.1, seed: int = 42,
    count_name: str = "cnt",
) -> Dataset:
    """RandomSamplingFacetsCollector (facet/RandomSamplingFacetsCollector
    .java:43): facet counts over a deterministic doc sample, scaled back by
    1/rate. Sampling hashes the doc id (multiply-shift, seeded) so the
    sample is stable across runs and partitionings."""
    # multiply-shift hash: 64-bit wraparound is the point, not an error
    a = np.uint64((0x9E3779B97F4A7C15 * (2 * seed + 1)) & 0xFFFFFFFFFFFFFFFF)
    threshold = np.uint64(int(rate * 2**64))

    def sample(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            keep = (ids * a) < threshold
        return t.select([key]).filter(pa.array(keep))

    counts = rollup(ds.map_batches(sample, batch_format="pyarrow"),
                    [key], [("count", None, count_name)])

    def scale(t: pa.Table) -> pa.Table:
        v = t[count_name].to_numpy(zero_copy_only=False)
        est = np.rint(v / rate).astype(np.int64)
        i = t.column_names.index(count_name)
        return t.set_column(i, count_name, pa.array(est, pa.int64()))

    return counts.map_batches(scale, batch_format="pyarrow")


# --- partitioned window functions ------------------------------------------

def _window_hash_part(ds: Dataset, key_col: str, num_partitions: int) -> Dataset:
    """Tag rows with a hash partition of the window key: the shuffle unit
    becomes the PARTITION (bounded count), not the group — a corpus with
    10^9 users still runs num_partitions Python calls, not 10^9."""
    def tag(t: pa.Table) -> pa.Table:
        v = t[key_col]
        if pa.types.is_integer(v.type):
            k = v.to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                h = k * np.uint64(0x9E3779B97F4A7C15)
        else:
            from ..util.polyhash import poly_hash_strings

            h = poly_hash_strings([str(x) for x in v.to_pylist()])
        return t.append_column(
            "__part", pa.array((h % np.uint64(num_partitions)).astype(np.int32)))

    return ds.map_batches(tag, batch_format="pyarrow")


def partitioned_window(ds: Dataset, key_col: str, order_cols: list[str],
                       kernel, num_partitions: int | None = None) -> Dataset:
    """Window-function runner: hash-partition by key, sort each partition
    once by (key, *order), run ONE vectorized kernel over the whole
    partition with per-key segment starts — the segmented-numpy
    replacement for per-group pandas map_groups (each group a Python
    call). kernel(sorted_table, first_mask) -> pa.Table.

    The reference's analogue is the /export + streaming rollup contract:
    workers receive hash partitions sorted by the over-key
    (io/stream/ParallelStream.java:48), never one task per group."""
    if num_partitions is None:
        num_partitions = max(4, int(ray.cluster_resources().get("CPU", 4)))

    def run(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        t = t.drop_columns(["__part"])
        sort_arrays = []
        for c in reversed(order_cols):
            a = t[c]
            if pa.types.is_timestamp(a.type):
                a = pc_.cast(a, pa.int64())
            sort_arrays.append(a.to_numpy(zero_copy_only=False))
        keys = t[key_col].to_numpy(zero_copy_only=False)
        sort_arrays.append(keys)
        order = np.lexsort(sort_arrays)
        t = t.take(pa.array(order))
        k = keys[order]
        first = np.ones(len(k), dtype=bool)
        if len(k) > 1:
            first[1:] = k[1:] != k[:-1]
        return kernel(t, first)

    tagged = _window_hash_part(ds, key_col, num_partitions)
    return tagged.groupby("__part").map_groups(run, batch_format="pyarrow")


def sliding_mean(ds: Dataset, key_col: str, order_cols: list[str],
                 value_col: str, window: int, keep_cols: list[str],
                 out_name: str = "w_avg",
                 num_partitions: int | None = None) -> Dataset:
    """Per-key sliding mean (min_periods=1) as a segmented cumsum pass."""
    def kernel(t: pa.Table, first: np.ndarray) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(v)
        if not n:
            return pa.table({c: t[c] for c in keep_cols} | {
                out_name: pa.array([], pa.float64())})
        starts = np.flatnonzero(first)
        seg_lens = np.diff(np.append(starts, n))
        pos = np.arange(n) - np.repeat(starts, seg_lens)
        # extended-precision prefix sums: window sums are DIFFERENCES of a
        # partition-wide cumsum, so float64 error would grow with the
        # prefix magnitude on long partitions and could flip a
        # round-half-away boundary; float80 keeps the absolute error far
        # below it at any realistic partition length
        c = np.cumsum(v, dtype=np.longdouble)
        sidx = np.arange(n) - np.minimum(pos, window - 1)
        wsum = np.asarray(c - c[sidx] + v[sidx], dtype=np.float64)
        cnt = np.minimum(pos + 1, window)
        cols = {c_: t[c_] for c_ in keep_cols}
        cols[out_name] = pa.array(wsum / cnt, pa.float64())
        return pa.table(cols)

    return partitioned_window(ds, key_col, order_cols, kernel,
                              num_partitions)


def sessionize(ds: Dataset, key_col: str, ts_col: str,
               order_cols: list[str], gap_seconds: float,
               keep_cols: list[str], out_name: str = "session_id",
               num_partitions: int | None = None) -> Dataset:
    """Gap-based session ids per key (new session when the gap to the
    previous event exceeds gap_seconds), one segmented cumsum pass."""
    _TICKS = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}

    def kernel(t: pa.Table, first: np.ndarray) -> pa.Table:
        import pyarrow.compute as pc_

        # ticks per second follow the column's native unit (a pandas-
        # written table is timestamp[ns]; parquet defaults to us)
        unit = getattr(t[ts_col].type, "unit", "us")
        ts = pc_.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ts)
        if not n:
            return pa.table({c: t[c] for c in keep_cols} | {
                out_name: pa.array([], pa.int64())})
        gap = np.empty(n, dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        new_sess = (gap > gap_seconds * _TICKS.get(unit, 1_000_000)) & ~first
        cs = np.cumsum(new_sess.astype(np.int64))
        starts = np.flatnonzero(first)
        seg_lens = np.diff(np.append(starts, n))
        sess = cs - np.repeat(cs[starts], seg_lens)
        cols = {c: t[c] for c in keep_cols}
        cols[out_name] = pa.array(sess, pa.int64())
        return pa.table(cols)

    return partitioned_window(ds, key_col, [ts_col] + [
        c for c in order_cols if c != ts_col], kernel, num_partitions)
