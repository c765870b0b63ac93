"""Searchers: local (all shards in-process) and distributed (actor pool).

The distributed form mirrors the reference's scatter-gather
(SearchHandler/QueryComponent distributed phases, SURVEY.md §3.3): weights
are resolved once from global stats, fanned out to shard actors, per-shard
top-k returned, and merged by the TopDocs.merge rule — score desc, tie to
the lower doc id (globally-unique monotone doc ids make (score, doc_id)
equivalent to the reference's (score, shardIndex, localDoc) ordering).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..index.reader import IndexReader, ShardReader
from .bm25 import BM25Params
from .executor import eval_node, resolve_weights, shard_top_k, top_k_select
from .query import parse_query


def merge_top_k(parts, k: int):
    """TopDocs.merge (search/TopDocs.java:187-216): global top-k across
    per-shard top-k lists, ties broken by ascending doc id."""
    docs = np.concatenate([d for d, _ in parts]) if parts else np.zeros(0, np.int64)
    scores = (
        np.concatenate([s for _, s in parts]) if parts else np.zeros(0, np.float32)
    )
    return top_k_select(docs, scores, k)


def rewrite_analyzed_fields(reader, node):
    """'field:value' over an ANALYZED field becomes a SCORED analyzed
    node (the reference's QueryParser runs the field's analyzer on the
    value and scores with field stats/norms, QueryParserBase.java
    newFieldQuery); keyword fields keep their constant-score exact-value
    semantics. Programmatic Term nodes are taken as already analyzed."""
    af = reader.analyzed_fields
    if not af:
        return node
    from .query import Bool, ConstantScore, DisMax, FunctionScore, Phrase, Term

    def analyzed_node(field: str, value: str, boost: float):
        from ..analysis import standard_analyzer
        from ..analysis.filters import build_chain
        from ..analysis.stem import get_stemmer

        stem_name, stops, filt = reader.analyzer_chain(field)
        terms, _ = standard_analyzer(value, stops)
        ch, _drops = build_chain(filt)
        if ch is not None:
            terms = [t2 for t in terms if (t2 := ch(t)) is not None]
        stem = get_stemmer(stem_name)
        if stem is not None:
            terms = [stem(t) for t in terms]
        pref = [f"{field}:{t}" for t in terms]
        if not pref:
            return None
        if len(pref) == 1:
            return Term(pref[0], boost)
        return Phrase(tuple(pref), boost)

    def rw(n):
        if isinstance(n, ConstantScore) and isinstance(n.query, Term):
            t = n.query.text
            i = t.find(":")
            if i > 0 and t[:i] in af:
                out = analyzed_node(t[:i], t[i + 1:], n.boost)
                if out is not None:
                    return out
            return n
        if isinstance(n, ConstantScore) and isinstance(n.query, Phrase):
            # field:"a b" from the parser: namespaced phrase terms run
            # the field's stem chain and score as a field phrase
            first = n.query.terms[0]
            i = first.find(":")
            if i > 0 and first[:i] in af:
                from ..analysis.filters import build_chain
                from ..analysis.stem import get_stemmer

                fld = first[:i]
                stem_name, stops, filt = reader.analyzer_chain(fld)
                stem = get_stemmer(stem_name)
                ch, _d = build_chain(filt)
                toks = [t.split(":", 1)[1] for t in n.query.terms]
                if stops:
                    # the field's stop filter dropped these index-side;
                    # keep parity with the single-term analyzed path
                    toks = [t for t in toks if t not in stops]
                if ch is not None:
                    toks = [t2 for t in toks
                            if (t2 := ch(t)) is not None]
                if stem is not None:
                    toks = [stem(t) for t in toks]
                pref = tuple(f"{fld}:{t}" for t in toks)
                if not pref:
                    return n
                if len(pref) == 1:
                    return Term(pref[0], n.boost)
                return Phrase(pref, n.boost, n.query.slop)
            return n
        if isinstance(n, ConstantScore):
            return ConstantScore(rw(n.query), n.boost)
        if isinstance(n, FunctionScore):
            return FunctionScore(rw(n.query), n.expr, n.boost)
        if isinstance(n, DisMax):
            return DisMax(tuple(rw(c) for c in n.clauses), n.tiebreak)
        if isinstance(n, Bool):
            return Bool(
                must=[rw(c) for c in n.must],
                should=[rw(c) for c in n.should],
                must_not=[rw(c) for c in n.must_not],
                filter=[rw(c) for c in n.filter],
                min_should=n.min_should,
            )
        return n

    return rw(node)


class IndexSearcher:
    """Single-process searcher over all shards.

    Shards execute on a thread pool (the reference's leaf-slice executor,
    IndexSearcher.java:120-124): the numpy kernels release the GIL enough
    for a ~4x speedup on multi-shard queries."""

    def __init__(self, index_dir: str, params: BM25Params = BM25Params(),
                 dtype=np.float32, num_threads: int = 8):
        from concurrent.futures import ThreadPoolExecutor

        self.reader = IndexReader(index_dir)
        self.params = params
        self.dtype = dtype
        self.num_threads = num_threads
        self._pool = (
            ThreadPoolExecutor(max_workers=num_threads) if num_threads > 1 else None
        )

    def _map_shards(self, fn, parallel: bool = True):
        shards = self.reader.shards
        if not parallel or self._pool is None or len(shards) <= 1:
            return [fn(s) for s in shards]
        return list(self._pool.map(fn, shards))

    @staticmethod
    def _big_query(weights) -> bool:
        # thread-dispatch overhead beats the gain below ~100k postings
        return sum(getattr(w, "df", 0) for w in weights.values()) > 100_000

    def warmup(self) -> "IndexSearcher":
        """Load all shard tables concurrently (parquet reads release the
        GIL); the first query otherwise pays a sequential shard-load."""
        idxs = self.reader.shard_ids
        if self._pool is None:
            for i in idxs:
                self.reader.shard(i)
        else:
            list(self._pool.map(self.reader.shard, idxs))
        return self

    @property
    def _stemmer(self):
        from ..analysis.stem import get_stemmer_cfg

        return get_stemmer_cfg(self.reader.manifest.get("config") or {})

    @property
    def _token_filter(self):
        """The index's token-filter chain as a 1:1 query-term transform.

        A term the chain DROPS (e.g. length-filtered) keeps its original
        text: the indexed stream no longer contains it, so the term query
        naturally matches nothing — the reference's query-analysis drop."""
        from ..analysis.filters import build_chain

        ch, _ = build_chain(
            (self.reader.manifest.get("config") or {}).get("token_filters"))
        if ch is None:
            return None

        def fn(t: str) -> str:
            r = ch(t)
            return t if r is None else r
        return fn

    def _rewrite_analyzed_fields(self, node):
        return rewrite_analyzed_fields(self.reader, node)

    def _node(self, query):
        from .query import apply_stemmer

        node = parse_query(query) if isinstance(query, str) else query
        node = self._rewrite_analyzed_fields(node)
        # index chain order: stop -> token_filters -> stemmer; mirror it
        node = apply_stemmer(node, self._token_filter)
        node = apply_stemmer(node, self._stemmer)
        cg = (self.reader.manifest.get("config") or {}).get("common_grams")
        if cg:
            from .query import rewrite_common_grams

            node = rewrite_common_grams(node, frozenset(cg))
        if (self.reader.manifest.get("config") or {}).get("cjk_bigrams"):
            from .query import rewrite_cjk_bigrams

            node = rewrite_cjk_bigrams(node)
        from .multiterm import expand_terms, rewrite
        from .query import Fuzzy

        def expander(n):
            seen: set[str] = set()
            for s in self.reader.shards:
                seen.update(expand_terms(s.terms, n))
            terms = sorted(seen)
            if isinstance(n, Fuzzy) and len(terms) > n.max_expansions:
                # FuzzyQuery top-terms rewrite: keep the max_expansions
                # highest-df dictionary terms (FuzzyQuery.java:56)
                ranked = sorted(
                    terms, key=lambda t: (-self.reader.term_stats(t)[0], t)
                )
                terms = sorted(ranked[: n.max_expansions])
            return terms

        node = rewrite(node, expander)
        from .query import collect_common_terms, rewrite_common_terms

        if collect_common_terms(node):
            node = rewrite_common_terms(
                node, lambda t: self.reader.term_stats(t)[0],
                self.reader.doc_count)
        return node

    def search(self, query, k: int = 10, use_wand: bool = True) -> pa.Table:
        from .executor import MaxScoreAccumulator

        node = self._node(query)
        weights = resolve_weights(self.reader, node, self.params, self.dtype)
        # shared min-competitive score: a shard that fills its top-k raises
        # θ for every concurrently-running shard (MaxScoreAccumulator role)
        acc = MaxScoreAccumulator()
        parts = self._map_shards(
            lambda s: shard_top_k(s, node, weights, k, self.dtype, use_wand,
                                  acc=acc),
            parallel=self._big_query(weights),
        )
        docs, scores = merge_top_k(parts, k)
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "score": pa.array(scores.astype(np.float64), pa.float64()),
                "rank": pa.array(np.arange(1, len(docs) + 1), pa.int32()),
            }
        )

    def search_after(self, query, after: tuple[float, int] | None = None,
                     k: int = 10) -> pa.Table:
        """Paged search (IndexSearcher.searchAfter, IndexSearcher.java:459):
        top-k strictly after the (score, doc_id) cursor in (score desc,
        doc asc) order. Page 1 (after=None) uses the pruned search path;
        later pages evaluate exhaustively and filter past-cursor hits (the
        reference's PagingTopScoreDocCollector role)."""
        if after is None:
            return self.search(query, k=k)
        a_score, a_doc = float(after[0]), int(after[1])
        node = self._node(query)
        weights = resolve_weights(self.reader, node, self.params, self.dtype)

        def page(s):
            d, sc = eval_node(s, node, weights, self.dtype)
            keep = (sc < a_score) | ((sc == a_score) & (d > a_doc))
            return top_k_select(d[keep], sc[keep], k)

        parts = self._map_shards(page, parallel=self._big_query(weights))
        docs, scores = merge_top_k(parts, k)
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "score": pa.array(scores.astype(np.float64), pa.float64()),
                "rank": pa.array(np.arange(1, len(docs) + 1), pa.int32()),
            }
        )

    def match_all(self, query) -> pa.Table:
        """All matching docs with scores (no top-k cut) — oracle-check mode."""
        node = self._node(query)
        weights = resolve_weights(self.reader, node, self.params, self.dtype)
        parts = self._map_shards(
            lambda s: eval_node(s, node, weights, self.dtype),
            parallel=self._big_query(weights),
        )
        docs = np.concatenate([d for d, _ in parts])
        scores = np.concatenate([s for _, s in parts])
        order = np.argsort(docs)
        return pa.table(
            {
                "doc_id": pa.array(docs[order], pa.int64()),
                "score": pa.array(scores[order].astype(np.float64), pa.float64()),
            }
        )

    def count(self, query) -> int:
        """TotalHitCountCollector: exact hit count (no pruning)."""
        node = self._node(query)
        weights = resolve_weights(self.reader, node, self.params, self.dtype)
        return sum(
            len(p[0]) for p in self._map_shards(
                lambda s: eval_node(s, node, weights, self.dtype),
                parallel=self._big_query(weights),
            )
        )


class _ShardServer:
    """Actor body: pins a subset of shards in memory (IndexReader role)."""

    def __init__(self, index_dir: str, shard_ids: list[int], dtype_name: str):
        self.shards = [ShardReader(index_dir, i) for i in shard_ids]
        self.dtype = np.float32 if dtype_name == "float32" else np.float64

    def term_stats(self, terms: list[str]):
        out = {}
        for t in terms:
            df = ttf = 0
            for s in self.shards:
                d, tt = s.term_stats(t)
                df += d
                ttf += tt
            out[t] = (df, ttf)
        return out

    def field_stats(self, fields: list[str]):
        """Per-analyzed-field (docCount, sumTotalTermFreq) partials over
        this actor's shards (fdl_<field> doclen docvalues)."""
        out = {}
        for f in fields:
            dc = sdl = 0
            for s in self.shards:
                v = s.docvalues.get(f"fdl_{f}")
                if v is not None and len(v):
                    dc += int(np.count_nonzero(v))
                    sdl += int(v.sum())
            out[f] = (dc, sdl)
        return out

    def expand(self, node):
        from .multiterm import expand_terms

        seen: set[str] = set()
        for s in self.shards:
            seen.update(expand_terms(s.terms, node))
        return sorted(seen)

    def search(self, node, weights, k: int, use_wand: bool):
        # θ is shared across the shards THIS actor owns (cross-actor sharing
        # would need an accumulator actor round-trip per update; the
        # reference likewise shares within one searcher process)
        from .executor import MaxScoreAccumulator

        acc = MaxScoreAccumulator()
        parts = [
            shard_top_k(s, node, weights, k, self.dtype, use_wand, acc=acc)
            for s in self.shards
        ]
        return merge_top_k(parts, k)


def batch_search(index_dir: str, queries, k: int = 10, concurrency: int = 8,
                 dtype=np.float32, batch_size: int = 16,
                 num_threads: int = 2, num_cpus: int = 2) -> "ray.data.Dataset":
    """Throughput-oriented query evaluation: queries as a Dataset through an
    actor pool of full-index searchers (each actor pins all shard tables
    once; per batch it evaluates many queries). Returns rows
    (query, rank, doc_id, score).

    Pool shape matters: each actor's searcher runs a SMALL thread pool
    matched to the actor's CPU reservation — an 8-thread searcher inside a
    1-CPU actor thrashes the GIL and halves throughput (measured 96 vs 205
    q/s at 2 threads / 2 CPUs on the 200k-doc bench index).

    This is the bulk/offline complement to DistributedSearcher's
    latency-oriented scatter-gather: relevance-eval sweeps, query-log
    replays, and training-data mining run here."""
    import ray
    import ray.data

    if not isinstance(queries, ray.data.Dataset):
        queries = ray.data.from_items([{"query": q} for q in queries])

    class Searcher:
        def __init__(self):
            self.s = IndexSearcher(index_dir, dtype=dtype,
                                   num_threads=num_threads).warmup()

        def __call__(self, t: pa.Table) -> pa.Table:
            out = {"query": [], "rank": [], "doc_id": [], "score": []}
            for q in t["query"].to_pylist():
                res = self.s.search(q, k=k)
                n = res.num_rows
                out["query"].extend([q] * n)
                out["rank"].extend(res["rank"].to_pylist())
                out["doc_id"].extend(res["doc_id"].to_pylist())
                out["score"].extend(res["score"].to_pylist())
            return pa.table({
                "query": pa.array(out["query"], pa.string()),
                "rank": pa.array(out["rank"], pa.int32()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "score": pa.array(out["score"], pa.float64()),
            })

    return queries.map_batches(
        Searcher, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus,
    )


class DistributedSearcher:
    """Stateful actor pool of shard searchers (the query-time architecture
    for a multi-node cluster; each actor would pin its shards' tables)."""

    def __init__(self, index_dir: str, num_actors: int = 4,
                 params: BM25Params = BM25Params(), dtype=np.float32):
        import ray

        self.params = params
        self.dtype = dtype
        reader = IndexReader(index_dir)
        # manifest-only handle (shard tables stay on the actors): drives the
        # analyzed-field rewrite; per-field stats are gathered from actors
        self.reader = reader
        self.doc_count = reader.doc_count
        self.sum_ttf = reader.sum_total_term_freq
        from ..analysis.filters import build_chain
        from ..analysis.stem import get_stemmer_cfg

        mcfg = reader.manifest.get("config") or {}
        self._stem = get_stemmer_cfg(mcfg)
        ch, _ = build_chain(mcfg.get("token_filters"))
        self._tf = (lambda t: (r if (r := ch(t)) is not None else t)) \
            if ch is not None else None
        shard_ids = list(reader.shard_ids)
        num_actors = min(num_actors, max(1, len(shard_ids)))
        assign = [shard_ids[i::num_actors] for i in range(num_actors)]
        cls = ray.remote(_ShardServer)
        dt = "float32" if dtype == np.float32 else "float64"
        self.actors = [cls.remote(index_dir, ids, dt) for ids in assign if ids]

    def search(self, query, k: int = 10, use_wand: bool = True) -> pa.Table:
        import ray

        from .query import (
            Bool,
            ConstantScore,
            DisMax,
            MultiPhrase,
            Phrase,
            Synonym,
            Term,
            query_terms,
        )

        node = parse_query(query) if isinstance(query, str) else query
        from .query import apply_stemmer

        # mirror IndexSearcher._node: analyzed-field rewrite first, then
        # token_filters, then stemmer
        node = rewrite_analyzed_fields(self.reader, node)
        node = apply_stemmer(node, self._tf)
        node = apply_stemmer(node, self._stem)

        from .multiterm import rewrite

        from .query import Fuzzy

        def expander(n):
            parts = ray.get([a.expand.remote(n) for a in self.actors])
            seen: set[str] = set()
            for p in parts:
                seen.update(p)
            out = sorted(seen)
            if isinstance(n, Fuzzy) and len(out) > n.max_expansions:
                sp = ray.get([a.term_stats.remote(out) for a in self.actors])
                dfm = {t: sum(p[t][0] for p in sp) for t in out}
                out = sorted(
                    sorted(out, key=lambda t: (-dfm[t], t))[: n.max_expansions]
                )
            return out

        node = rewrite(node, expander)
        from .query import collect_common_terms, rewrite_common_terms

        ct_terms = collect_common_terms(node)
        if ct_terms:
            # one batched stats fetch feeds the CommonTerms df split
            sp = ray.get([a.term_stats.remote(ct_terms) for a in self.actors])
            dfm = {t: sum(p[t][0] for p in sp) for t in ct_terms}
            node = rewrite_common_terms(node, lambda t: dfm.get(t, 0),
                                        self.doc_count)
        terms = query_terms(node)
        # phase 1: global term stats (createWeight)
        stats_parts = ray.get([a.term_stats.remote(terms) for a in self.actors])
        df = {t: sum(p[t][0] for p in stats_parts) for t in terms}
        ttf = {t: sum(p[t][1] for p in stats_parts) for t in terms}
        from .executor import _field_of
        from .similarity import as_similarity

        # analyzed-field collection stats, gathered from the actors once
        # (norm_field-tagged weights keep scoring parity with IndexSearcher)
        flds = sorted({f for t in terms
                       if (f := _field_of(self.reader, t)) is not None})
        fstats: dict = {}
        if flds:
            fp = ray.get([a.field_stats.remote(flds) for a in self.actors])
            fstats = {f: (sum(p[f][0] for p in fp), sum(p[f][1] for p in fp))
                      for f in flds}

        def _ctx(first_term: str):
            f = _field_of(self.reader, first_term)
            if f is None or f not in fstats:
                return self.doc_count, self.sum_ttf, None
            dc, sdl = fstats[f]
            return dc, sdl, f

        sim = as_similarity(self.params)
        weights: dict = {}

        def walk(n):
            if n is None:
                return
            if isinstance(n, Term):
                key = (n.text, n.boost)
                if key not in weights:
                    fN, fttf, fld = _ctx(n.text)
                    w = sim.weight(df[n.text], ttf[n.text], fN, fttf,
                                   n.boost, self.dtype)
                    w.norm_field = fld
                    weights[key] = w
            elif isinstance(n, Phrase):
                key = ("\x1f".join(n.terms), n.boost)
                if key not in weights:
                    fN, fttf, fld = _ctx(n.terms[0])
                    w = sim.multi_weight(
                        [df[t] for t in n.terms], [ttf[t] for t in n.terms],
                        fN, fttf, n.boost, self.dtype,
                    )
                    w.norm_field = fld
                    weights[key] = w
            elif isinstance(n, Synonym):
                key = ("\x1fSYN\x1f".join(n.terms), n.boost)
                if key not in weights:
                    fN, fttf, fld = _ctx(n.terms[0])
                    w = sim.weight(
                        max((df[t] for t in n.terms), default=0),
                        sum(ttf[t] for t in n.terms),
                        fN, fttf, n.boost, self.dtype,
                    )
                    w.norm_field = fld
                    weights[key] = w
            elif isinstance(n, MultiPhrase):
                key = ("\x1fMP\x1f".join("|".join(p) for p in n.positions), n.boost)
                if key not in weights:
                    fN, fttf, fld = _ctx(
                        n.positions[0][0]) if n.positions and n.positions[0] \
                        else (self.doc_count, self.sum_ttf, None)
                    w = sim.multi_weight(
                        [max((df.get(t, 0) for t in pos), default=0)
                         for pos in n.positions],
                        [sum(ttf.get(t, 0) for t in pos) for pos in n.positions],
                        fN, fttf, n.boost, self.dtype,
                    )
                    w.norm_field = fld
                    weights[key] = w
            elif isinstance(n, ConstantScore):
                walk(n.query)
            elif isinstance(n, DisMax):
                for c in n.clauses:
                    walk(c)
            elif isinstance(n, Bool):
                for c in n.must + n.should + n.must_not + n.filter:
                    walk(c)
            else:
                from .query import (
                    BlendedTerm,
                    CombinedField,
                    Covering,
                    FunctionScore,
                    TermAutomaton,
                )
                if isinstance(n, FunctionScore):
                    walk(n.query)
                elif isinstance(n, TermAutomaton):
                    from .executor import _ta_key

                    key = _ta_key(n)
                    if key not in weights:
                        st = [(df[t], ttf[t]) for t in n.terms()
                              if df[t] > 0]
                        weights[key] = sim.multi_weight(
                            [s[0] for s in st], [s[1] for s in st],
                            self.doc_count, self.sum_ttf, n.boost,
                            self.dtype)
                elif isinstance(n, Covering):
                    for c in n.clauses:
                        walk(c)
                elif isinstance(n, BlendedTerm):
                    from .executor import _bt_key

                    bdf = max((df[t] for t, _ in n.term_boosts), default=0)
                    bttf = sum(ttf[t] for t, _ in n.term_boosts)
                    for t, b in n.term_boosts:
                        key = _bt_key(n, t, b * n.boost)
                        if key not in weights:
                            fN, fttf_, fld = _ctx(t)
                            w = sim.weight(bdf, max(1, bttf), fN, fttf_,
                                           b * n.boost, self.dtype)
                            w.norm_field = fld
                            weights[key] = w
                elif isinstance(n, CombinedField):
                    from .executor import _cf_key

                    key = _cf_key(n)
                    if key not in weights:
                        # BM25FQuery pseudo stats from the gathered dicts
                        pseudo_df = max(
                            (df[f"{f}:{t}"] for f, _ in n.field_weights
                             for t in n.terms), default=0)
                        pttf = sum(
                            float(np.float32(fw)) * ttf[f"{f}:{t}"]
                            for f, fw in n.field_weights for t in n.terms)
                        dc = max((fstats.get(f, (0, 0))[0]
                                  for f, _ in n.field_weights), default=0)
                        sttf = sum(
                            float(np.float32(fw)) * fstats.get(f, (0, 0))[1]
                            for f, fw in n.field_weights)
                        w = sim.weight(pseudo_df, max(1, int(pttf)),
                                       max(1, dc), max(1, int(sttf)),
                                       n.boost, self.dtype)
                        w.norm_field = None
                        weights[key] = w

        walk(node)
        # phase 2: scatter search, gather + merge
        parts = ray.get([a.search.remote(node, weights, k, use_wand) for a in self.actors])
        docs, scores = merge_top_k(parts, k)
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "score": pa.array(scores.astype(np.float64), pa.float64()),
                "rank": pa.array(np.arange(1, len(docs) + 1), pa.int32()),
            }
        )
