"""Query AST + a classic-syntax parser subset.

Covers the shapes of the reference query set (benchmark/conf/query-terms.txt,
EnwikiQueryMaker.STANDARD_QUERIES): bare terms (default OR), AND / OR / NOT,
parentheses, "quoted phrases", and ^boost. The grammar is a small
recursive-descent parser standing in for the reference's JavaCC classic
QueryParser (queryparser/classic/QueryParser.jj) — only the subset the
reference query workloads exercise.

Query text runs through the same StandardAnalyzer chain as indexing.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Term:
    text: str
    boost: float = 1.0


@dataclass(frozen=True)
class Phrase:
    terms: tuple
    boost: float = 1.0
    slop: int = 0  # 0 = exact (ExactPhraseMatcher); >0 = sloppy window


@dataclass(frozen=True)
class Prefix:
    """PrefixQuery (search/PrefixQuery.java:31): expands over the sorted
    term dictionary, rewritten to a constant-score disjunction."""
    prefix: str
    boost: float = 1.0


@dataclass(frozen=True)
class Wildcard:
    """WildcardQuery (search/WildcardQuery.java:42): * and ? patterns."""
    pattern: str
    boost: float = 1.0


@dataclass(frozen=True)
class Regexp:
    """RegexpQuery (search/RegexpQuery.java:48)."""
    pattern: str
    boost: float = 1.0


@dataclass(frozen=True)
class Fuzzy:
    """FuzzyQuery (search/FuzzyQuery.java:56): terms within Damerau-
    Levenshtein edit distance (transpositions count as one edit, the
    reference default). Expansion is capped at max_expansions dictionary
    terms ranked by df descending (FuzzyQuery.defaultMaxExpansions = 50,
    top-terms blended rewrite)."""
    text: str
    max_edits: int = 2
    boost: float = 1.0
    max_expansions: int = 50


@dataclass(frozen=True)
class TermRange:
    """TermRangeQuery (search/TermRangeQuery.java:41): lexical term range."""
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class TermInSet:
    """TermInSetQuery (search/TermInSetQuery.java:67): constant-score set
    filter over many terms."""
    terms: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class Synonym:
    """SynonymQuery (search/SynonymQuery.java:55): multiple terms scored AS
    ONE term — freqs summed before scoring, df blended (max)."""
    terms: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class DisMax:
    """DisjunctionMaxQuery (search/DisjunctionMaxQuery.java:45): per-doc max
    over clauses plus tiebreak * sum of the rest."""
    clauses: tuple
    tiebreak: float = 0.0


@dataclass(frozen=True)
class ConstantScore:
    """ConstantScoreQuery (search/ConstantScoreQuery.java:32)."""
    query: object
    boost: float = 1.0


@dataclass(frozen=True)
class MatchAll:
    """MatchAllDocsQuery: every doc, score = boost."""
    boost: float = 1.0


@dataclass(frozen=True)
class SpanTerm:
    """SpanTermQuery (search/spans/SpanTermQuery.java): one-position spans."""
    text: str


@dataclass(frozen=True)
class SpanOrQ:
    """SpanOrQuery (search/spans/SpanOrQuery.java): union of span clauses
    (members restricted to SpanTerm here)."""
    clauses: tuple


@dataclass(frozen=True)
class SpanNear:
    """SpanNearQuery (search/spans/SpanNearQuery.java /
    NearSpansOrdered.java): clauses co-occur within `slop` intervening
    positions; in_order additionally requires the clause order (classic
    proximity algebra / queries/intervals Intervals.java:46 role). Scored
    like a phrase with blended clause stats; freq = number of distinct
    first-clause anchors starting a valid window (a documented
    simplification of the reference's span iterator enumeration)."""
    clauses: tuple  # SpanTerm | SpanOrQ
    slop: int = 0
    in_order: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class SpanNot:
    """SpanNotQuery (search/spans/SpanNotQuery.java): spans of `include`
    with no `exclude` span within pre positions before / post after."""
    include: object  # SpanTerm | SpanOrQ
    exclude: object  # SpanTerm | SpanOrQ
    pre: int = 0
    post: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class SpanFirst:
    """SpanFirstQuery: clause matches wholly before position `end`."""
    clause: object  # SpanTerm | SpanOrQ
    end: int = 1
    boost: float = 1.0


@dataclass(frozen=True)
class MultiPhrase:
    """MultiPhraseQuery (search/MultiPhraseQuery.java:56): a phrase where
    each position accepts any of several terms ("app* store" style). Scored
    like Phrase with blended stats (max df per position — the documented
    approximation of the reference's UnionPostingsEnum scoring)."""
    positions: tuple  # tuple of tuples of terms
    boost: float = 1.0
    slop: int = 0


@dataclass(frozen=True)
class FunctionScore:
    """FunctionScoreQuery (queries/function/FunctionScoreQuery.java:46) with
    a compiled expression (expressions/js/JavascriptCompiler.java:77 role):
    re-scores the wrapped query's hits as expr(score, doclen, <numeric
    docvalues fields>) — e.g. 'score * log1p(popularity)'."""
    query: object
    expr: str
    boost: float = 1.0


@dataclass(frozen=True)
class IndexOrDocValues:
    """IndexOrDocValuesQuery (search/IndexOrDocValuesQuery.java:50): an
    equality filter on a field indexed BOTH as keyword postings
    ('field:value' terms) and as a SORTED string docvalues column. As a
    Bool filter the executor picks per shard: decode the term's postings
    (cost ~ df) or verify the already-matched candidates against the
    docvalues ordinals (cost ~ |candidates|) — whichever leads cheaper."""
    field: str
    value: str
    boost: float = 1.0


@dataclass(frozen=True)
class IntervalQuery:
    """IntervalQuery (queries/intervals/IntervalQuery.java:62): wraps an
    interval source (intervals.ordered/unordered/phrase/maxgaps/containing/
    ...) as a scoring query; freq(doc) = number of minimal intervals."""
    source: object
    boost: float = 1.0


@dataclass(frozen=True)
class NumericInSet:
    """PointInSetQuery (search/PointInSetQuery.java:53): constant-score
    membership filter on a numeric docvalues column."""
    field: str
    values: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class SortedNumericRange:
    """Range filter over a SORTED_NUMERIC docvalues field
    (SortedNumericDocValuesField.newSlowRangeQuery,
    document/SortedNumericDocValuesField.java:121): constant-score filter
    matching docs where ANY of the doc's values falls in [lo, hi]."""
    field: str
    lo: float | None = None
    hi: float | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class SortedSetContains:
    """DocValuesTermsQuery over a SORTED_SET docvalues field
    (sandbox/search/DocValuesTermsQuery.java:71, DocValuesType.SORTED_SET):
    constant-score filter matching docs whose value SET intersects the given
    terms. Runs on int ordinals against the shard's shared value dictionary
    — no postings involved."""
    field: str
    values: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class FeatureQuery:
    """FeatureField scoring (document/FeatureField.java): a static per-doc
    feature (numeric docvalues column) contributes weight * fn(value) to
    the score. fn: 'satu' = v/(v+pivot), 'log' = log(1 + v/pivot)."""
    field: str
    weight: float = 1.0
    function: str = "satu"
    pivot: float = 1.0


@dataclass(frozen=True)
class DistanceFeature:
    """LongPoint.newDistanceFeatureQuery
    (document/LongDistanceFeatureQuery.java:43): matches every live doc
    carrying the numeric field, scored
    weight * (pivot / (pivot + |value - origin|)) — the recency/geo
    proximity boost Lucene folds into relevance as a should clause."""
    field: str
    origin: float
    pivot: float
    weight: float = 1.0


@dataclass(frozen=True)
class NumericRange:
    """PointRangeQuery / docvalues range (search/PointRangeQuery.java:47,
    IndexOrDocValuesQuery role): constant-score filter on a columnar per-doc
    numeric field. Supported fields: any docs-table column (doclen, doc_id).
    The BKD tree is replaced by a vectorized Arrow/numpy compare over the
    columnar sidecar — the idiomatic substitution (SURVEY.md §2.5)."""
    field: str
    lower: float | None = None
    upper: float | None = None
    boost: float = 1.0


@dataclass
class Bool:
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    filter: list = field(default_factory=list)  # match-only, no score (FILTER)
    min_should: int = 0


@dataclass(frozen=True)
class CommonTerms:
    """CommonTermsQuery (lucene/queries/.../CommonTermsQuery.java:61):
    terms are split into low-df and high-df groups by max_term_frequency
    (absolute df cutoff when >= 1, else a fraction of doc_count) and
    rewritten at search time — buildQuery (:158-222) — into
    Bool(must=[low-freq group], should=[high-freq group]). Occur values:
    'should' (with the fractional minimum-should-match calc) or 'must'.
    Rewrite needs global df, so it runs in the searcher (the reference
    equally rewrites against the IndexReader)."""
    terms: tuple
    max_term_frequency: float = 0.01
    low_freq_occur: str = "should"
    high_freq_occur: str = "should"
    low_min_should: float = 0.0   # <1.0 = fraction of optional clauses
    high_min_should: float = 0.0
    low_boost: float = 1.0
    high_boost: float = 1.0
    boost: float = 1.0


@dataclass(frozen=True)
class Covering:
    """CoveringQuery (lucene/sandbox/.../search/CoveringQuery.java:35):
    per-doc minimum-match count read from a NUMERIC docvalues field;
    values < 1 are treated as 1; docs missing the field never match;
    score = sum of the matching clauses' scores (CoveringScorer.java:94-115
    advances only while the potential match count can reach minMatch)."""
    clauses: tuple
    min_match_field: str
    boost: float = 1.0


@dataclass(frozen=True)
class FunctionRange:
    """FunctionRangeQuery (lucene/queries/.../function/
    FunctionRangeQuery.java:41 / Solr {!frange}): matches docs whose
    compiled expression value over docvalues/doclen lies in
    [lower, upper] (inclusive flags per the reference), constant-scored.
    The ValueSource is the expressions-compiler closure — a vectorized
    per-shard column scan, no postings involved."""
    expr: str
    lower: float | None = None
    upper: float | None = None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class TermAutomaton:
    """TermAutomatonQuery (lucene/sandbox/.../search/
    TermAutomatonQuery.java:71): proximity matching against an automaton
    whose transitions are terms (plus ANY wildcards) — the generalization
    of Phrase/MultiPhrase/SpanNear. freq counts accepting term-step paths
    (TermAutomatonScorer.java:230-330); weight = summed idf over the
    automaton's matched terms (TermAutomatonWeight:357-374). Semantics
    details in search/term_automaton.py."""
    num_states: int
    transitions: tuple      # (from_state, to_state, term)
    any_transitions: tuple = ()   # (from_state, to_state)
    accepts: tuple = ()
    boost: float = 1.0

    def terms(self) -> tuple:
        return tuple(dict.fromkeys(t for _, _, t in self.transitions))


@dataclass(frozen=True)
class BlendedTerm:
    """BlendedTermQuery (lucene/core/.../search/BlendedTermQuery.java:270-295):
    every member term is scored with ARTIFICIAL blended stats — df = max of
    the members' dfs, ttf = sum — so cross-field synonyms rank comparably;
    members keep their own field's collection stats and norms. Combined via
    DisjunctionMax(tiebreak) (DISJUNCTION_MAX_REWRITE, tie 0.01 default,
    :182-183) or a SHOULD Boolean (BOOLEAN_REWRITE, :133)."""
    term_boosts: tuple  # ((text, boost), ...)
    tiebreak: float = 0.01
    rewrite: str = "dismax"  # 'dismax' | 'bool'
    boost: float = 1.0


@dataclass(frozen=True)
class CombinedField:
    """BM25FQuery / CombinedFieldQuery (lucene/sandbox/.../search/
    BM25FQuery.java:58): scores terms across several analyzed fields AS ONE
    pseudo-field. Pseudo term stats (:279-294): df = max over all
    (term, field) pairs, ttf = max(1, sum of weight_f * ttf(term, field));
    pseudo collection stats (:302-315): docCount = max over fields,
    sumTotalTermFreq = sum of weight_f * sumTTF(field). Per doc:
    freq = sum of weight_f * tf (WeightedDisiWrapper.freq :397-408, float),
    norm = the single field's norm byte when only one field carries norms,
    else intToByte4(round(sum weight_f * byte4ToInt(norm_f)))
    re-quantized (MultiNormsLeafSimScorer.java:124-133). Field weights
    must be >= 1 (Builder.addField :98-102)."""
    field_weights: tuple  # ((analyzed_field, weight), ...)
    terms: tuple
    boost: float = 1.0

    def __post_init__(self):
        if any(w < 1 for _, w in self.field_weights):
            raise ValueError("field weight must be greater or equal to 1")


@dataclass(frozen=True)
class PhraseWildcard:
    """PhraseWildcardQuery (lucene/sandbox/.../search/
    PhraseWildcardQuery.java): a phrase where any position may be a
    multi-term pattern (wildcard/prefix/fuzzy...). The reference expands
    segment-by-segment under a shared maxMultiTermExpansions budget; here
    each pattern position expands once against the GLOBAL term dictionary
    (same matches — a term matching in any segment is in the union) and the
    result is a MultiPhrase evaluated by the existing exact matcher."""
    positions: tuple  # each element: str exact term OR a multi-term node
    max_expansions: int = 128
    slop: int = 0
    boost: float = 1.0


def rewrite_common_terms(node, df_of, max_doc: int):
    """Resolve CommonTerms nodes into Bool trees using global df stats
    (CommonTermsQuery.buildQuery, CommonTermsQuery.java:158-222).

    df_of: term -> collection doc freq; max_doc: collection doc count."""
    import math

    def _min_should(f: float, num_optional: int) -> int:
        # CommonTermsQuery.minNrShouldMatch (:171-176): >=1 or ==0 pass
        # through as int; a fraction rounds against the optional count
        if f >= 1.0 or f == 0.0:
            return int(f)
        return int(math.floor(f * num_optional + 0.5))  # Java Math.round

    def _group(terms, occur, msm: int, gboost: float, boost: float):
        # fold the reference's BoostQuery(group, groupBoost) into the term
        # boosts — BM25 scores are linear in boost, and the group scores
        # sum, so per-term scaling is exact
        ts = [Term(t, gboost * boost) for t in terms]
        if occur == "must":
            return Bool(must=ts)
        return Bool(should=ts, min_should=msm)

    if isinstance(node, CommonTerms):
        if not node.terms:
            return Bool()
        if len(node.terms) == 1:
            return Term(node.terms[0], node.boost)
        low, high = [], []
        frac_cut = int(math.ceil(node.max_term_frequency * max_doc))
        for t in node.terms:
            df = df_of(t)
            if df == 0:
                low.append(t)  # null TermStates -> low-freq group (:166)
            elif ((node.max_term_frequency >= 1.0
                   and df > node.max_term_frequency)
                  or df > frac_cut):
                high.append(t)
            else:
                low.append(t)
        low_occur, high_occur = node.low_freq_occur, node.high_freq_occur
        low_msm = (_min_should(node.low_min_should, len(low))
                   if low_occur == "should" and low else 0)
        high_msm = (_min_should(node.high_min_should, len(high))
                    if high_occur == "should" and high else 0)
        if not low:
            # all terms common: conjunction of the high-freq terms unless a
            # quorum/occur was configured (:197-204)
            if high_msm == 0 and high_occur != "must":
                high_occur = "must"
            return _group(high, high_occur, high_msm, node.high_boost,
                          node.boost)
        outer = Bool(must=[_group(low, low_occur, low_msm, node.low_boost,
                                  node.boost)])
        if high:
            outer.should.append(_group(high, high_occur, high_msm,
                                       node.high_boost, node.boost))
        return outer
    if isinstance(node, ConstantScore):
        return ConstantScore(rewrite_common_terms(node.query, df_of, max_doc),
                             node.boost)
    if isinstance(node, FunctionScore):
        return FunctionScore(rewrite_common_terms(node.query, df_of, max_doc),
                             node.expr, node.boost)
    if isinstance(node, DisMax):
        return DisMax(tuple(rewrite_common_terms(c, df_of, max_doc)
                            for c in node.clauses), node.tiebreak)
    if isinstance(node, Covering):
        return Covering(tuple(rewrite_common_terms(c, df_of, max_doc)
                              for c in node.clauses),
                        node.min_match_field, node.boost)
    if isinstance(node, Bool):
        return Bool(
            must=[rewrite_common_terms(c, df_of, max_doc) for c in node.must],
            should=[rewrite_common_terms(c, df_of, max_doc)
                    for c in node.should],
            must_not=[rewrite_common_terms(c, df_of, max_doc)
                      for c in node.must_not],
            filter=[rewrite_common_terms(c, df_of, max_doc)
                    for c in node.filter],
            min_should=node.min_should,
        )
    return node


def collect_common_terms(node) -> list[str]:
    """All terms under CommonTerms nodes (one batched stats fetch for the
    distributed searcher's rewrite)."""
    out: list[str] = []

    def walk(n):
        if n is None:
            return
        if isinstance(n, CommonTerms):
            out.extend(n.terms)
        elif isinstance(n, (ConstantScore, FunctionScore)):
            walk(n.query)
        elif isinstance(n, (DisMax, Covering)):
            for c in n.clauses:
                walk(c)
        elif isinstance(n, Bool):
            for c in n.must + n.should + n.must_not + n.filter:
                walk(c)

    walk(node)
    return list(dict.fromkeys(out))


_TOKEN_RE = re.compile(
    r'\(|\)|[A-Za-z_][A-Za-z0-9_]*:"[^"]*"|"[^"]*"|\[[^\]]*\]|/[^/]*/'
    r'|AND\b|OR\b|NOT\b|[^\s()]+')


def _analyze_term(text: str):
    from ..analysis import standard_analyzer

    terms, _ = standard_analyzer(text)
    return terms


def parse_query(q: str):
    toks = _TOKEN_RE.findall(q)
    if not toks:
        return Bool()  # empty query matches nothing
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def advance():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def parse_or():
        left = [parse_and()]
        while True:
            if peek() == "OR":
                advance()
                left.append(parse_and())
            elif peek() is not None and peek() != ")":
                # implicit operator: whitespace-adjacent clauses OR
                # together — the classic parser's default SHOULD occur
                # (queryparser/classic/QueryParserBase.java:64 default
                # operator OR). "fox dog" == "fox OR dog".
                left.append(parse_and())
            else:
                break
        left = [x for x in left if x is not None]
        if len(left) == 1:
            return left[0]
        negs = [x.must_not[0] for x in left if _is_neg(x)]
        pos_nodes = [x for x in left if not _is_neg(x)]
        if negs:
            # "fox NOT dog" at the OR level: positives score, negatives
            # exclude (a pure-negative query keeps the reject-only Bool)
            return Bool(should=pos_nodes, must_not=negs,
                        min_should=1 if pos_nodes else 0)
        return Bool(should=left, min_should=1)

    def parse_and():
        left = [parse_unary()]
        while peek() == "AND":
            advance()
            left.append(parse_unary())
        must = [x for x in left if x is not None and not _is_neg(x)]
        nots = [x.must_not[0] for x in left if x is not None and _is_neg(x)]
        if len(must) == 1 and not nots:
            return must[0]
        return Bool(must=must, must_not=nots)

    def _is_neg(x):
        return isinstance(x, Bool) and x.must_not and not x.must and not x.should

    def parse_unary():
        t = peek()
        if t == "NOT":
            advance()
            inner = parse_unary()
            return Bool(must_not=[inner])
        return parse_primary()

    def parse_primary():
        if pos >= len(toks):
            return None  # dangling operator / unbalanced paren
        t = advance()
        if t == "(":
            node = parse_or()
            if peek() == ")":
                advance()
            node2, boost = _maybe_boost(node)
            return node2
        m = re.match(r'^([A-Za-z_][A-Za-z0-9_]*):"([^"]*)"$', t)
        if m:
            # field:"a b" — a phrase within a field. Tokens are namespaced
            # "field:term"; the searcher's analyzed-field rewrite runs the
            # field's own chain and scores it (keyword fields keep the
            # constant-score form, which matches nothing unless such
            # namespaced terms exist).
            fld, body = m.group(1), m.group(2)
            boost = 1.0
            slop = 0
            if peek() and peek().startswith("~"):
                slop = int(advance()[1:] or "0")
            if peek() and peek().startswith("^"):
                boost = float(advance()[1:])
            terms = _analyze_term(body)
            if not terms:
                return None
            pref = tuple(f"{fld}:{x}" for x in terms)
            if len(pref) == 1:
                return ConstantScore(Term(pref[0]), boost)
            return ConstantScore(Phrase(pref, 1.0, slop), boost)
        if t.startswith('"'):
            body = t[1:-1]
            boost = 1.0
            slop = 0
            if peek() and peek().startswith("~"):
                slop = int(advance()[1:] or "0")
            if peek() and peek().startswith("^"):
                boost = float(advance()[1:])
            terms = _analyze_term(body)
            if not terms:
                return None
            if len(terms) == 1:
                return Term(terms[0], boost)
            return Phrase(tuple(terms), boost, slop)
        if t.startswith("[") and t.endswith("]"):
            # classic range syntax: [a TO b]
            body = t[1:-1].strip()
            m = re.match(r"(\S+)\s+TO\s+(\S+)", body)
            if m:
                lo = None if m.group(1) == "*" else m.group(1).lower()
                hi = None if m.group(2) == "*" else m.group(2).lower()
                return TermRange(lo, hi)
        if t.startswith("/") and t.endswith("/") and len(t) > 1:
            return Regexp(t[1:-1])
        # field:value — keyword-field term (StringField; untokenized, exact
        # value). Constant-score: keyword fields carry no norms.
        m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*):([^\s:]+)$", t)
        if m:
            return ConstantScore(Term(f"{m.group(1)}:{m.group(2)}"), 1.0)
        # bare word (may carry ^boost / ~fuzzy suffixes)
        boost = 1.0
        m = re.match(r"^(.*)\^([\d.]+)$", t)
        if m:
            t, boost = m.group(1), float(m.group(2))
        m = re.match(r"^(.+)~(\d*)$", t)
        if m:
            edits = int(m.group(2)) if m.group(2) else 2
            return Fuzzy(m.group(1).lower(), max_edits=edits, boost=boost)
        if "*" in t or "?" in t:
            low = t.lower()
            if low.endswith("*") and "*" not in low[:-1] and "?" not in low:
                return Prefix(low[:-1], boost)
            return Wildcard(low, boost)
        terms = _analyze_term(t)
        if not terms:
            return None
        if len(terms) == 1:
            return Term(terms[0], boost)
        # a word that analyzes to several terms (e.g. "wi-fi") -> OR group
        return Bool(should=[Term(x, boost) for x in terms], min_should=1)

    def _maybe_boost(node):
        if peek() and peek().startswith("^"):
            b = float(advance()[1:])
            return _boosted(node, b), b
        return node, 1.0

    def _boosted(node, b):
        if isinstance(node, Term):
            return Term(node.text, node.boost * b)
        if isinstance(node, Phrase):
            return Phrase(node.terms, node.boost * b)
        return node  # boost on bool groups: out of scope

    node = parse_or()
    return node if node is not None else Bool()


def rewrite_common_grams(node, common: frozenset):
    """CommonGramsQueryFilter mirror (commongrams/CommonGramsQueryFilter
    .java:64) for an index built with ``common_grams``: in every EXACT
    phrase, an adjacent pair containing a common word is replaced by its
    indexed bigram term "w1_w2" (which sits at the first word's position,
    so the rewritten phrase positions still line up); the final unigram is
    dropped when its bigram already covers it — the reference's golden
    layouts (n s n -> n_s s_n; s n n -> s_n n n). Sloppy phrases are left
    alone: unigrams stay indexed, so slop semantics are unchanged."""
    if node is None or not common:
        return node

    def walk(n):
        if isinstance(n, Phrase) and n.slop == 0 and len(n.terms) > 1:
            ts = n.terms
            out = []
            for i in range(len(ts)):
                if i + 1 < len(ts) and (ts[i] in common
                                        or ts[i + 1] in common):
                    out.append(ts[i] + "_" + ts[i + 1])
                elif (i == len(ts) - 1 and i > 0
                      and (ts[i - 1] in common or ts[i] in common)):
                    continue        # covered by the preceding bigram
                else:
                    out.append(ts[i])
            if len(out) == 1:
                return Term(out[0], n.boost)
            return Phrase(tuple(out), n.boost, 0)
        if isinstance(n, Bool):
            return Bool([walk(c) for c in n.must],
                        [walk(c) for c in n.should],
                        [walk(c) for c in n.must_not],
                        [walk(c) for c in n.filter], n.min_should)
        if isinstance(n, DisMax):
            from dataclasses import replace

            return replace(n, clauses=tuple(walk(c) for c in n.clauses))
        if isinstance(n, ConstantScore):
            return ConstantScore(walk(n.query), n.boost)
        if isinstance(n, FunctionScore):
            return FunctionScore(walk(n.query), n.expr, n.boost)
        return n

    return walk(node)


def rewrite_cjk_bigrams(node):
    """Query mirror of CJKBigramFilter (analysis/cjk/CJKBigramFilter
    .java:52) for an index built with ``cjk_bigrams``.

    The classic parser's analyzer splits a CJK run into single-char Terms
    (like the reference's StandardTokenizer inside the query analyzer), so
    the mirror re-merges runs of consecutive all-CJK tokens and re-emits
    their character bigrams:

    - inside a Phrase, the bigrams replace the run in place — phrase
      positions line up with the index's shifted stream;
    - in a Bool clause list, the run's bigrams become individual SHOULD/
      MUST terms — the reference's default QueryBuilder behavior for a
      multi-token chunk (autoGeneratePhraseQueries=false: "中国人" parses
      to 中国 OR 国人); quote the run for exact-adjacency semantics.

    Isolated single CJK chars stay unigram terms (that is how isolated
    chars are indexed). List-adjacent single-char CJK Terms are treated as
    one run — the parser does not preserve whether the user wrote a space
    between them."""
    from ..analysis.analyzers import _is_cjk_char

    def _cjk(t: str) -> bool:
        return bool(t) and all(_is_cjk_char(c) for c in t)

    def bigram_seq(terms: list) -> list:
        out: list = []
        i = 0
        while i < len(terms):
            t = terms[i]
            if not _cjk(t):
                out.append(t)
                i += 1
                continue
            j = i
            chars = list(t)
            while j + 1 < len(terms) and _cjk(terms[j + 1]):
                j += 1
                chars.extend(terms[j])
            if len(chars) == 1:
                out.append(chars[0])
            else:
                out.extend(chars[b] + chars[b + 1]
                           for b in range(len(chars) - 1))
            i = j + 1
        return out

    def clause_list(cs: list) -> list:
        out: list = []
        run: list = []
        for c in cs:
            if isinstance(c, Term) and _cjk(c.text):
                run.append(c.text)
                continue
            if run:
                out.extend(Term(t) for t in bigram_seq(run))
                run = []
            out.append(walk(c))
        if run:
            out.extend(Term(t) for t in bigram_seq(run))
        return out

    def walk(n):
        if isinstance(n, Term):
            g = bigram_seq([n.text])
            if len(g) == 1:
                return Term(g[0], n.boost)
            return Phrase(tuple(g), n.boost, 0)
        if isinstance(n, Phrase):
            return Phrase(tuple(bigram_seq(list(n.terms))), n.boost, n.slop)
        if isinstance(n, Bool):
            return Bool(clause_list(n.must), clause_list(n.should),
                        clause_list(n.must_not), clause_list(n.filter),
                        n.min_should)
        if isinstance(n, DisMax):
            from dataclasses import replace

            return replace(n, clauses=tuple(walk(c) for c in n.clauses))
        if isinstance(n, ConstantScore):
            return ConstantScore(walk(n.query), n.boost)
        if isinstance(n, FunctionScore):
            return FunctionScore(walk(n.query), n.expr, n.boost)
        return n

    return walk(node)


def apply_stemmer(node, stem):
    """Apply an index-configured stemmer to the query's analyzed terms
    (Term/Phrase/Synonym/TermInSet/Fuzzy text). Pattern nodes (Prefix/
    Wildcard/Regexp/TermRange) are left alone — the reference likewise does
    not analyze multi-term patterns."""
    if stem is None or node is None:
        return node
    # namespaced terms (keyword/analyzed "field:value") never take the
    # TEXT field's stemmer; per-field chains run in the searcher rewrite
    def st(t):
        return t if ":" in t else stem(t)

    if isinstance(node, Term):
        return Term(st(node.text), node.boost)
    if isinstance(node, Phrase):
        return Phrase(tuple(st(t) for t in node.terms), node.boost, node.slop)
    if isinstance(node, Synonym):
        return Synonym(tuple(st(t) for t in node.terms), node.boost)
    if isinstance(node, TermInSet):
        return TermInSet(tuple(st(t) for t in node.terms), node.boost)
    if isinstance(node, Fuzzy):
        return Fuzzy(st(node.text), node.max_edits, node.boost,
                     node.max_expansions)
    if isinstance(node, MultiPhrase):
        return MultiPhrase(tuple(tuple(st(t) for t in pos)
                                 for pos in node.positions),
                           node.boost, node.slop)
    if isinstance(node, FunctionScore):
        return FunctionScore(apply_stemmer(node.query, stem), node.expr,
                             node.boost)
    if isinstance(node, SpanTerm):
        return SpanTerm(st(node.text))
    if isinstance(node, SpanOrQ):
        return SpanOrQ(tuple(apply_stemmer(c, stem) for c in node.clauses))
    if isinstance(node, SpanNear):
        return SpanNear(tuple(apply_stemmer(c, stem) for c in node.clauses),
                        node.slop, node.in_order, node.boost)
    if isinstance(node, SpanFirst):
        return SpanFirst(apply_stemmer(node.clause, stem), node.end,
                         node.boost)
    if isinstance(node, SpanNot):
        return SpanNot(apply_stemmer(node.include, stem),
                       apply_stemmer(node.exclude, stem),
                       node.pre, node.post, node.boost)
    if isinstance(node, IntervalQuery):
        from .intervals import stem_source

        return IntervalQuery(stem_source(node.source, st), node.boost)
    if isinstance(node, ConstantScore):
        return ConstantScore(apply_stemmer(node.query, stem), node.boost)
    if isinstance(node, CommonTerms):
        from dataclasses import replace

        return replace(node, terms=tuple(st(t) for t in node.terms))
    if isinstance(node, BlendedTerm):
        from dataclasses import replace

        return replace(node, term_boosts=tuple(
            (st(t), b) for t, b in node.term_boosts))
    if isinstance(node, TermAutomaton):
        from dataclasses import replace

        return replace(node, transitions=tuple(
            (f, to, st(t)) for f, to, t in node.transitions))
    if isinstance(node, Covering):
        return Covering(tuple(apply_stemmer(c, stem) for c in node.clauses),
                        node.min_match_field, node.boost)
    if isinstance(node, PhraseWildcard):
        return PhraseWildcard(
            tuple(st(p) if isinstance(p, str)
                  else apply_stemmer(p, stem) for p in node.positions),
            node.max_expansions, node.slop, node.boost)
    if isinstance(node, DisMax):
        return DisMax(tuple(apply_stemmer(c, stem) for c in node.clauses),
                      node.tiebreak)
    if isinstance(node, Bool):
        return Bool(
            must=[apply_stemmer(c, stem) for c in node.must],
            should=[apply_stemmer(c, stem) for c in node.should],
            must_not=[apply_stemmer(c, stem) for c in node.must_not],
            filter=[apply_stemmer(c, stem) for c in node.filter],
            min_should=node.min_should,
        )
    return node


def requires_positive_term(node) -> bool:
    """True when the query CANNOT match a document containing none of its
    query_terms() — the soundness condition for term-filtered presearch
    (monitor/TermFilteredPresearcher.java:63). Conservative: anything not
    provably term-anchored (pure must_not, match-all, multi-term patterns,
    spans/intervals) returns False and must be checked on every batch."""
    if isinstance(node, (Term, Phrase, Synonym, TermInSet, MultiPhrase)):
        return True
    if isinstance(node, (ConstantScore, FunctionScore)):
        return requires_positive_term(node.query)
    if isinstance(node, DisMax):
        # matches when ANY clause matches: anchored only if every clause is
        return bool(node.clauses) and all(
            requires_positive_term(c) for c in node.clauses)
    if isinstance(node, Bool):
        pos = list(node.must) + list(node.filter)
        if any(requires_positive_term(c) for c in pos):
            return True  # a required conjunct is term-anchored
        should = list(node.should)
        return (not pos and bool(should)
                and all(requires_positive_term(c) for c in should))
    return False


def query_terms(node) -> list[str]:
    """All positive terms referenced by a query (for stats resolution)."""
    out: list[str] = []

    def walk(n):
        if n is None:
            return
        if isinstance(n, Term):
            out.append(n.text)
        elif isinstance(n, Phrase):
            out.extend(n.terms)
        elif isinstance(n, (Synonym, TermInSet)):
            out.extend(n.terms)
        elif isinstance(n, MultiPhrase):
            for pos_terms in n.positions:
                out.extend(pos_terms)
        elif isinstance(n, CommonTerms):
            out.extend(n.terms)
        elif isinstance(n, CombinedField):
            out.extend(f"{f}:{t}" for f, _ in n.field_weights
                       for t in n.terms)
        elif isinstance(n, BlendedTerm):
            out.extend(t for t, _ in n.term_boosts)
        elif isinstance(n, TermAutomaton):
            out.extend(n.terms())
        elif isinstance(n, ConstantScore):
            walk(n.query)
        elif isinstance(n, (DisMax, Covering)):
            for c in n.clauses:
                walk(c)
        elif isinstance(n, Bool):
            for c in n.must + n.should + n.must_not + n.filter:
                walk(c)

    walk(node)
    seen = set()
    uniq = []
    for t in out:
        if t not in seen:
            seen.add(t)
            uniq.append(t)
    return uniq


def edismax(q: str, qf: list[str], tie: float = 0.0,
            mm: int = 1, pf: list[str] | None = None):
    """ExtendedDisMaxQParser core (solr/core/.../search/
    ExtendedDismaxQParser.java:106 + DisMaxQParser.java:58): each analyzed
    query term becomes a DisjunctionMax over the query fields, and terms
    combine as SHOULD clauses with minimum-should-match = mm.

    qf entries use Solr's `field^boost` syntax; the empty field name ''
    addresses the main text field, any other name an analyzed field
    (terms rewrite to `field:term` and route to per-field stats/norms/
    query-side analysis downstream).
    """
    from ..analysis import standard_analyzer

    fields = []
    for f in qf:
        name, _, b = f.partition("^")
        fields.append((name, float(b) if b else 1.0))
    if not fields:
        raise ValueError("edismax needs at least one query field")
    terms, _ = standard_analyzer(q)
    shoulds = []
    for t in terms:
        # field terms use the parser's ConstantScore marker so the
        # analyzed-field rewrite runs the field's query-side analyzer and
        # scores with field stats (keyword fields stay constant-score,
        # exactly the parser's field:value semantics)
        clauses = tuple(
            Term(t, boost=b) if not name
            else ConstantScore(Term(f"{name}:{t}"), boost=b)
            for name, b in fields)
        shoulds.append(clauses[0] if len(clauses) == 1
                       else DisMax(clauses, tiebreak=tie))
    mm_eff = min(mm, len(shoulds)) if shoulds else 0
    if pf and len(terms) > 1:
        # phrase fields (edismax pf, ExtendedDismaxQParser.java:258): the
        # whole query as a phrase per pf field, appended as an extra
        # optional boost clause. min_should stays at the term-based mm: a
        # phrase can only match when every term matches, so the threshold
        # semantics are unchanged for any mm <= len(terms).
        for f in pf:
            name, _, b = f.partition("^")
            boost = float(b) if b else 1.0
            pts = tuple(t if not name else f"{name}:{t}" for t in terms)
            ph = Phrase(pts, boost)
            shoulds.append(ph if not name else ConstantScore(
                Phrase(tuple(f"{name}:{t}" for t in terms), 1.0), boost))
    return Bool(should=shoulds, min_should=mm_eff)


@dataclass(frozen=True)
class FieldExists:
    """FieldExistsQuery (search/FieldExistsQuery.java:46): constant-score
    filter matching docs that HAVE a value for a docvalues field — BINARY
    (non-null), SORTED_SET / SORTED_NUMERIC (non-empty set), SORTED /
    NUMERIC (always present when the column exists; missing only on
    mixed-generation appends without the field)."""
    field: str
    boost: float = 1.0
