"""SQL (DuckDB) formulations of the engine's fulltext semantics.

Used by the driver's correctness gate: the same BM25 computation the engine
performs — including the SmallFloat norm quantization — expressed as ANSI
SQL over the raw documents table. Tokenization in SQL is
string_split(text, ' '), which is exactly the StandardAnalyzer output on the
synthetic documents corpus (pure lowercase ASCII words, single-spaced).

Scores here use the engine's float64 oracle mode (same formula, double
precision); both sides round to 6 decimals.
"""

from __future__ import annotations

from ..util.smallfloat import byte4_to_int

K1 = 1.2
B = 0.75
ROUND = 6


def _lut_values() -> str:
    """256-entry (quantized-length boundary) VALUES list: the quantized doc
    length is the greatest representable value <= dl."""
    vals = sorted({byte4_to_int(b) for b in range(256)})
    return ", ".join(f"({v})" for v in vals)


def bm25_cte(table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
             term_expr: str | None = None) -> str:
    """Common CTEs: tok, dl (true + quantized), stats. term_expr maps each
    raw token (column `raw`) through an analysis expression — e.g. the
    minimal stemmer — before stats are computed (1:1, so dl is unchanged)."""
    tok = (
        f"SELECT doc_id, {term_expr} AS term FROM ("
        f"SELECT {id_col} AS doc_id, unnest(string_split({text_col}, ' ')) AS raw"
        f" FROM {table})"
        if term_expr else
        f"SELECT {id_col} AS doc_id, unnest(string_split({text_col}, ' ')) AS term"
        f" FROM {table}"
    )
    return f"""
tok AS (
  {tok}
),
dl AS (
  SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
),
lut(v) AS (VALUES {_lut_values()}),
qdl AS (
  SELECT dl.doc_id, dl.dl, (SELECT max(l.v) FROM lut l WHERE l.v <= dl.dl) AS qlen
  FROM dl
),
stats AS (
  SELECT count(*) AS n, sum(dl) AS sum_dl, sum(dl) * 1.0 / count(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, term, count(*) AS freq FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
)"""


def bm25_term_score_sql(term_expr: str) -> str:
    """Score expression for one term given tf row t, df row d, qdl row q,
    stats row s — mirrors BM25Similarity: w - w/(1 + freq*normInverse)."""
    return f"""
  ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
  - ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
    / (1 + t.freq * (1.0 / ({K1} * ((1 - {B}) + {B} * q.qlen / s.avgdl))))"""


def sql_term_df() -> str:
    return f"""
WITH {bm25_cte()}
SELECT d.term AS term, d.df AS df, s.ttf AS ttf
FROM df d
JOIN (SELECT term, count(*) AS ttf FROM tok GROUP BY term) s USING (term)
ORDER BY term"""


def sql_top_terms(k: int = 20) -> str:
    return f"""
WITH {bm25_cte()}
SELECT term, df FROM df ORDER BY df DESC, term ASC LIMIT {k}"""


def sql_bm25_term(term: str, table: str = "documents",
                  term_expr: str | None = None) -> str:
    return f"""
WITH {bm25_cte(table=table, term_expr=term_expr)}
SELECT t.doc_id AS doc_id,
       round({bm25_term_score_sql(term)}, {ROUND}) AS score
FROM tf t
JOIN df d ON d.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term = '{term}'
ORDER BY doc_id"""


def sql_bm25_or(terms: list[str]) -> str:
    quoted = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {bm25_cte()}
SELECT t.doc_id AS doc_id,
       round(sum({bm25_term_score_sql("t.term")}), {ROUND}) AS score
FROM tf t
JOIN df d ON d.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term IN ({quoted})
GROUP BY t.doc_id
ORDER BY t.doc_id"""


def sql_bm25_and(terms: list[str]) -> str:
    quoted = ", ".join(f"'{t}'" for t in terms)
    n = len(terms)
    return f"""
WITH {bm25_cte()}
SELECT t.doc_id AS doc_id,
       round(sum({bm25_term_score_sql("t.term")}), {ROUND}) AS score
FROM tf t
JOIN df d ON d.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term IN ({quoted})
GROUP BY t.doc_id
HAVING count(DISTINCT t.term) = {n}
ORDER BY t.doc_id"""


def sql_tfidf_or(terms: list[str]) -> str:
    """ClassicSimilarity: score = (ln((N+1)/(df+1)) + 1) * sqrt(freq)
    * 1/sqrt(qlen), summed over matching terms (TFIDFSimilarity.java:390)."""
    quoted = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {bm25_cte()}
SELECT t.doc_id AS doc_id,
       round(sum(
         ((ln((s.n + 1.0) / (d.df + 1.0)) + 1) * sqrt(t.freq))
         * (1.0 / sqrt(q.qlen))), {ROUND}) AS score
FROM tf t
JOIN df d ON d.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term IN ({quoted})
GROUP BY t.doc_id
ORDER BY t.doc_id"""


def sql_sweetspot_term(term: str, ln_min: int = 5, ln_max: int = 8,
                       steep: float = 0.5, tf_base: float = 1.5,
                       tf_min: float = 2.0) -> str:
    """SweetSpotSimilarity (misc/SweetSpotSimilarity.java:117-165):
    classic idf * baselineTf(freq) * plateau lengthNorm(qlen)."""
    return f"""
WITH {bm25_cte()}
SELECT t.doc_id AS doc_id,
       round(
         (ln((s.n + 1.0) / (d.df + 1.0)) + 1)
         * (CASE WHEN t.freq <= {tf_min} THEN {tf_base}
                 ELSE sqrt(t.freq + {tf_base * tf_base} - {tf_min}) END)
         * (1.0 / sqrt({steep} * (abs(q.qlen - {ln_min})
                                  + abs(q.qlen - {ln_max})
                                  - {ln_max - ln_min}) + 1.0)),
         {ROUND}) AS score
FROM tf t
JOIN df d ON d.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term = '{term}'
ORDER BY doc_id"""


def sql_lm_dirichlet_term(term: str, mu: float = 2000.0) -> str:
    """LMDirichletSimilarity: score = max(0, ln(1 + freq/(mu*p))
    + ln(mu/(qlen+mu))) with p = (ttf+1)/(sum_ttf+1)
    (LMDirichletSimilarity.java:59-77)."""
    return f"""
WITH {bm25_cte()},
tt AS (SELECT term, count(*) AS ttf FROM tok GROUP BY term)
SELECT t.doc_id AS doc_id,
       round(greatest(0.0,
         ln(1.0 + t.freq * (1.0 / ({mu} * ((c.ttf + 1.0) / (s.sum_dl + 1.0)))))
         + ln({mu} / (q.qlen + {mu}))), {ROUND}) AS score
FROM tf t
JOIN tt c ON c.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term = '{term}'
ORDER BY doc_id"""


def sql_lm_jelinek_mercer_term(term: str, lam: float = 0.7) -> str:
    """LMJelinekMercerSimilarity: score = ln(1 + ((1-lam)*freq/dl)
    / (lam*p)) with p = (ttf+1)/(sum_ttf+1)
    (LMJelinekMercerSimilarity.java:60-71)."""
    return f"""
WITH {bm25_cte()},
tt AS (SELECT term, count(*) AS ttf FROM tok GROUP BY term)
SELECT t.doc_id AS doc_id,
       round(ln(1.0 + ((1.0 - {lam}) * t.freq / q.qlen)
                / ({lam} * ((c.ttf + 1.0) / (s.sum_dl + 1.0)))), {ROUND}) AS score
FROM tf t
JOIN tt c ON c.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term = '{term}'
ORDER BY doc_id"""


def sql_dfr_term(term: str, c: float = 1.0) -> str:
    """DFR I(F)-B-H2 (DFRSimilarity.java:115): tfn = freq*log2(1+c*avgdl/dl),
    score = (F+1)/(df*(tfn+1)) * tfn * log2(1+(N+1)/(F+0.5))."""
    return f"""
WITH {bm25_cte()},
tt AS (SELECT term, count(*) AS ttf FROM tok GROUP BY term)
SELECT t.doc_id AS doc_id,
       round(
         ((c.ttf + 1.0) / (d.df * ((t.freq * log2(1.0 + {c} * s.avgdl / q.qlen)) + 1.0)))
         * (t.freq * log2(1.0 + {c} * s.avgdl / q.qlen))
         * log2(1.0 + (s.n + 1.0) / (c.ttf + 0.5)), {ROUND}) AS score
FROM tf t
JOIN df d ON d.term = t.term
JOIN tt c ON c.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term = '{term}'
ORDER BY doc_id"""


def sql_function_score(term: str, col: str = "n_chars") -> str:
    """FunctionScoreQuery + compiled expression oracle
    (queries/function/FunctionScoreQuery.java:46,
    expressions/js/JavascriptCompiler.java:77 role): the engine evaluates
    `score * log1p(col) + sqrt(col)` over the NUMERIC docvalues column in
    float64; the SQL mirror computes the identical double expression over
    the raw documents column the docvalues were built from."""
    return f"""
WITH {bm25_cte()}
SELECT t.doc_id AS doc_id,
       round(({bm25_term_score_sql(term)}) * ln(1 + doc.{col})
             + sqrt(doc.{col}), {ROUND}) AS score
FROM tf t
JOIN df d ON d.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
JOIN documents doc ON doc.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term = '{term}'
ORDER BY doc_id"""


def sql_distance_feature(term: str, col: str = "n_chars",
                         origin: float = 400.0, pivot: float = 100.0,
                         weight: float = 2.0) -> str:
    """LongPoint.newDistanceFeatureQuery oracle
    (document/LongDistanceFeatureQuery.java:43): BM25(term) must-clause plus
    the optional proximity feature weight * pivot / (pivot + |col - origin|)
    — the ReqOptSumScorer sum, identical double op order on both sides."""
    return f"""
WITH {bm25_cte()}
SELECT t.doc_id AS doc_id,
       round(({bm25_term_score_sql(term)})
             + {weight} * ({pivot} / ({pivot} + abs(doc.{col} - {origin}))),
             {ROUND}) AS score
FROM tf t
JOIN df d ON d.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
JOIN documents doc ON doc.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term = '{term}'
ORDER BY doc_id"""


def sql_count_term(term: str) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT count(DISTINCT doc_id) AS hits FROM tok WHERE term = '{term}'"""


def sql_phrase_docs(phrase: str) -> str:
    # word-boundary contains match on single-spaced corpus text
    return f"""
SELECT doc_id FROM documents
WHERE (' ' || text || ' ') LIKE '% {phrase} %'
ORDER BY doc_id"""


def sql_common_terms(terms: list[str], mtf: float) -> str:
    """CommonTermsQuery mirror (queries/CommonTermsQuery.java:158-222),
    default SHOULD/SHOULD occurs: the low/high split is computed from the
    DATA (df > ceil(mtf * docCount) -> high-freq group); a doc matches when
    it contains at least one LOW-freq term, scored as the BM25 sum over all
    matching query terms (low group MUST + high group SHOULD, both pure
    disjunctions, scores additive)."""
    quoted_vals = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH {bm25_cte()},
qt(term) AS (VALUES {quoted_vals}),
split AS (
  SELECT qt.term,
         CASE WHEN coalesce(d.df, 0) >
              ceil({mtf} * (SELECT n FROM stats)) THEN 1 ELSE 0 END AS hi
  FROM qt LEFT JOIN df d ON d.term = qt.term
)
SELECT t.doc_id AS doc_id,
       round(sum({bm25_term_score_sql("t.term")}), {ROUND}) AS score
FROM tf t
JOIN split sp ON sp.term = t.term
JOIN df d ON d.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
CROSS JOIN stats s
GROUP BY t.doc_id
HAVING max(CASE WHEN sp.hi = 0 THEN 1 ELSE 0 END) = 1
ORDER BY doc_id"""


def sql_covering(terms: list[str]) -> str:
    """CoveringQuery mirror (sandbox/search/CoveringQuery.java:35): per-doc
    required match count min_m = doc_id mod 3 + 1 (NULL — never matches —
    every 7th doc), matching docs need count(matching clauses) >=
    greatest(1, min_m); score = BM25 sum of the matching clauses."""
    quoted = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH {bm25_cte()},
minm AS (
  SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN NULL
                      ELSE doc_id % 3 + 1 END AS m
  FROM documents
)
SELECT t.doc_id AS doc_id,
       round(sum({bm25_term_score_sql("t.term")}), {ROUND}) AS score
FROM tf t
JOIN df d ON d.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
JOIN minm mm ON mm.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term IN ({quoted}) AND mm.m IS NOT NULL
GROUP BY t.doc_id
HAVING count(DISTINCT t.term) >= greatest(1, max(mm.m))
ORDER BY doc_id"""


def sql_bm25f(term: str, title_len: int = 3, wt: float = 1.0,
              wb: float = 2.0) -> str:
    """BM25FQuery mirror (sandbox/search/BM25FQuery.java:58) over the
    derived two-field corpus (title = first `title_len` tokens, body =
    rest): pseudo df = greatest of the field dfs, docCount = greatest of
    the field doc counts, sumTTF = weighted field length sums; per doc
    freq = weighted tf sum and norm = requantized weighted sum of the
    per-field quantized lengths (MultiNormsLeafSimScorer.java:124-133)."""
    return f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
flds AS (
  SELECT doc_id,
         list_slice(toks, 1, {title_len}) AS title,
         list_slice(toks, {title_len + 1}, len(toks)) AS body
  FROM base
),
per AS (
  SELECT doc_id,
         len(list_filter(title, x -> x = '{term}')) AS tf_t,
         len(list_filter(body,  x -> x = '{term}')) AS tf_b,
         len(title) AS dl_t, len(body) AS dl_b
  FROM flds
),
st AS (
  SELECT greatest(count(*) FILTER (WHERE tf_t > 0),
                  count(*) FILTER (WHERE tf_b > 0)) AS df,
         greatest(count(*) FILTER (WHERE dl_t > 0),
                  count(*) FILTER (WHERE dl_b > 0)) AS dc,
         CAST({wt} * sum(dl_t) + {wb} * sum(dl_b) AS BIGINT) AS sttf
  FROM per
),
lut(v) AS (VALUES {_lut_values()}),
scored AS (
  SELECT p.doc_id,
         {wt} * p.tf_t + {wb} * p.tf_b AS freq,
         (SELECT max(l.v) FROM lut l WHERE l.v <= floor(
             {wt} * (SELECT max(a.v) FROM lut a WHERE a.v <= p.dl_t)
           + {wb} * (SELECT max(b.v) FROM lut b WHERE b.v <= p.dl_b)
           + 0.5)) AS dlq,
         s.df AS df, s.dc AS dc, s.sttf * 1.0 / s.dc AS avgdl
  FROM per p CROSS JOIN st s
  WHERE {wt} * p.tf_t + {wb} * p.tf_b > 0
)
SELECT doc_id,
       round(
         ln(1 + (dc - df + 0.5) / (df + 0.5))
         - ln(1 + (dc - df + 0.5) / (df + 0.5))
           / (1 + freq * (1.0 / ({K1} * ((1 - {B}) + {B} * dlq / avgdl)))),
         {ROUND}) AS score
FROM scored
ORDER BY doc_id"""


def sql_blended(term_boosts: list[tuple[str, float]],
                tie: float = 0.01) -> str:
    """BlendedTermQuery mirror (core/search/BlendedTermQuery.java:270-295):
    every member scores with the ARTIFICIAL blended df (max over members);
    members combine as DisjunctionMax(tie)."""
    quoted = ", ".join(f"'{t}'" for t, _ in term_boosts)
    case = " ".join(f"WHEN '{t}' THEN {b}" for t, b in term_boosts)
    return f"""
WITH {bm25_cte()},
bl AS (
  SELECT max(df) AS bdf FROM df WHERE term IN ({quoted})
),
member AS (
  SELECT t.doc_id,
         (CASE t.term {case} END)
           * ln(1 + (s.n - bl.bdf + 0.5) / (bl.bdf + 0.5)) AS w,
         t.freq AS freq, q.qlen AS qlen, s.avgdl AS avgdl
  FROM tf t
  JOIN qdl q ON q.doc_id = t.doc_id
  CROSS JOIN stats s CROSS JOIN bl
  WHERE t.term IN ({quoted})
),
scored AS (
  SELECT doc_id,
         w - w / (1 + freq * (1.0 / ({K1} * ((1 - {B}) + {B} * qlen / avgdl))))
           AS sc
  FROM member
)
SELECT doc_id, round(max(sc) + {tie} * (sum(sc) - max(sc)), {ROUND}) AS score
FROM scored GROUP BY doc_id ORDER BY doc_id"""


def sql_must_with_should_group(must_term: str,
                               should_terms: list[str]) -> str:
    """Bool(must=[Bool(should=should_terms), must_term]) mirror — the
    SimpleQueryParser's left-accumulative '(a | b) + c' shape: docs must
    contain must_term AND at least one should term; score = BM25 sum over
    every matching query term."""
    quoted = ", ".join(f"'{t}'" for t in should_terms + [must_term])
    should_q = ", ".join(f"'{t}'" for t in should_terms)
    return f"""
WITH {bm25_cte()}
SELECT t.doc_id AS doc_id,
       round(sum({bm25_term_score_sql("t.term")}), {ROUND}) AS score
FROM tf t
JOIN df d ON d.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term IN ({quoted})
GROUP BY t.doc_id
HAVING max(CASE WHEN t.term = '{must_term}' THEN 1 ELSE 0 END) = 1
   AND max(CASE WHEN t.term IN ({should_q}) THEN 1 ELSE 0 END) = 1
ORDER BY doc_id"""


def sql_phrase_prefix_docs(lead: str, prefix: str) -> str:
    """PhraseWildcardQuery mirror: token i == lead, token i+1 starts with
    prefix (single-spaced corpus text; the trailing %% spans the rest of
    the second token)."""
    return f"""
SELECT doc_id FROM documents
WHERE (' ' || text || ' ') LIKE '% {lead} {prefix}%'
ORDER BY doc_id"""


def sql_quality_eval(queries: list[tuple[str, str, str]], k: int = 10) -> str:
    """Relevance-eval metrics in SQL (QualityBenchmark/QualityStats oracle,
    quality/QualityStats.java:68-113): each (query_id, term, rel_term)
    entry scores single-term BM25 top-k (score DESC, doc_id ASC — the
    engine's tie order) and judges docs containing BOTH term and rel_term
    relevant (TrecJudge binary relevance)."""
    qvals = ", ".join(f"('{qid}', '{t}', '{r}')" for qid, t, r in queries)
    return f"""
WITH {bm25_cte()},
qs(qid, qterm, rterm) AS (VALUES {qvals}),
scores AS (
  SELECT qs.qid, t.doc_id, {bm25_term_score_sql("t.term")} AS score
  FROM qs
  JOIN tf t ON t.term = qs.qterm
  JOIN df d ON d.term = t.term
  JOIN qdl q ON q.doc_id = t.doc_id
  CROSS JOIN stats s
),
ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scores
),
topk AS (SELECT * FROM ranked WHERE rnk <= {k}),
rel AS (
  SELECT DISTINCT qs.qid, a.doc_id
  FROM qs
  JOIN tf a ON a.term = qs.qterm
  JOIN tf b ON b.doc_id = a.doc_id AND b.term = qs.rterm
),
relcnt AS (SELECT qid, count(*) AS num_rel FROM rel GROUP BY qid),
hits AS (
  SELECT t.qid, t.rnk,
         row_number() OVER (PARTITION BY t.qid ORDER BY t.rnk) AS hit_no
  FROM topk t
  JOIN rel r ON r.qid = t.qid AND r.doc_id = t.doc_id
),
agg AS (
  SELECT q.qid AS query_id,
         coalesce(rc.num_rel, 0) AS num_rel,
         coalesce(h.nrr, 0) AS num_rel_ret,
         coalesce(h.first_rnk, 0) AS first_rnk,
         coalesce(h.sum_prec, 0.0) AS sum_prec,
         coalesce(h.dcg, 0.0) AS dcg
  FROM qs q
  LEFT JOIN relcnt rc ON rc.qid = q.qid
  LEFT JOIN (
    SELECT qid, count(*) AS nrr, min(rnk) AS first_rnk,
           sum(hit_no * 1.0 / rnk) AS sum_prec,
           sum(1.0 / log2(rnk + 1.0)) AS dcg
    FROM hits GROUP BY qid
  ) h ON h.qid = q.qid
),
idcg_tbl AS (
  SELECT m, sum(1.0 / log2(i + 1.0)) AS idcg
  FROM generate_series(1, {k}) AS ms(m)
  JOIN generate_series(1, {k}) AS gs(i) ON i <= m
  GROUP BY m
)
SELECT query_id,
       CAST(num_rel AS BIGINT) AS num_rel,
       CAST(num_rel_ret AS BIGINT) AS num_rel_ret,
       round(num_rel_ret * 1.0 / {k}, {ROUND}) AS precision_at_k,
       round(CASE WHEN num_rel > 0
                  THEN num_rel_ret * 1.0 / num_rel ELSE 0.0 END,
             {ROUND}) AS recall,
       round(CASE WHEN first_rnk > 0 THEN 1.0 / first_rnk ELSE 0.0 END,
             {ROUND}) AS mrr,
       round(CASE WHEN num_rel > 0 THEN sum_prec / num_rel ELSE 0.0 END,
             {ROUND}) AS ap,
       round(CASE WHEN num_rel > 0 THEN dcg / it.idcg
             ELSE 0.0 END, {ROUND}) AS ndcg
FROM agg
LEFT JOIN idcg_tbl it ON it.m = least(greatest(num_rel, 1), {k})
ORDER BY query_id"""


def sql_elevate(term: str, elevate_ids, exclude_ids, k: int = 10) -> str:
    """QueryElevationComponent mirror: pinned ids first in configured order
    (score 0 when not matching), then remaining matches by score desc /
    doc_id asc, excluded ids removed, top-k."""
    ev = ", ".join(f"({int(d)}, {i})" for i, d in enumerate(elevate_ids))
    not_in = ", ".join(str(int(d)) for d in
                       list(elevate_ids) + list(exclude_ids))
    ex = ", ".join(str(int(d)) for d in exclude_ids) or "NULL"
    return f"""
WITH {bm25_cte()},
sc AS (
  SELECT t.doc_id AS doc_id, {bm25_term_score_sql(term)} AS score
  FROM tf t
  JOIN df d ON d.term = t.term
  JOIN qdl q ON q.doc_id = t.doc_id
  CROSS JOIN stats s
  WHERE t.term = '{term}'
),
elev(doc_id, ord) AS (SELECT * FROM (VALUES {ev}) AS v(doc_id, ord)),
ranked AS (
  SELECT e.doc_id, coalesce(sc.score, 0.0) AS score, TRUE AS elevated,
         0 AS grp, CAST(e.ord AS BIGINT) AS ord
  FROM elev e LEFT JOIN sc ON sc.doc_id = e.doc_id
  WHERE e.doc_id NOT IN ({ex})
  UNION ALL
  SELECT doc_id, score, FALSE, 1,
         row_number() OVER (ORDER BY score DESC, doc_id)
  FROM sc WHERE doc_id NOT IN ({not_in})
)
SELECT doc_id, round(score, {ROUND}) AS score, elevated,
       CAST(row_number() OVER (ORDER BY grp, ord) AS BIGINT) AS rank
FROM ranked ORDER BY grp, ord LIMIT {k}"""


def sql_block_join(term: str, span: int = 16) -> str:
    """ToParentBlockJoin mirror: per-child BM25 term score (rounded per
    child, as the engine's round_child does) grouped to parent_id =
    doc_id // span with Max / Total / Avg score modes + child count."""
    return f"""
WITH {bm25_cte()},
child AS (
  SELECT t.doc_id AS doc_id,
         round({bm25_term_score_sql(term)}, {ROUND}) AS score
  FROM tf t
  JOIN df d ON d.term = t.term
  JOIN qdl q ON q.doc_id = t.doc_id
  CROSS JOIN stats s
  WHERE t.term = '{term}')
SELECT parent_id,
       score_max,
       score_total,
       round(score_total / n_children, {ROUND}) AS score_avg,
       n_children
FROM (
  SELECT doc_id // {span} AS parent_id,
         round(max(score), {ROUND}) AS score_max,
         round(sum(score), {ROUND}) AS score_total,
         CAST(count(*) AS BIGINT) AS n_children
  FROM child
  GROUP BY parent_id)
ORDER BY parent_id"""


def sql_payload_score(term: str) -> str:
    """PayloadScoreQuery mirror over the payload-annotated derivation of
    the documents table: token i of doc d carries payload 1 + (d + i) % 7
    (the engine's _payload_index derivation), recomputed here from
    (doc_id, position) via zipped unnest."""
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents),
ann AS (
  SELECT doc_id, term, 1 + (doc_id + pos) % 7 AS pay FROM tok)
SELECT doc_id,
       CAST(max(pay) AS DOUBLE) AS pay_max,
       CAST(sum(pay) AS DOUBLE) AS pay_sum,
       round(CAST(sum(pay) AS DOUBLE) / count(*), {ROUND}) AS pay_avg
FROM ann
WHERE term = '{term}'
GROUP BY doc_id
ORDER BY doc_id"""


def sql_freetext(context: str, prefix: str, k: int = 5,
                 alpha: float = 0.4) -> str:
    """FreeTextSuggester bigram stupid-backoff mirror: candidates with the
    prefix score count(context,w)/count(context) when the bigram exists,
    else alpha * count(w)/total_tokens."""
    return f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents),
uni AS (SELECT term AS word, count(*) AS cnt FROM tok GROUP BY term),
tot AS (SELECT sum(cnt) AS total FROM uni),
big AS (
  SELECT a.term AS ctx, b.term AS word, count(*) AS cnt
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2),
ctxc AS (SELECT cnt AS c FROM uni WHERE word = '{context}')
SELECT u.word AS word,
       round(CASE WHEN bg.cnt IS NOT NULL THEN bg.cnt * 1.0 / ctxc.c
                  ELSE {alpha} * u.cnt * 1.0 / tot.total END,
             {ROUND}) AS score
FROM uni u
LEFT JOIN big bg ON bg.ctx = '{context}' AND bg.word = u.word
CROSS JOIN ctxc CROSS JOIN tot
WHERE u.word LIKE '{prefix}%'
ORDER BY score DESC, word ASC
LIMIT {k}"""


def sql_grouping(term: str, field: str = "lang", n_groups: int = 3,
                 docs_per_group: int = 2) -> str:
    """GroupingSearch mirror: per-doc BM25 term score rounded, groups
    ranked by best score (desc, group asc), docs ranked inside each
    (score desc, doc_id asc) via window functions."""
    return f"""
WITH {bm25_cte()},
scored AS (
  SELECT t.doc_id AS doc_id, doc.{field} AS grp,
         round({bm25_term_score_sql(term)}, {ROUND}) AS score
  FROM tf t
  JOIN df d ON d.term = t.term
  JOIN qdl q ON q.doc_id = t.doc_id
  JOIN documents doc ON doc.doc_id = t.doc_id
  CROSS JOIN stats s
  WHERE t.term = '{term}'),
gr AS (
  SELECT grp, row_number() OVER (ORDER BY max(score) DESC, grp ASC)
         AS grp_rank
  FROM scored GROUP BY grp),
ranked AS (
  SELECT s.grp, s.doc_id, s.score, gr.grp_rank,
         row_number() OVER (PARTITION BY s.grp
                            ORDER BY s.score DESC, s.doc_id ASC) AS doc_rank
  FROM scored s JOIN gr USING (grp)
  WHERE gr.grp_rank <= {n_groups})
SELECT grp, doc_id, score,
       CAST(grp_rank AS BIGINT) AS grp_rank,
       CAST(doc_rank AS BIGINT) AS doc_rank
FROM ranked
WHERE doc_rank <= {docs_per_group}
ORDER BY grp_rank, doc_rank"""


def sql_axiomatic_f2exp_term(term: str, s_p: float = 0.25,
                             k_p: float = 0.35) -> str:
    """AxiomaticF2EXP: score = freq/(freq + s + s*dl/avgdl)
    * ((N+1)/df)^k (AxiomaticF2EXP.java tfln/idf)."""
    return f"""
WITH {bm25_cte()}
SELECT t.doc_id AS doc_id,
       round((t.freq / (t.freq + {s_p} + {s_p} * q.qlen / s.avgdl))
             * pow((s.n + 1.0) / d.df, {k_p}), {ROUND}) AS score
FROM tf t
JOIN df d ON d.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term = '{term}'
ORDER BY doc_id"""


def sql_dfi_term(term: str) -> str:
    """DFISimilarity (standardized independence): expected =
    (F+1)*dl/(sum_dl+1); 0 when freq <= expected else
    log2((freq-expected)/sqrt(expected) + 1) (DFISimilarity.java:63)."""
    return f"""
WITH {bm25_cte()},
tt AS (SELECT term, count(*) AS ttf FROM tok GROUP BY term)
SELECT t.doc_id AS doc_id,
       round(CASE
         WHEN t.freq <= (c.ttf + 1.0) * q.qlen / (s.sum_dl + 1.0) THEN 0.0
         ELSE log2((t.freq - (c.ttf + 1.0) * q.qlen / (s.sum_dl + 1.0))
                   / sqrt((c.ttf + 1.0) * q.qlen / (s.sum_dl + 1.0)) + 1.0)
       END, {ROUND}) AS score
FROM tf t
JOIN tt c ON c.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term = '{term}'
ORDER BY doc_id"""


def sql_ib_ll_term(term: str, c: float = 1.0) -> str:
    """IBSimilarity LL-D(F)-H2: lambda = float32((df+1)/(N+1)),
    tfn = freq * log2(1 + c*avgdl/dl), score = -ln(lambda/(tfn+lambda))
    (IBSimilarity.java:109, DistributionLL.java:30, LambdaDF.java:33)."""
    return f"""
WITH {bm25_cte()}
SELECT t.doc_id AS doc_id,
       round(-ln(CAST((d.df + 1.0) / (s.n + 1.0) AS REAL)
                 / (t.freq * log2(1.0 + {c} * s.avgdl / q.qlen)
                    + CAST((d.df + 1.0) / (s.n + 1.0) AS REAL))),
             {ROUND}) AS score
FROM tf t
JOIN df d ON d.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term = '{term}'
ORDER BY doc_id"""


def sql_multi_sim_term(term: str) -> str:
    """MultiSimilarity mirror: BM25 + Classic scores summed per doc."""
    return f"""
WITH {bm25_cte()}
SELECT t.doc_id AS doc_id,
       round(({bm25_term_score_sql(term)})
             + ((ln((s.n + 1.0) / (d.df + 1.0)) + 1) * sqrt(t.freq))
               * (1.0 / sqrt(q.qlen)), {ROUND}) AS score
FROM tf t
JOIN df d ON d.term = t.term
JOIN qdl q ON q.doc_id = t.doc_id
CROSS JOIN stats s
WHERE t.term = '{term}'
ORDER BY doc_id"""


def sql_edismax(terms: list[tuple[str, str]], boost: float = 1.5,
                tie: float = 0.1) -> str:
    """edismax mirror over (main text, stemmed analyzed field 'text'):
    per term, DisMax(main BM25, boost * field BM25) with tiebreak; terms
    sum as SHOULD with mm=1. `terms` = [(raw_term, stemmed_term), ...].
    The analyzed field indexes the same tokens 1:1 (stemming is 1:1), so
    field docCount/sumTTF/norms equal the main field's — qdl/stats CTEs
    are shared; only tf/df differ."""
    from ..analysis.stem import sql_minimal_stem

    vals = ", ".join(f"('{r}', '{s}')" for r, s in terms)
    score = bm25_term_score_sql("t.term")
    return f"""
WITH {bm25_cte()},
stok AS (
  SELECT doc_id, {sql_minimal_stem('raw')} AS term FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS raw FROM documents)),
stf AS (SELECT doc_id, term, count(*) AS freq FROM stok GROUP BY doc_id, term),
sdf AS (SELECT term, count(*) AS df FROM stf GROUP BY term),
qt(raw_term, fld_term) AS (VALUES {vals}),
a AS (
  SELECT qt.raw_term AS qterm, t.doc_id AS doc_id, ({score}) AS sc
  FROM qt
  JOIN tf t ON t.term = qt.raw_term
  JOIN df d ON d.term = t.term
  JOIN qdl q ON q.doc_id = t.doc_id
  CROSS JOIN stats s),
b AS (
  SELECT qt.raw_term AS qterm, t.doc_id AS doc_id,
         {boost} * ({score}) AS sc
  FROM qt
  JOIN stf t ON t.term = qt.fld_term
  JOIN sdf d ON d.term = t.term
  JOIN qdl q ON q.doc_id = t.doc_id
  CROSS JOIN stats s),
comb AS (
  SELECT coalesce(a.qterm, b.qterm) AS qterm,
         coalesce(a.doc_id, b.doc_id) AS doc_id,
         CASE WHEN a.sc IS NOT NULL AND b.sc IS NOT NULL
              THEN greatest(a.sc, b.sc) + {tie} * least(a.sc, b.sc)
              ELSE coalesce(a.sc, b.sc) END AS sc
  FROM a FULL OUTER JOIN b ON a.qterm = b.qterm AND a.doc_id = b.doc_id)
SELECT doc_id, round(sum(sc), {ROUND}) AS score
FROM comb
GROUP BY doc_id
ORDER BY doc_id"""


def sql_fuzzy_suggest(prefixes: list[str], k: int = 10,
                      max_edits: int = 1) -> str:
    """FuzzySuggester mirror: per typed key, dictionary terms whose prefix
    of length len(key)+-max_edits is within max_edits restricted-Damerau
    edits (DuckDB damerau_levenshtein is the same OSA metric), first char
    anchored; ranked by df desc, term asc, top k per key."""
    branches = []
    for p in prefixes:
        n = len(p)
        lens = range(max(1, n - max_edits), n + max_edits + 1)
        dist = " OR ".join(
            f"damerau_levenshtein('{p}', substr(term, 1, {L}))"
            f" <= {max_edits}" for L in lens)
        branches.append(
            f"SELECT '{p}' AS key, term, df FROM df "
            f"WHERE substr(term, 1, 1) = '{p[0]}' AND ({dist})")
    union = "\nUNION ALL\n".join(branches)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
cand AS ({union}),
ranked AS (
  SELECT key, term, CAST(df AS BIGINT) AS df,
         row_number() OVER (PARTITION BY key
                            ORDER BY df DESC, term ASC) AS rn
  FROM cand)
SELECT key, term, df FROM ranked WHERE rn <= {k}
ORDER BY key, df DESC, term"""


def sql_join_query(term: str, field: str = "lang") -> str:
    """JoinUtil.createJoinQuery mirror (join/JoinUtil.java:90): per-doc
    BM25 score of `term` rounded per doc (as the engine's round_from
    does), aggregated per from-side `field` value with Max / Total / Avg
    score modes, then every doc with that `field` value joined back with
    the aggregate; avg divides the rounded total so both sides divide
    bit-identical inputs."""
    return f"""
WITH {bm25_cte()},
sc AS (
  SELECT t.doc_id AS doc_id,
         round({bm25_term_score_sql(term)}, {ROUND}) AS score
  FROM tf t
  JOIN df d ON d.term = t.term
  JOIN qdl q ON q.doc_id = t.doc_id
  CROSS JOIN stats s
  WHERE t.term = '{term}'),
fr AS (
  SELECT doc.{field} AS v,
         round(max(sc.score), {ROUND}) AS s_max,
         round(sum(sc.score), {ROUND}) AS s_total,
         CAST(count(*) AS BIGINT) AS n_from
  FROM sc JOIN documents doc ON doc.doc_id = sc.doc_id
  GROUP BY doc.{field})
SELECT d.doc_id,
       f.s_max AS score_max,
       f.s_total AS score_total,
       round(f.s_total / f.n_from, {ROUND}) AS score_avg
FROM documents d JOIN fr f ON d.{field} = f.v
ORDER BY d.doc_id"""


def sql_collapse_expand(term: str, field: str = "lang", k: int = 5,
                        expand_rows: int = 2) -> str:
    """CollapsingQParserPlugin + ExpandComponent mirror (score collapse):
    one head per group by (score desc, doc asc), heads ranked the same way
    top-k, plus each head's top expand_rows companions."""
    return f"""
WITH {bm25_cte()},
scored AS (
  SELECT t.doc_id AS doc_id, doc.{field} AS grp,
         round({bm25_term_score_sql(term)}, {ROUND}) AS score
  FROM tf t
  JOIN df d ON d.term = t.term
  JOIN qdl q ON q.doc_id = t.doc_id
  JOIN documents doc ON doc.doc_id = t.doc_id
  CROSS JOIN stats s
  WHERE t.term = '{term}'),
heads AS (
  SELECT grp, doc_id, score,
         row_number() OVER (PARTITION BY grp
                            ORDER BY score DESC, doc_id ASC) AS rn
  FROM scored),
hsel AS (
  SELECT grp, doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS head_rank
  FROM heads WHERE rn = 1),
htop AS (SELECT * FROM hsel WHERE head_rank <= {k}),
comp AS (
  SELECT sc.grp, sc.doc_id, sc.score, h.head_rank,
         row_number() OVER (PARTITION BY sc.grp
                            ORDER BY sc.score DESC, sc.doc_id ASC) AS exp_rank
  FROM scored sc JOIN htop h ON h.grp = sc.grp AND h.doc_id <> sc.doc_id)
SELECT grp, doc_id, score, role,
       CAST(head_rank AS BIGINT) AS head_rank,
       CAST(exp_rank AS BIGINT) AS exp_rank
FROM (
  SELECT grp, doc_id, score, 'head' AS role, head_rank, 0 AS exp_rank
  FROM htop
  UNION ALL
  SELECT grp, doc_id, score, 'expand', head_rank, exp_rank
  FROM comp WHERE exp_rank <= {expand_rows})
ORDER BY head_rank, exp_rank"""


def sql_ltr_linear(term: str, w_orig: float, w_nch: float, w_flen: float,
                   nmin: float, nmax: float, k: int = 10) -> str:
    """LTR LinearModel mirror: candidates = docs matching `term`;
    ltr = w_orig*bm25 + w_nch*(n_chars-min)/(max-min) + w_flen*qlen where
    qlen is the SmallFloat-quantized doc length (FieldLengthFeature
    decodes the norm byte, = the bm25_cte's qdl.qlen)."""
    return f"""
WITH {bm25_cte()},
scored AS (
  SELECT t.doc_id AS doc_id,
         ({bm25_term_score_sql(term)}) AS orig,
         q.qlen AS flen
  FROM tf t
  JOIN df d ON d.term = t.term
  JOIN qdl q ON q.doc_id = t.doc_id
  CROSS JOIN stats s
  WHERE t.term = '{term}')
SELECT s2.doc_id AS doc_id,
       round(s2.orig, {ROUND}) AS orig_score,
       round({w_orig} * s2.orig
             + {w_nch} * ((doc.n_chars - {nmin}) / ({nmax} - {nmin}))
             + {w_flen} * s2.flen, {ROUND}) AS ltr_score
FROM scored s2 JOIN documents doc USING (doc_id)
ORDER BY ltr_score DESC, doc_id ASC
LIMIT {k}"""


def sql_ltr_trees(term: str, spec: dict, k: int = 10) -> str:
    """LTR MultipleAdditiveTreesModel mirror: nested CASE per tree,
    generated from the SAME managed-store JSON the engine loads, with the
    identically slack-bumped float32 thresholds."""
    from .ltr import _load_tree

    exprs = {"nch": "doc.n_chars", "flen": "s2.flen"}

    def case(n) -> str:
        if n.feature is None:
            return repr(n.value)
        return (f"(CASE WHEN {exprs[n.feature]} <= {n.threshold!r} "
                f"THEN {case(n.left)} ELSE {case(n.right)} END)")

    score = " + ".join(
        f"{float(t['weight'])!r} * {case(_load_tree(t['root']))}"
        for t in spec["params"]["trees"])
    return f"""
WITH {bm25_cte()},
scored AS (
  SELECT t.doc_id AS doc_id,
         ({bm25_term_score_sql(term)}) AS orig,
         q.qlen AS flen
  FROM tf t
  JOIN df d ON d.term = t.term
  JOIN qdl q ON q.doc_id = t.doc_id
  CROSS JOIN stats s
  WHERE t.term = '{term}')
SELECT s2.doc_id AS doc_id,
       round(s2.orig, {ROUND}) AS orig_score,
       round({score}, {ROUND}) AS ltr_score
FROM scored s2 JOIN documents doc USING (doc_id)
ORDER BY ltr_score DESC, doc_id ASC
LIMIT {k}"""


def sql_bm25_phrase_as_term(terms: list[str], table: str = "documents") -> str:
    """BM25 of an index-time synonym token standing in for an exact
    phrase (SynonymGraphFilter.java:81 multi-word rule): tf = number of
    adjacency matches of the phrase, df = docs with >= 1 match, doclen /
    norms from the VISIBLE token count (graph insertions don't count
    toward norms — the engine's documented accounting)."""
    conds = " AND ".join(
        f"t{j}.term = '{t}'" for j, t in enumerate(terms))
    joins = " ".join(
        f"JOIN tok t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.pos = t0.pos + {j}"
        for j in range(1, len(terms)))
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM {table}),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
lut(v) AS (VALUES {_lut_values()}),
qdl AS (
  SELECT dl.doc_id, (SELECT max(l.v) FROM lut l WHERE l.v <= dl.dl) AS qlen
  FROM dl),
stats AS (
  SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
ph AS (
  SELECT t0.doc_id, count(*) AS freq
  FROM tok t0 {joins}
  WHERE {conds}
  GROUP BY t0.doc_id),
phdf AS (SELECT count(*) AS df FROM ph)
SELECT p.doc_id AS doc_id,
       round(
         ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
         - ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
           / (1 + p.freq * (1.0 / ({K1} * ((1 - {B}) + {B} * q.qlen / s.avgdl)))),
         {ROUND}) AS score
FROM ph p
JOIN qdl q ON q.doc_id = p.doc_id
CROSS JOIN stats s
CROSS JOIN phdf d
ORDER BY doc_id"""
