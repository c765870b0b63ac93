"""DuckDB oracle-SQL builders for the signature / curation operators.

Each builder returns one SQL string over the driver's pre-registered views
(documents, embeddings, ...). They replicate the engine's deterministic
kernels bit-for-bit: the polynomial codepoint hash (util/polyhash) is
expressed with list_reduce + HUGEINT arithmetic, simhash bit sums become 62
SUM(CASE ...) aggregates, and language-ID occurrence counting becomes
length(replace(...)) arithmetic — so the driver's value-hash compare is a
real end-to-end check, not a rows-only count.
"""

from __future__ import annotations

from .textstats.ops import _LANG_PROFILES
from .util.polyhash import sql_poly_hash

_MOD_2_64 = 18446744073709551616


def sql_simhash(bits: int = 62) -> str:
    """Per-doc simhash over whitespace tokens (matches simhash_signatures)."""
    vcols = ",\n      ".join(
        f"SUM(CASE WHEN (hw // {1 << b}::HUGEINT) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    recompose = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END)"
        for b in range(bits)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), h AS (
      SELECT doc_id, {sql_poly_hash('w')} AS hw FROM tok
    ), b AS (
      SELECT doc_id,
      {vcols}
      FROM h GROUP BY doc_id
    )
    SELECT doc_id, CAST({recompose} AS BIGINT) AS simhash
    FROM b ORDER BY doc_id"""


def sql_fingerprint(window: int = 16) -> str:
    """Per-doc min rolling-window hash >> 2 (matches doc_fingerprint)."""
    h_whole = sql_poly_hash("text")
    h_win = sql_poly_hash(f"substring(text, i, {window})")
    return f"""
    SELECT doc_id,
      CAST(CASE WHEN length(text) < {window}
        THEN {h_whole} // 4
        ELSE list_min(list_transform(
               generate_series(1, length(text) - {window - 1}),
               i -> {h_win})) // 4
      END AS BIGINT) AS fingerprint
    FROM documents ORDER BY doc_id"""


def sql_lang_id() -> str:
    """Per-doc profile-trigram occurrence scoring (matches language_id)."""
    profiles = sorted(_LANG_PROFILES.items())

    def count_expr(tri: str) -> str:
        lit = tri.replace("'", "''")
        return (f"(length(lt) - length(replace(lt, '{lit}', ''))) // {len(tri)}")

    score_cols = ",\n      ".join(
        f"({' + '.join(count_expr(tri) for tri in tris)}) AS s_{lang}"
        for lang, tris in profiles
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang, _ in profiles) + ")"
    # tie-break: first lang (sorted) reaching the max; 'und' when max == 0
    guess_cases = "\n        ".join(
        f"WHEN s_{lang} = best THEN '{lang}'" for lang, _ in profiles
    )
    return f"""
    WITH lowered AS (
      SELECT doc_id, lower(text) AS lt FROM documents
    ), scored AS (
      SELECT doc_id,
      {score_cols}
      FROM lowered
    ), ranked AS (
      SELECT *, {best} AS best FROM scored
    )
    SELECT doc_id,
      CASE WHEN best = 0 THEN 'und'
        {guess_cases}
      END AS lang_guess,
      CAST(best AS BIGINT) AS score
    FROM ranked ORDER BY doc_id"""


def sql_jaccard_pairs(threshold: float = 0.8, shingle_k: int = 3,
                      round_nd: int = 6) -> str:
    """All doc pairs with exact word-shingle Jaccard >= threshold (matches
    dedup_minhash_verified: LSH candidates + exact verify; with rows-per-
    band=2 x 16 bands the LSH miss probability at J>=0.8 is ~1e-7, so the
    engine output equals this exhaustive answer)."""
    k = shingle_k
    shingle_expr = " || ' ' || ".join(f"t[i+{j}]" for j in range(k))
    return f"""
    WITH ts AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(
        CASE WHEN len(t) < {k} THEN [array_to_string(t, ' ')]
        ELSE list_transform(generate_series(1, len(t) - {k - 1}),
                            i -> {shingle_expr})
        END) AS s
      FROM ts
    ), shd AS (
      SELECT DISTINCT doc_id, s FROM sh
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS l, b.doc_id AS r, count(*) AS i
      FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT l AS left_id, r AS right_id,
           round(i * 1.0 / (sa.n + sb.n - i), {round_nd}) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = l
    JOIN sizes sb ON sb.doc_id = r
    WHERE i * 1.0 / (sa.n + sb.n - i) >= {threshold}
    ORDER BY 1, 2"""


def sql_embedding_pairs(threshold: float = 0.95, round_nd: int = 4,
                        dup_offset: int | None = None) -> str:
    """All embedding pairs with cosine >= threshold (matches
    embedding_dup_pairs over the same input). dup_offset plants the same
    exact-copy union the driver entry uses (exact copies share every LSH
    bucket, so the engine's recall on them is structural)."""
    base = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings"
    if dup_offset:
        base += (f" UNION ALL SELECT vec_id + {dup_offset}, "
                 "CAST(embedding AS DOUBLE[]) AS e FROM embeddings")
    return f"""
    WITH n AS (
      {base}
    )
    SELECT a.vec_id AS left_id, b.vec_id AS right_id,
           round(list_cosine_similarity(a.e, b.e), {round_nd}) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.e, b.e) >= {threshold}
    ORDER BY 1, 2"""


def sql_mm_decode() -> str:
    """Deterministic fake image-decode metadata (matches _FakeDecoder:
    dims derived from the blob's byte length; the blob in the mm_decode
    entry is the utf-8 encoding of documents.text)."""
    return """
    SELECT doc_id,
      CAST(16 + octet_length(encode(text)) % 240 AS INTEGER) AS height,
      CAST(16 + (octet_length(encode(text)) // 240) % 240 AS INTEGER) AS width
    FROM documents ORDER BY doc_id"""


def sql_naive_bayes(words: list[str], round_nd: int = 6) -> str:
    """SimpleNaiveBayesClassifier mirror: per class c,
    ln(df_c) - ln(N) + sum_w ln((hits(w,c)+1)/(avgU*df_c + N)) where
    hits(w,c) = class-c docs CONTAINING w (a doc count), avgU =
    distinct (doc,term) pairs / docs-with-text, N = docs with a class."""
    vals = ", ".join(f"('{w}')" for w in words)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
pairs AS (SELECT DISTINCT doc_id, term FROM tok),
cls AS (SELECT lang AS c, count(*) AS dfc FROM documents
        WHERE lang IS NOT NULL GROUP BY lang),
n AS (SELECT sum(dfc) AS n FROM cls),
avgu AS (SELECT count(*) * 1.0
                / (SELECT count(DISTINCT doc_id) FROM pairs) AS au
         FROM pairs),
words(w) AS (VALUES {vals}),
hits AS (SELECT d.lang AS c, p.term AS w, count(*) AS h
         FROM pairs p JOIN documents d USING (doc_id)
         WHERE d.lang IS NOT NULL GROUP BY 1, 2),
ll AS (
  SELECT c.c AS cls,
         sum(ln((coalesce(h.h, 0) + 1) / (a.au * c.dfc + n.n))) AS s
  FROM words w
  CROSS JOIN cls c CROSS JOIN avgu a CROSS JOIN n
  LEFT JOIN hits h ON h.c = c.c AND h.w = w.w
  GROUP BY c.c)
SELECT ll.cls AS cls,
       round(ln(c.dfc) - ln(n.n) + ll.s, {round_nd}) AS log_score
FROM ll JOIN cls c ON c.c = ll.cls CROSS JOIN n
ORDER BY cls"""


def sql_perplexity(lo: float = 30.0, hi: float = 31.0,
                   round_nd: int = 4) -> str:
    """Word-bigram add-one-smoothing perplexity mirror:
    P(w_i|w_{i-1}) = (c(bigram)+1)/(c(w_{i-1})+V), first token
    (c(w)+1)/(T+V); PP = exp(-avg ln P); bucket from the ROUNDED value."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
  WHERE text IS NOT NULL AND text <> ''),
uni AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
tot AS (SELECT count(*) AS t FROM tok),
vv AS (SELECT count(*) AS v FROM uni),
big AS (
  SELECT a.term AS ctx, b.term AS w, count(*) AS cnt
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2),
seq AS (
  SELECT doc_id, term AS w,
         coalesce(lag(term) OVER (PARTITION BY doc_id ORDER BY pos), '')
         AS ctx
  FROM tok),
lnp AS (
  SELECT s.doc_id,
         ln(((CASE WHEN s.ctx = '' THEN coalesce(u2.cnt, 0)
                   ELSE coalesce(b.cnt, 0) END) + 1.0)
            / ((CASE WHEN s.ctx = '' THEN tot.t
                     ELSE coalesce(u.cnt, 0) END) + vv.v)) AS l
  FROM seq s
  LEFT JOIN big b ON b.ctx = s.ctx AND b.w = s.w
  LEFT JOIN uni u ON u.term = s.ctx
  LEFT JOIN uni u2 ON u2.term = s.w
  CROSS JOIN tot CROSS JOIN vv),
pp AS (
  SELECT doc_id, round(exp(-avg(l)), {round_nd}) AS perplexity
  FROM lnp GROUP BY doc_id)
SELECT d.doc_id AS doc_id,
       coalesce(pp.perplexity, -1.0) AS perplexity,
       CASE WHEN pp.perplexity IS NULL THEN 'tail'
            WHEN pp.perplexity < {lo} THEN 'head'
            WHEN pp.perplexity < {hi} THEN 'middle'
            ELSE 'tail' END AS bucket
FROM documents d LEFT JOIN pp ON pp.doc_id = d.doc_id
ORDER BY d.doc_id"""
