"""DuckDB ANSI-SQL oracles mirroring the engine's operators.

These strings are consumed by __spark_entry__.oracle_sql(); the driver
runs them in DuckDB against the same parquet tables and hash-compares
with the engine's DataFrames. The tokenizer fragment is byte-identical
in spec to data_text_search_spark.functions.text.TOKEN_PATTERN, and the
BM25 math mirrors the reference (bm25_functions.py:94,168-172).

Scores are rounded to 4 dp on BOTH sides: Spark and DuckDB sum floats
in different orders, so raw doubles can differ in the last ulp; at 4 dp
the comparison is deterministic (contributions are log-based, never
within 1e-12 of a rounding boundary).
"""

from __future__ import annotations

from collections import Counter

from data_text_search_spark.functions.text import tokenize_py

TOKENIZE = "regexp_extract_all(lower(cast({col} as varchar)), '[\\pL\\pN_]+|[^\\pL\\pN_ \t\n\r\f\x0b]')"


def _values_for_query(query: str) -> str:
    return _values_for_counts(Counter(tokenize_py(query)))


def _values_for_counts(counts) -> str:
    rows = ", ".join(f"('{t}', {c})" for t, c in sorted(counts.items()))
    return rows


def _clean_expr_sql(col: str) -> str:
    """The F1 clean chain as a DuckDB expression over a lowercased column."""
    expr = f"lower(cast({col} as varchar))"
    steps = [
        (r"\\", "/"),
        (r"<.*?>|&([a-z0-9]+|#[0-9]{1,6}|#x[0-9a-f]{1,6});|\xa0|&nbsp;", ""),
        (r".*importance:|.*subject:", ""),
        (r"kind regards.*|many thanks.*|sincerely.*", ""),
        (r"\S*@\S*\s?", ""),
        (r"\s{2,}", " "),
    ]
    for pat, rep in steps:
        expr = f"regexp_replace({expr}, '{pat.replace(chr(39), chr(39)*2)}', '{rep}', 'g')"
    return expr


def _base_ctes(table: str = "documents", text_col: str = "text",
               clean: bool = False) -> str:
    src = _clean_expr_sql(text_col) if clean else f"cast({text_col} as varchar)"
    tok = f"regexp_extract_all(lower({src}), '[\\pL\\pN_]+|[^\\pL\\pN_ \t\n\r\f\x0b]')"
    return f"""
docs AS (
  SELECT doc_id, {tok} AS toks FROM {table}
),
doc_stats AS (SELECT doc_id, len(toks) AS doc_len FROM docs),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM doc_stats),
tok AS (SELECT doc_id, unnest(toks) AS term FROM docs),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
stats AS (
  SELECT term, count(*) AS df, sum(tf) AS cf,
         ln((SELECT n FROM corpus) - count(*) + 0.5) - ln(count(*) + 0.5) AS idf
  FROM tf GROUP BY term
)"""


def doc_stats_sql() -> str:
    return f"""WITH {_base_ctes()}
SELECT doc_id, doc_len FROM doc_stats ORDER BY doc_id"""


def term_stats_sql(alpha: float) -> str:
    return f"""WITH {_base_ctes()}
SELECT term, df, round(idf, 6) AS idf FROM stats WHERE idf > {alpha} ORDER BY term"""


def term_vectors_sql(doc_id: int) -> str:
    """Twin of IndexSearcher.term_vectors (ES _termvectors): one doc's
    (term, tf, df, idf) including alpha-pruned terms, idf at 6 dp."""
    return f"""WITH {_base_ctes()}
SELECT tf.term, tf.tf, s.df, round(s.idf, 6) AS idf
FROM tf JOIN stats s USING (term)
WHERE tf.doc_id = {int(doc_id)}
ORDER BY tf.term"""


def term_tf_sql(min_tf: int = 3) -> str:
    # restrict to tf >= min_tf to keep the compared result compact
    return f"""WITH {_base_ctes()}
SELECT term, doc_id, tf FROM tf WHERE tf >= {min_tf} ORDER BY term, doc_id"""


def bm25_topk_sql(query: str, k: int = 10, k1: float = 1.5, b: float = 0.75,
                  alpha: float = -5.0, clean: bool = False,
                  doc_filter: str | None = None,
                  stopwords: tuple = ()) -> str:
    """`doc_filter`: optional predicate over `tf.doc_id` applied to the
    SCORED docs only — corpus statistics (N, avgdl, df/idf) stay computed
    over the FULL corpus. This is exactly delete_documents' stale-stats
    tombstone semantics: deleted docs vanish from results, surviving
    scores unchanged until a merge refreshes the stats.

    `stopwords`: scoring-time stop list (BM25Config.stopwords): the terms
    cannot score, doc_len/avgdl still count them — the flag-not-delete
    pruning semantics."""
    extra = f"\n    AND ({doc_filter})" if doc_filter else ""
    if stopwords:
        lst = ", ".join("'" + t.replace("'", "''") + "'"
                        for t in sorted(stopwords))
        extra += f"\n    AND s.term NOT IN ({lst})"
    return f"""WITH {_base_ctes(clean=clean)},
q(term, qcount) AS (VALUES {_values_for_query(query)}),
contrib AS (
  SELECT tf.doc_id,
         s.idf * tf.tf * ({k1} + 1)
           / (tf.tf + {k1} * (1 - {b} + {b} * ds.doc_len / (SELECT avgdl FROM corpus)))
           * q.qcount AS c
  FROM tf
  JOIN stats s USING (term)
  JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}{extra}
)
SELECT doc_id, round(sum(c), 4) AS score,
       abs(round(sum(c), 2)) AS score_abs
FROM contrib GROUP BY doc_id
ORDER BY sum(c) DESC, doc_id ASC LIMIT {k}"""


def bm25_expanded_sql(query: str, k: int = 10, fb_docs: int = 10,
                      fb_terms: int = 10, k1: float = 1.5, b: float = 0.75,
                      alpha: float = -5.0) -> str:
    """Pseudo-relevance-feedback twin of IndexSearcher.search_expanded:
    initial top-fb_docs (same tie-break), term tf·idf mass over the
    feedback set restricted to live (idf > alpha) terms, top-fb_terms
    (mass desc, term asc), each adding qcount 1 to the original counts,
    re-scored with the standard contribution."""
    contrib = (f"s.idf * tf.tf * ({k1} + 1) / (tf.tf + {k1} * (1 - {b} + "
               f"{b} * ds.doc_len / (SELECT avgdl FROM corpus)))")
    return f"""WITH {_base_ctes()},
q0(term, qcount) AS (VALUES {_values_for_query(query)}),
contrib0 AS (
  SELECT tf.doc_id, {contrib} * q0.qcount AS c
  FROM tf JOIN stats s USING (term) JOIN q0 USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
),
fb AS (
  SELECT doc_id FROM contrib0 GROUP BY doc_id
  ORDER BY sum(c) DESC, doc_id ASC LIMIT {fb_docs}
),
mass AS (
  SELECT tf.term FROM tf JOIN fb USING (doc_id) JOIN stats s USING (term)
  WHERE s.idf > {alpha}
  GROUP BY tf.term, s.idf
  ORDER BY sum(tf.tf) * s.idf DESC, tf.term ASC LIMIT {fb_terms}
),
q(term, qcount) AS (
  SELECT term, sum(qcount) FROM (
    SELECT term, qcount FROM q0
    UNION ALL SELECT term, 1 FROM mass
  ) GROUP BY term
),
contrib AS (
  SELECT tf.doc_id, {contrib} * q.qcount AS c
  FROM tf JOIN stats s USING (term) JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
)
SELECT doc_id, round(sum(c), 4) AS score,
       abs(round(sum(c), 2)) AS score_abs
FROM contrib GROUP BY doc_id
ORDER BY sum(c) DESC, doc_id ASC LIMIT {k}"""


def synonym_search_sql(query: str, synonyms: dict[str, list[str]],
                       k: int = 10, k1: float = 1.5, b: float = 0.75,
                       alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.search_synonyms: the query's token counts
    expanded with count-of-source occurrences per mapped synonym
    (Elasticsearch synonym-filter, expand=true), then the standard BM25
    contribution. The expansion itself is replayed here in Python —
    query and map are both constants — and synonyms absent from the
    corpus vanish in the `stats` join exactly as the engine's
    dictionary lookup drops them."""
    counts = Counter(tokenize_py(query))
    for t, c in list(counts.items()):
        for s in synonyms.get(t, ()):
            counts[s] += c
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_counts(counts)}),
contrib AS (
  SELECT tf.doc_id,
         s.idf * tf.tf * ({k1} + 1)
           / (tf.tf + {k1} * (1 - {b} + {b} * ds.doc_len / (SELECT avgdl FROM corpus)))
           * q.qcount AS c
  FROM tf
  JOIN stats s USING (term)
  JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
)
SELECT doc_id, round(sum(c), 4) AS score,
       abs(round(sum(c), 2)) AS score_abs
FROM contrib GROUP BY doc_id
ORDER BY sum(c) DESC, doc_id ASC LIMIT {k}"""


def msm_sql(query: str, m: int, k: int = 10, k1: float = 1.5,
            b: float = 0.75, alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.search_msm (minimum_should_match): docs
    matching at least m DISTINCT query terms (occurrence-based — no
    alpha filter on the matching side, mirroring the engine's
    pruned-terms-still-match contract), scored with the standard
    alpha-filtered BM25 contribution."""
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_query(query)}),
matched AS (
  SELECT tf.doc_id FROM tf JOIN q USING (term)
  GROUP BY tf.doc_id HAVING count(DISTINCT tf.term) >= {m}
),
contrib AS (
  SELECT tf.doc_id,
         s.idf * tf.tf * ({k1} + 1)
           / (tf.tf + {k1} * (1 - {b} + {b} * ds.doc_len / (SELECT avgdl FROM corpus)))
           * q.qcount AS c
  FROM tf
  JOIN matched USING (doc_id)
  JOIN stats s USING (term)
  JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
)
SELECT doc_id, round(sum(c), 4) AS score,
       abs(round(sum(c), 2)) AS score_abs
FROM contrib GROUP BY doc_id
ORDER BY sum(c) DESC, doc_id ASC LIMIT {k}"""


def query_string_sql(qs: str, k: int = 10, k1: float = 1.5,
                     b: float = 0.75, alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.query_string: the SAME compile
    (functions.qsyntax.compile_query_string — one parser, two
    backends) produces the scoring counts and the filter clauses; the
    filters become EXISTS/NOT-EXISTS membership predicates (terms via
    the tf CTE, phrases via a verbatim token-window list_filter) and
    the scoring is the standard alpha-filtered BM25 contribution."""
    from data_text_search_spark.functions.qsyntax import (
        compile_query_string,
    )
    counts, must, must_not, phrases, not_phrases, exps = \
        compile_query_string(qs)
    if not counts and not any(s != "-" for s, *_ in exps):
        return empty_sql({"doc_id": "bigint", "score": "double",
                          "score_abs": "double"})

    def term_pred(t: str, positive: bool) -> str:
        tq = t.replace("'", "''")
        ex = (f"EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = ds.doc_id "
              f"AND tf.term = '{tq}')")
        return ex if positive else f"NOT {ex}"

    # prefix/fuzzy expansion clauses: the oracle derives the expansion
    # ITSELF over the corpus vocabulary (starts_with / levenshtein on a
    # dict CTE) — independent of the engine's dictionary lookup, so a
    # wrong expansion cannot hide behind shared literals
    def exp_cond(col: str, kind: str, tok: str, arg) -> str:
        tq = tok.replace("'", "''")
        if kind == "prefix":
            return f"starts_with({col}, '{tq}')"
        return f"levenshtein({col}, '{tq}') <= {int(arg)}"

    def exp_pred(kind: str, tok: str, arg, positive: bool) -> str:
        ex = (f"EXISTS (SELECT 1 FROM tf WHERE tf.doc_id = ds.doc_id "
              f"AND {exp_cond('tf.term', kind, tok, arg)})")
        return ex if positive else f"NOT {ex}"

    q_arms = []
    exp_preds = []
    for sign, kind, tok, arg, boost in exps:
        if sign == "-":
            exp_preds.append(exp_pred(kind, tok, arg, False))
            continue
        qc = boost if boost != 1.0 else 1
        q_arms.append(f"SELECT term, {qc} AS qcount FROM qdict "
                      f"WHERE {exp_cond('term', kind, tok, arg)}")
        if sign == "+":
            exp_preds.append(exp_pred(kind, tok, arg, True))

    def phrase_pred(toks: list[str], positive: bool) -> str:
        m = len(toks)
        qlist = "[" + ", ".join(
            "'" + t.replace("'", "''") + "'" for t in toks) + "]"
        ex = (f"EXISTS (SELECT 1 FROM dtoks dt WHERE dt.doc_id = "
              f"ds.doc_id AND len(list_filter(generate_series(1, "
              f"len(dt.toks) - {m - 1}), i -> dt.toks[i:i+{m - 1}] = "
              f"{qlist})) > 0)")
        return ex if positive else f"NOT {ex}"

    preds = ([term_pred(t, True) for t in must]
             + [term_pred(t, False) for t in must_not]
             + [phrase_pred(p, True) for p in phrases]
             + [phrase_pred(p, False) for p in not_phrases]
             + exp_preds)
    where = ("\n  WHERE " + "\n    AND ".join(preds)) if preds else ""
    parts = []
    if counts:
        parts.append(f"SELECT * FROM (VALUES {_values_for_counts(counts)}"
                     f") AS v(term, qcount)")
    parts.extend(q_arms)
    q_cte = ("SELECT term, SUM(qcount) AS qcount FROM (\n  "
             + "\n  UNION ALL\n  ".join(parts) + "\n) GROUP BY term")
    return f"""WITH {_base_ctes()},
qdict AS (SELECT DISTINCT term FROM tf),
q AS ({q_cte}),
dtoks AS (SELECT doc_id, {TOKENIZE.format(col="text")} AS toks FROM documents),
cand AS (
  SELECT doc_id FROM doc_stats ds{where}
),
contrib AS (
  SELECT tf.doc_id,
         s.idf * tf.tf * ({k1} + 1)
           / (tf.tf + {k1} * (1 - {b} + {b} * ds.doc_len / (SELECT avgdl FROM corpus)))
           * q.qcount AS c
  FROM tf
  JOIN cand USING (doc_id)
  JOIN stats s USING (term)
  JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
)
SELECT doc_id, round(sum(c), 4) AS score,
       abs(round(sum(c), 2)) AS score_abs
FROM contrib GROUP BY doc_id
ORDER BY sum(c) DESC, doc_id ASC LIMIT {k}"""


def more_like_this_sql(seed_doc: int, k: int = 10, m_terms: int = 10,
                       k1: float = 1.5, b: float = 0.75,
                       alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.more_like_this: the seed doc's live terms
    ranked by tf*idf (mass desc, term asc), top m_terms as a count-1
    query, standard scoring, seed doc excluded."""
    contrib = (f"s.idf * tf.tf * ({k1} + 1) / (tf.tf + {k1} * (1 - {b} + "
               f"{b} * ds.doc_len / (SELECT avgdl FROM corpus)))")
    return f"""WITH {_base_ctes()},
seed AS (
  SELECT tf.term FROM tf JOIN stats s USING (term)
  WHERE tf.doc_id = {seed_doc} AND s.idf > {alpha}
  ORDER BY tf.tf * s.idf DESC, tf.term ASC LIMIT {m_terms}
),
contrib AS (
  SELECT tf.doc_id, {contrib} AS c
  FROM tf JOIN stats s USING (term) JOIN seed USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha} AND tf.doc_id != {seed_doc}
)
SELECT doc_id, round(sum(c), 4) AS score,
       abs(round(sum(c), 2)) AS score_abs
FROM contrib GROUP BY doc_id
ORDER BY sum(c) DESC, doc_id ASC LIMIT {k}"""


def search_facets_sql(query: str, facet_col: str = "lang",
                      k1: float = 1.5, b: float = 0.75,
                      alpha: float = -5.0) -> str:
    """Twin of search_analytics.search_facets: per-facet matching-doc
    count + best BM25 score over the FULL match set (docs containing
    >= 1 live query term)."""
    contrib = (f"s.idf * tf.tf * ({k1} + 1) / (tf.tf + {k1} * (1 - {b} + "
               f"{b} * ds.doc_len / (SELECT avgdl FROM corpus)))"
               f" * q.qcount")
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_query(query)}),
doc_scores AS (
  SELECT tf.doc_id, sum({contrib}) AS score
  FROM tf JOIN stats s USING (term) JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
  GROUP BY tf.doc_id
)
SELECT d.{facet_col} AS facet, count(*) AS n_docs,
       round(max(ds.score), 4) AS top_score
FROM doc_scores ds JOIN documents d USING (doc_id)
GROUP BY d.{facet_col}
ORDER BY n_docs DESC, facet ASC"""


def search_collapse_sql(query: str, collapse_col: str, n: int = 10,
                        k1: float = 1.5, b: float = 0.75,
                        alpha: float = -5.0) -> str:
    """Twin of search_analytics.search_collapse (ES field collapsing):
    full match-set scores, best doc per collapse key on the rounded
    deterministic order (round(score,4) desc, doc_id asc), global
    top-n of the representatives on the same order."""
    contrib = (f"s.idf * tf.tf * ({k1} + 1) / (tf.tf + {k1} * (1 - {b} + "
               f"{b} * ds.doc_len / (SELECT avgdl FROM corpus)))"
               f" * q.qcount")
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_query(query)}),
doc_scores AS (
  SELECT tf.doc_id, sum({contrib}) AS raw
  FROM tf JOIN stats s USING (term) JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
  GROUP BY tf.doc_id
),
keyed AS (
  SELECT sc.doc_id, round(sc.raw, 4) AS score_r, sc.raw,
         d.{collapse_col} AS ckey
  FROM doc_scores sc JOIN documents d USING (doc_id)
),
best AS (
  SELECT *, row_number() OVER (
    PARTITION BY ckey ORDER BY score_r DESC, doc_id ASC) AS rn
  FROM keyed
)
SELECT doc_id, ckey AS {collapse_col}, score_r AS score,
       row_number() OVER (ORDER BY score_r DESC, doc_id ASC)::int AS rank,
       abs(round(raw, 2)) AS score_abs
FROM best WHERE rn = 1
QUALIFY rank <= {n}
ORDER BY rank"""


def facet_ranges_sql(query: str, range_col: str,
                     boundaries: list[float], k1: float = 1.5,
                     b: float = 0.75, alpha: float = -5.0) -> str:
    """Twin of search_analytics.facet_ranges: ES range aggregation —
    boundaries [b1..bm] make m+1 buckets over `range_col`, per-bucket
    matching-doc count + best score, empty buckets kept with count 0
    and NULL score."""
    bs = list(boundaries)

    def label(i: int) -> str:
        lo = "*" if i == 0 else f"{bs[i - 1]:g}"
        hi = "*" if i == len(bs) else f"{bs[i]:g}"
        return f"{lo}-{hi}"

    case = "CASE "
    for i, bd in enumerate(bs):
        case += f"WHEN cast(d.{range_col} AS double) < {float(bd)} THEN {i} "
    case += f"ELSE {len(bs)} END"
    bucket_rows = ", ".join(f"({i}, '{label(i)}')"
                            for i in range(len(bs) + 1))
    contrib = (f"s.idf * tf.tf * ({k1} + 1) / (tf.tf + {k1} * (1 - {b} + "
               f"{b} * ds.doc_len / (SELECT avgdl FROM corpus)))"
               f" * q.qcount")
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_query(query)}),
doc_scores AS (
  SELECT tf.doc_id, sum({contrib}) AS score
  FROM tf JOIN stats s USING (term) JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
  GROUP BY tf.doc_id
),
buckets(bucket_idx, bucket) AS (VALUES {bucket_rows}),
agg AS (
  SELECT {case} AS bucket_idx, count(*) AS n_docs,
         round(max(sc.score), 4) AS top_score
  FROM doc_scores sc JOIN documents d USING (doc_id)
  GROUP BY 1
)
SELECT b.bucket_idx::int AS bucket_idx, b.bucket,
       coalesce(a.n_docs, 0)::bigint AS n_docs, a.top_score
FROM buckets b LEFT JOIN agg a USING (bucket_idx)
ORDER BY b.bucket_idx"""


def significant_terms_sql(query: str, n: int = 20, min_fg_df: int = 2,
                          alpha: float = -5.0) -> str:
    """Twin of search_analytics.significant_terms: lift of each live
    non-query term in the match set vs the corpus, top-n by exact lift
    (rounded only for display)."""
    counts = Counter(tokenize_py(query))
    qlist = ", ".join(f"'{t}'" for t in sorted(counts)) or "''"
    return f"""WITH {_base_ctes()},
q(term) AS (VALUES {', '.join(f"('{t}')" for t in sorted(counts))}),
fg_docs AS (
  SELECT DISTINCT tf.doc_id
  FROM tf JOIN stats s USING (term) JOIN q USING (term)
  WHERE s.idf > {alpha}
),
fg_n AS (SELECT count(*) AS n FROM fg_docs),
fg AS (
  SELECT tf.term, count(*) AS fg_df
  FROM tf JOIN fg_docs USING (doc_id)
  GROUP BY tf.term
),
lifted AS (
  SELECT fg.term, fg.fg_df, s.df AS bg_df,
         (fg.fg_df / (SELECT n FROM fg_n))
           / (s.df / (SELECT n FROM corpus)) AS lift
  FROM fg JOIN stats s ON fg.term = s.term
  WHERE s.idf > {alpha} AND fg.fg_df >= {min_fg_df}
    AND fg.term NOT IN ({qlist})
  ORDER BY lift DESC, fg.term ASC LIMIT {n}
)
SELECT term, fg_df, bg_df, round(lift, 4) AS lift FROM lifted
ORDER BY lift DESC, term ASC"""


def fielded_search_sql(query: str, fields: dict[str, float], k: int = 10,
                       k1: float = 1.5, b: float = 0.75,
                       alpha: float = -5.0) -> str:
    """Twin of search_analytics.fielded_search: per-field BM25 corpora
    (own tokenize/doc_len/avgdl/df/idf per field), weighted per-field
    sums fused by one grouped sum per doc."""
    blocks, selects = [], []
    for i, (col, w) in enumerate(sorted(fields.items())):
        p = f"f{i}"
        tok = ("regexp_extract_all(lower(cast(" + col + " as varchar)), "
               "'[\\pL\\pN_]+|[^\\pL\\pN_ \t\n\r\f\x0b]')")
        blocks.append(f"""
{p}_docs AS (SELECT doc_id, {tok} AS toks FROM documents),
{p}_ds AS (SELECT doc_id, len(toks) AS doc_len FROM {p}_docs),
{p}_corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM {p}_ds),
{p}_tf AS (
  SELECT term, doc_id, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM {p}_docs)
  GROUP BY term, doc_id
),
{p}_stats AS (
  SELECT term,
         ln((SELECT n FROM {p}_corpus) - count(*) + 0.5)
           - ln(count(*) + 0.5) AS idf
  FROM {p}_tf GROUP BY term
),
{p}_scores AS (
  SELECT tf.doc_id,
         {float(w)} * sum(
           s.idf * tf.tf * ({k1} + 1)
             / (tf.tf + {k1} * (1 - {b} + {b} * ds.doc_len
                / (SELECT avgdl FROM {p}_corpus)))
           * q.qcount) AS s
  FROM {p}_tf tf
  JOIN {p}_stats s USING (term)
  JOIN q USING (term)
  JOIN {p}_ds ds USING (doc_id)
  WHERE s.idf > {alpha}
  GROUP BY tf.doc_id
)""")
        selects.append(f"SELECT doc_id, s FROM {p}_scores")
    return f"""WITH
q(term, qcount) AS (VALUES {_values_for_query(query)}),{','.join(blocks)}
SELECT doc_id, round(sum(s), 4) AS score,
       abs(round(sum(s), 2)) AS score_abs
FROM ({' UNION ALL '.join(selects)})
GROUP BY doc_id
ORDER BY sum(s) DESC, doc_id ASC LIMIT {k}"""


def ranking_metrics_sql(queries: list[str], k: int = 10,
                        k1: float = 1.5, b: float = 0.75,
                        alpha: float = -5.0, rel_mod: int = 7,
                        hi_mod: int = 21) -> str:
    """Twin of evaluation.ranking_metrics over the engine's batch top-k
    (ranks on the deterministic (round(score,4) desc, doc_id asc)
    order) against arithmetic qrels: every doc_id % rel_mod == 0 is
    relevant (grade 1), % hi_mod == 0 highly so (grade 2)."""
    qids = ", ".join(f"({i})" for i in range(len(queries)))
    return f"""WITH raw AS (
{bm25_batch_sql(queries, k=k, k1=k1, b=b, alpha=alpha)}
),
results AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM raw
),
qrels AS (
  SELECT q.query_id, d.doc_id,
         CASE WHEN d.doc_id % {hi_mod} = 0 THEN 2.0 ELSE 1.0 END AS grade
  FROM (VALUES {qids}) q(query_id), documents d
  WHERE d.doc_id % {rel_mod} = 0
),
hits AS (
  SELECT r.query_id, r.rank, qr.grade
  FROM results r JOIN qrels qr USING (query_id, doc_id)
  WHERE r.rank <= {k}
),
perq AS (
  SELECT query_id, sum(grade / log2(rank + 1.0)) AS dcg,
         min(CASE WHEN grade > 0 THEN rank END) AS first_rel,
         count(CASE WHEN grade > 0 THEN 1 END) AS rel_ret
  FROM hits GROUP BY query_id
),
ideal AS (
  SELECT query_id, sum(grade / log2(pos + 1.0)) AS idcg
  FROM (SELECT query_id, grade,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY grade DESC, doc_id ASC) AS pos
        FROM qrels)
  WHERE pos <= {k} GROUP BY query_id
),
tot AS (
  SELECT query_id, count(*) AS n_rel FROM qrels WHERE grade > 0
  GROUP BY query_id
)
SELECT i.query_id,
       round(CASE WHEN idcg > 0 THEN coalesce(dcg, 0) / idcg
             ELSE 0 END, 4) AS ndcg,
       round(coalesce(1.0 / first_rel, 0), 4) AS mrr,
       round(CASE WHEN n_rel > 0
             THEN coalesce(rel_ret, 0) * 1.0 / n_rel
             ELSE 0 END, 4) AS recall
FROM ideal i LEFT JOIN tot USING (query_id) LEFT JOIN perq USING (query_id)
ORDER BY query_id"""


def bm25_page_sql(query: str, k: int = 10, offset: int = 0,
                  k1: float = 1.5, b: float = 0.75,
                  alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.search_after: the pagination ordering is
    (round(score,4) DESC, doc_id ASC) — a deterministic total order —
    so cursor paging in the engine equals OFFSET paging here."""
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_query(query)}),
contrib AS (
  SELECT tf.doc_id,
         s.idf * tf.tf * ({k1} + 1)
           / (tf.tf + {k1} * (1 - {b} + {b} * ds.doc_len / (SELECT avgdl FROM corpus)))
           * q.qcount AS c
  FROM tf JOIN stats s USING (term) JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
),
scores AS (
  SELECT doc_id, round(sum(c), 4) AS score FROM contrib GROUP BY doc_id
)
SELECT doc_id, score, abs(round(score, 2)) AS score_abs
FROM scores
ORDER BY score DESC, doc_id ASC LIMIT {k} OFFSET {offset}"""


def percolate_sql(queries: list[str]) -> str:
    """Twin of search_analytics.percolate: (doc_id, query_id) pairs where
    the doc contains EVERY distinct token of the query."""
    rows = []
    for qid, q in enumerate(queries):
        terms = sorted(set(tokenize_py(q)))
        for t in terms:
            rows.append(f"({qid}, '{t.replace(chr(39), chr(39)*2)}', "
                        f"{len(terms)})")
    vals = ", ".join(rows) or "(0, '', 0)"
    return f"""WITH {_base_ctes()},
qt(query_id, term, n_terms) AS (VALUES {vals}),
dt AS (SELECT DISTINCT doc_id, term FROM tf)
SELECT doc_id, query_id
FROM dt JOIN qt USING (term)
GROUP BY doc_id, query_id, n_terms
HAVING count(*) = n_terms
ORDER BY doc_id ASC, query_id ASC"""


def match_count_sql(query: str, alpha: float = -5.0) -> str:
    """Twin of search_analytics.match_count: matching-doc count (>=1
    live query term), no ranking."""
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_query(query)})
SELECT count(DISTINCT tf.doc_id) AS n_matching
FROM tf JOIN stats s USING (term) JOIN q USING (term)
WHERE s.idf > {alpha}"""


def suggest_sql(token: str, n: int = 5, max_edits: int = 2) -> str:
    """Twin of IndexSearcher.suggest: dictionary terms (ALL terms —
    pruned ones too, so no alpha filter) within max_edits, ranked
    distance asc, df desc, term asc."""
    toks = tokenize_py(token)
    q = (toks[0] if toks else "").replace("'", "''")
    return f"""WITH {_base_ctes()},
dict AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT term, CAST(levenshtein(term, '{q}') AS INTEGER) AS distance,
       df
FROM dict
WHERE levenshtein(term, '{q}') <= {max_edits}
ORDER BY distance ASC, df DESC, term ASC LIMIT {n}"""


def bm25_batch_sql(queries: list[str], k: int = 10, k1: float = 1.5,
                   b: float = 0.75, alpha: float = -5.0) -> str:
    """Batch oracle: UNION ALL of per-query top-k, tagged with query_id
    (positional, matching IndexSearcher.search_batch)."""
    parts = [
        f"SELECT {i} AS query_id, * FROM ({bm25_topk_sql(q, k=k, k1=k1, b=b, alpha=alpha)})"
        for i, q in enumerate(queries)
    ]
    return "\nUNION ALL\n".join(parts)


_TOK_DOCS = ("SELECT doc_id, " + TOKENIZE.format(col="text")
             + " AS toks FROM documents")

_SW = {
    "en": "['the','and','of','to','in','is','for','on','with','as']",
    "es": "['el','la','de','que','y','en','un','por','con','para']",
    "de": "['der','die','und','das','nicht','von','mit','ist','auf','ein']",
    "fr": "['le','la','et','les','des','une','est','pour','dans','que']",
}


def token_count_sql() -> str:
    from data_text_search_spark.operators.textstats import BPE_PATTERN
    tok = TOKENIZE.format(col="text")
    return f"""SELECT doc_id,
  len({tok}) AS n_tokens,
  len(regexp_split_to_array(trim(cast(text as varchar)), '\\s+')) AS n_words,
  len(regexp_extract_all(lower(cast(text as varchar)), '{BPE_PATTERN}')) AS n_bpe_tokens,
  length(cast(text as varchar)) AS n_chars
FROM documents ORDER BY doc_id"""


def lang_id_sql() -> str:
    ratios = ",\n  ".join(
        f"coalesce(len(list_intersect(toks, {arr}))"
        f" / nullif(len(toks), 0), 0) AS r_{lang}"
        for lang, arr in _SW.items())
    return f"""WITH docs AS ({_TOK_DOCS}),
d AS (SELECT doc_id, list_distinct(toks) AS toks FROM docs),
r AS (SELECT doc_id,
  {ratios}
FROM d)
SELECT doc_id,
  CASE WHEN r_en >= r_es AND r_en >= r_de AND r_en >= r_fr THEN 'en'
       WHEN r_es >= r_de AND r_es >= r_fr THEN 'es'
       WHEN r_de >= r_fr THEN 'de' ELSE 'fr' END AS lang_pred,
  round(greatest(r_en, r_es, r_de, r_fr), 6) AS lang_score
FROM r ORDER BY doc_id"""


def quality_sql() -> str:
    return f"""WITH docs AS ({_TOK_DOCS})
SELECT doc_id,
  len(toks) AS n_tokens,
  coalesce(round(len(list_filter(toks, x -> regexp_matches(x, '^[^\\pL\\pN_]$')))
    / nullif(cast(len(toks) AS double), 0), 6), 0.0) AS punct_ratio,
  coalesce(round(len(list_filter(toks, x -> list_contains({_SW['en']}, x)))
    / nullif(cast(len(toks) AS double), 0), 6), 0.0) AS stop_ratio,
  coalesce(round(list_sum(list_transform(toks, x -> length(x)))
    / nullif(cast(len(toks) AS double), 0), 6), 0.0) AS mean_token_len
FROM docs ORDER BY doc_id"""


_NORM_TEXT = ("trim(regexp_replace(lower(cast(text as varchar)), "
              "'\\s+', ' ', 'g'))")


def fingerprint_sql() -> str:
    return (f"SELECT doc_id, sha256({_NORM_TEXT}) AS fp "
            "FROM documents ORDER BY doc_id")


def exact_dedup_sql() -> str:
    return f"""WITH f AS (
  SELECT doc_id, sha256({_NORM_TEXT}) AS fp FROM documents)
SELECT doc_id,
  min(doc_id) OVER (PARTITION BY fp) AS canonical_doc_id,
  count(*) OVER (PARTITION BY fp) AS group_size
FROM f ORDER BY doc_id"""


def ngram_jaccard_sql(n: int = 3, threshold: float = 0.5) -> str:
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    # join/count key = substr(md5(shingle),1,16), matching the Spark side
    # exactly (dedup.ngram_jaccard_pairs): md5 is byte-identical across
    # both engines, so even a 64-bit prefix collision affects both alike
    return f"""WITH docs AS ({_TOK_DOCS}),
raw AS (
  SELECT DISTINCT doc_id,
    unnest(list_transform(range(1, len(toks) - {n - 2}),
                          i -> {parts})) AS s
  FROM docs WHERE len(toks) >= {n}),
sh AS (SELECT DISTINCT doc_id, substr(md5(s), 1, 16) AS shingle FROM raw),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
  round(i / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(i / (sa.sz + sb.sz - i), 6) >= {threshold}
ORDER BY doc_a, doc_b"""


def empty_sql(cols: dict[str, str]) -> str:
    """Typed empty result — the oracle for CERTIFICATE queries: the
    engine computes a set difference that must be empty (approximate
    pairs minus their exact counterpart, ANN hits whose score disagrees
    with the exact cosine, two independent band decompositions
    disagreeing). A non-empty engine result fails rows/hash-match, so
    the driver's gate now covers the approximate operators too (recall
    distributions stay asserted in pytest — recall is hash-family
    dependent and has no SQL form)."""
    sel = ", ".join(f"CAST(NULL AS {t}) AS {c}" for c, t in cols.items())
    return f"SELECT {sel} WHERE 1 = 0"


def cosine_topk_int8_sql(query_vec_id: int = 0, k: int = 20,
                         scale: float = 127.0) -> str:
    """int8-storage scoring oracle: quantize→dequantize→cosine in DuckDB
    with the exact same arithmetic as semantic.quantize_int8/
    dequantize_int8 (round-half-away-from-zero to tinyint, /scale, cast
    to REAL i.e. fp32, widen to double for the cosine). Proves the
    storage cast is QUERY-correct, not just schema-correct."""
    deq = (f"list_transform(embedding, x -> cast(cast("
           f"cast(round(cast(x as double) * {scale}) as tinyint)"
           f" / {scale} as real) as double))")
    return f"""WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {query_vec_id}),
s AS (SELECT vec_id, {deq} AS emb FROM embeddings)
SELECT s.vec_id,
  round(list_cosine_similarity(s.emb, q.qv), 6) AS score
FROM s, q
ORDER BY list_cosine_similarity(s.emb, q.qv) DESC, s.vec_id
LIMIT {k}"""


def cosine_topk_sql(query_vec_id: int = 0, k: int = 20) -> str:
    return f"""WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {query_vec_id})
SELECT e.vec_id,
  round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
FROM embeddings e, q
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id
LIMIT {k}"""


def hash_split_sql(fractions: dict[str, float], salt: str = "") -> str:
    """Deterministic split-assignment twin: the identical
    md5-hex-prefix range expression over documents — lowercase-hex
    lexicographic comparison equals numeric comparison, and
    md5(varchar) agrees byte-for-byte between Spark and DuckDB."""
    span = 16 ** 8
    names = list(fractions)
    cum, cases = 0.0, []
    for name in names[:-1]:
        cum += fractions[name]
        bound = format(min(int(cum * span), span - 1), "08x")
        cases.append(f"WHEN b < '{bound}' THEN '{name}'")
    case = ("CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
            if cases else f"'{names[-1]}'")
    return f"""WITH h AS (
  SELECT doc_id,
         substring(md5(cast(doc_id AS varchar) || 'split|{salt}'), 1, 8) AS b
  FROM documents)
SELECT doc_id, {case} AS split FROM h ORDER BY doc_id"""


def hybrid_search_sql(query: str, query_vec_id: int = 0, n_lists: int = 50,
                      k: int = 20, k0: int = 60, alpha: float = -5.0) -> str:
    """RRF fusion oracle: ranks each top-n_lists shortlist on its
    ROUNDED score (4dp BM25 / 6dp cosine) with the id tie-break — the
    same total order the engine ranks on — then sums 1/(k0+rank)."""
    bm = bm25_topk_sql(query, k=n_lists, alpha=alpha)
    sem = cosine_topk_sql(query_vec_id=query_vec_id, k=n_lists)
    return f"""WITH bm AS ({bm}),
bmr AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM bm),
sem AS ({sem}),
semr AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY score DESC, vec_id) AS rank
  FROM sem),
u AS (
  SELECT doc_id, 1.0 / ({k0} + rank) AS c FROM bmr
  UNION ALL
  SELECT doc_id, 1.0 / ({k0} + rank) AS c FROM semr)
SELECT doc_id, round(sum(c), 6) AS rrf_score,
       cast(count(*) AS int) AS n_lists
FROM u GROUP BY doc_id
ORDER BY rrf_score DESC, doc_id LIMIT {k}"""


def dup_clusters_sql(threshold: float = 0.4) -> str:
    """Connected components over the exact cosine near-dup pair graph
    (same edge rule as cosine_dup_pairs_sql), as a recursive transitive
    closure: cluster_id = smallest vec_id reachable. Viable at oracle
    scale only — the engine's label propagation never materializes the
    closure."""
    sim = ("list_cosine_similarity(a.embedding::DOUBLE[], "
           "b.embedding::DOUBLE[])")
    return f"""WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE round({sim}, 6) >= {threshold}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
SELECT src AS vec_id, least(src, min(dst)) AS cluster_id
FROM reach GROUP BY src ORDER BY vec_id"""


def knn_join_sql(max_qid: int = 32, k: int = 5) -> str:
    """Exact batch top-k oracle for knn_join: every embedding with
    vec_id < max_qid queries the whole table (self excluded), k nearest
    by raw cosine with (score desc, vec_id asc) tie order — the same
    selection rule the Spark kernel applies before display rounding."""
    sim = "list_cosine_similarity(e.embedding::DOUBLE[], q.qv)"
    return f"""WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {max_qid}),
ranked AS (
  SELECT q.qid, e.vec_id, {sim} AS raw,
         row_number() OVER (PARTITION BY q.qid
                            ORDER BY {sim} DESC, e.vec_id) AS rn
  FROM q JOIN embeddings e ON e.vec_id <> q.qid)
SELECT qid, vec_id, round(raw, 6) AS score
FROM ranked WHERE rn <= {k}
ORDER BY qid, raw DESC, vec_id"""


def cosine_dup_pairs_sql(threshold: float = 0.4) -> str:
    sim = ("list_cosine_similarity(a.embedding::DOUBLE[], "
           "b.embedding::DOUBLE[])")
    return f"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round({sim}, 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round({sim}, 6) >= {threshold}
ORDER BY id_a, id_b"""


def semantic_search_sql(query_vec_id: int = 0, cutoff: float = 0.2,
                        k: int = 9999) -> str:
    return f"""WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {query_vec_id})
SELECT e.vec_id,
  round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 3) AS score
FROM embeddings e, q
WHERE list_cosine_similarity(e.embedding::DOUBLE[], q.qv) > {cutoff}
ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id
LIMIT {k}"""


def fuzzy_search_sql(query: str, max_mistakes: int = 1) -> str:
    from data_text_search_spark.functions.text import tokenize_py
    qtokens = sorted(set(tokenize_py(query)))
    values = ", ".join(f"('{t}')" for t in qtokens)
    tok = TOKENIZE.format(col="text")
    return f"""WITH docs AS (
  SELECT doc_id, {tok} AS toks FROM documents),
toks AS (
  SELECT doc_id, length(array_to_string(toks, ' ')) AS n_chars,
         unnest(toks) AS tok
  FROM docs),
q(qtok) AS (VALUES {values}),
m AS (
  SELECT doc_id, n_chars, count(*) AS match_count
  FROM toks JOIN q ON levenshtein(tok, qtok) <= {max_mistakes}
  GROUP BY doc_id, n_chars)
SELECT doc_id, match_count, n_chars,
  round(match_count / n_chars * 100, 4) AS score,
  abs(round(match_count / n_chars * 100, 2)) AS score_abs
FROM m WHERE match_count / n_chars * 100 > 0
ORDER BY doc_id"""


def bm25_full_pipeline_sql(query: str, k: int = 10, k1: float = 1.5,
                           b: float = 0.75, alpha: float = -5.0) -> str:
    """The reference's end-to-end keyword flow (§3.2): BM25 top-k →
    re-attach original columns (J1) → search_text = ' '.join(tokens) (F6)
    → abs(round(score,2)) (F7)."""
    topk = bm25_topk_sql(query, k=k, k1=k1, b=b, alpha=alpha)
    tok = TOKENIZE.format(col="d.text")
    return f"""WITH topk AS ({topk})
SELECT t.doc_id,
  array_to_string({tok}, ' ') AS search_text,
  t.score_abs AS search_score_abs,
  d.lang, d.source
FROM topk t LEFT JOIN documents d ON d.doc_id = t.doc_id
ORDER BY search_score_abs DESC, search_text DESC"""


def tfidf_topk_sql(query: str, k: int = 10, alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.search_similarity(model='tfidf') — Lucene
    ClassicSimilarity shape: Σ qtf·sqrt(tf)·(1+ln((N+1)/(df+1)))²/sqrt(dl).
    Alpha-pruned terms are excluded: the persisted index has no postings
    for them, so NO similarity can see them (Lucene: a term absent from
    the index cannot score)."""
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_query(query)}),
contrib AS (
  SELECT tf.doc_id,
         q.qcount * sqrt(tf.tf)
           * pow(1 + ln(((SELECT n FROM corpus) + 1.0) / (s.df + 1.0)), 2)
           / sqrt(ds.doc_len) AS c
  FROM tf
  JOIN stats s USING (term)
  JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
)
SELECT doc_id, round(sum(c), 4) AS score,
       abs(round(sum(c), 2)) AS score_abs
FROM contrib GROUP BY doc_id
ORDER BY sum(c) DESC, doc_id ASC LIMIT {k}"""


def lmjm_topk_sql(query: str, k: int = 10, lam: float = 0.1,
                  alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.search_similarity(model='lmjm') — language
    model with Jelinek-Mercer smoothing (Zhai & Lafferty 2001), matched
    terms only: Σ qtf·ln(1 + ((1−λ)/λ)·(tf/dl)/(cf/T)). The coefficient
    is inlined from the same Python float the engine computes, and T is
    the corpus token count (engine: avgdl·N from the manifest — equal to
    within one ulp, far under the 4-dp rounding)."""
    coef = repr((1.0 - lam) / lam)
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_query(query)}),
total AS (SELECT sum(doc_len)::double AS t FROM doc_stats),
contrib AS (
  SELECT tf.doc_id,
         q.qcount * ln(1 + {coef} * (tf.tf / ds.doc_len::double)
                             / (s.cf / (SELECT t FROM total))) AS c
  FROM tf
  JOIN stats s USING (term)
  JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
)
SELECT doc_id, round(sum(c), 4) AS score,
       abs(round(sum(c), 2)) AS score_abs
FROM contrib GROUP BY doc_id
ORDER BY sum(c) DESC, doc_id ASC LIMIT {k}"""


def lmdir_topk_sql(query: str, k: int = 10, mu: float = 2000.0,
                   alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.search_similarity(model='lmdir') — Lucene
    LMDirichletSimilarity, matched terms only with the per-term clamp
    at 0: Σ qtf·greatest(0, ln(1 + tf/(μ·cf/T)) + ln(μ/(dl+μ)))."""
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_query(query)}),
total AS (SELECT sum(doc_len)::double AS t FROM doc_stats),
contrib AS (
  SELECT tf.doc_id,
         q.qcount * greatest(
           ln(1 + tf.tf / ({mu} * s.cf / (SELECT t FROM total)))
             + ln({mu} / (ds.doc_len + {mu})), 0) AS c
  FROM tf
  JOIN stats s USING (term)
  JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
)
SELECT doc_id, round(sum(c), 4) AS score,
       abs(round(sum(c), 2)) AS score_abs
FROM contrib GROUP BY doc_id
ORDER BY sum(c) DESC, doc_id ASC LIMIT {k}"""


def bm25plus_topk_sql(query: str, k: int = 10, k1: float = 1.5,
                      b: float = 0.75, delta: float = 1.0,
                      alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.search_similarity(model='bm25plus') — BM25+
    (Lv & Zhai 2011): Σ qtf·ln((N+1)/df)·(tf(k1+1)/(tf+K) + δ)."""
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_query(query)}),
contrib AS (
  SELECT tf.doc_id,
         q.qcount * ln(((SELECT n FROM corpus) + 1.0) / s.df)
           * (tf.tf * ({k1} + 1)
                / (tf.tf + {k1} * (1 - {b} + {b} * ds.doc_len
                                   / (SELECT avgdl FROM corpus)))
              + {delta}) AS c
  FROM tf
  JOIN stats s USING (term)
  JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
)
SELECT doc_id, round(sum(c), 4) AS score,
       abs(round(sum(c), 2)) AS score_abs
FROM contrib GROUP BY doc_id
ORDER BY sum(c) DESC, doc_id ASC LIMIT {k}"""


def _match_set_cte(query: str, alpha: float = -5.0) -> str:
    """Docs containing >=1 LIVE (idf > alpha) query term — the match set
    the index sees (pruned terms have no postings)."""
    return f"""
q(term, qcount) AS (VALUES {_values_for_query(query)}),
matched AS (
  SELECT DISTINCT tf.doc_id
  FROM tf JOIN stats s USING (term) JOIN q USING (term)
  WHERE s.idf > {alpha}
)"""


def stats_agg_sql(query: str, alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.stats_agg: ES stats aggregation (count/min/
    max/avg/sum of n_chars) over the match set."""
    return f"""WITH {_base_ctes()},{_match_set_cte(query, alpha)}
SELECT count(*)::bigint AS n_matched,
       min(d.n_chars)::bigint AS min_n_chars,
       max(d.n_chars)::bigint AS max_n_chars,
       round(avg(d.n_chars), 4) AS avg_n_chars,
       sum(d.n_chars)::bigint AS sum_n_chars
FROM documents d JOIN matched USING (doc_id)"""


def sort_by_field_sql(query: str, k: int = 10,
                      alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.sort_by_field: the match set ordered by a
    doc-values column (n_chars desc, doc_id asc), top-k, no scoring."""
    return f"""WITH {_base_ctes()},{_match_set_cte(query, alpha)}
SELECT doc_id, d.n_chars::bigint AS n_chars
FROM documents d JOIN matched USING (doc_id)
ORDER BY d.n_chars DESC, doc_id ASC LIMIT {k}"""


def function_score_sql(query: str, k: int = 10, k1: float = 1.5,
                       b: float = 0.75, alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.function_score: field_value_factor —
    final = bm25 · ln(1 + n_chars) over the FULL match set (the modifier
    reorders beyond any top-k window), then top-k by the modified
    score."""
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_query(query)}),
contrib AS (
  SELECT tf.doc_id,
         s.idf * tf.tf * ({k1} + 1)
           / (tf.tf + {k1} * (1 - {b} + {b} * ds.doc_len / (SELECT avgdl FROM corpus)))
           * q.qcount AS c
  FROM tf JOIN stats s USING (term) JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
),
scored AS (
  SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id
)
SELECT doc_id, round(score, 4) AS score,
       round(score * ln(1 + d.n_chars), 4) AS fscore,
       row_number() OVER (ORDER BY score * ln(1 + d.n_chars) DESC,
                          doc_id ASC)::int AS rank
FROM scored JOIN documents d USING (doc_id)
ORDER BY 4 LIMIT {k}"""


def rescore_sql(query: str, phrase: str, window: int = 50,
                weight: float = 2.0, k: int = 10, k1: float = 1.5,
                b: float = 0.75, alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.rescore: top-`window` BM25 hits re-ranked by
    final = bm25 + weight · (exact occurrences of `phrase`); docs outside
    the window never re-enter (ES rescore window semantics)."""
    ptokens = tokenize_py(phrase)
    m = len(ptokens)
    plist = "[" + ", ".join(
        "'" + t.replace("'", "''") + "'" for t in ptokens) + "]"
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_query(query)}),
contrib AS (
  SELECT tf.doc_id,
         s.idf * tf.tf * ({k1} + 1)
           / (tf.tf + {k1} * (1 - {b} + {b} * ds.doc_len / (SELECT avgdl FROM corpus)))
           * q.qcount AS c
  FROM tf JOIN stats s USING (term) JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
),
win AS (
  SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id
  ORDER BY sum(c) DESC, doc_id ASC LIMIT {window}
),
pc AS (
  SELECT docs.doc_id,
         len(list_filter(generate_series(1, len(toks) - {m - 1}),
                         i -> toks[i:i+{m - 1}] = {plist}))::bigint AS n
  FROM docs JOIN win USING (doc_id) WHERE len(toks) >= {m}
)
SELECT w.doc_id, round(w.score, 4) AS score,
       coalesce(pc.n, 0)::bigint AS phrase_count,
       round(w.score + {weight} * coalesce(pc.n, 0), 4) AS rescore,
       row_number() OVER (ORDER BY w.score + {weight} * coalesce(pc.n, 0) DESC,
                          w.doc_id ASC)::int AS rank
FROM win w LEFT JOIN pc ON w.doc_id = pc.doc_id
ORDER BY 5 LIMIT {k}"""


def highlight_sql(query: str, k: int = 10, frag: int = 30,
                  k1: float = 1.5, b: float = 0.75,
                  alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.highlight: top-k BM25, plus the first
    occurrence position of any query term in lower(text) and the fixed
    2·frag-char window around it (ES plain-highlighter shape, substring
    semantics)."""
    terms = sorted(set(tokenize_py(query)))
    pos_terms = ", ".join(
        "nullif(strpos(lower(d.text), '"
        + t.replace("'", "''") + "'), 0)" for t in terms)
    pos = f"least({pos_terms})" if len(terms) > 1 else pos_terms
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_query(query)}),
contrib AS (
  SELECT tf.doc_id,
         s.idf * tf.tf * ({k1} + 1)
           / (tf.tf + {k1} * (1 - {b} + {b} * ds.doc_len / (SELECT avgdl FROM corpus)))
           * q.qcount AS c
  FROM tf JOIN stats s USING (term) JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
),
topk AS (
  SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id
  ORDER BY sum(c) DESC, doc_id ASC LIMIT {k}
)
SELECT t.doc_id, round(t.score, 4) AS score,
       ({pos})::int AS pos,
       substring(lower(d.text), greatest(1, ({pos}) - {frag}),
                 {2 * frag}) AS snippet
FROM topk t JOIN documents d USING (doc_id)
ORDER BY t.score DESC, t.doc_id ASC"""


def phrase_search_sql(query: str) -> str:
    """Exact phrase occurrences: the identical tokenizer fragment, then
    one lateral position unnest with a list-slice equality — overlapping
    windows counted, same as the engine's sliding-window HOF."""
    qtokens = tokenize_py(query)
    m = len(qtokens)
    qlist = "[" + ", ".join(
        "'" + t.replace("'", "''") + "'" for t in qtokens) + "]"
    return f"""
WITH docs AS (SELECT doc_id, {TOKENIZE.format(col="text")} AS toks FROM documents),
pos AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, len(toks) - {m - 1})) AS i
  FROM docs WHERE len(toks) >= {m}
)
SELECT doc_id, count(*)::bigint AS phrase_count
FROM pos WHERE toks[i:i+{m - 1}] = {qlist}
GROUP BY doc_id
ORDER BY phrase_count DESC, doc_id ASC"""


def percentiles_agg_sql(query: str, alpha: float = -5.0,
                        probs: tuple = (0.25, 0.5, 0.75, 0.9, 0.99)) -> str:
    """Twin of IndexSearcher.percentiles_agg: linearly interpolated
    percentiles (quantile_cont — the same (n−1)·p definition as Spark's
    exact `percentile`) of n_chars over the match set."""
    cols = ", ".join(
        f"round(quantile_cont(d.n_chars, {p}), 4) AS p{round(p * 100)}"
        for p in probs)
    return f"""WITH {_base_ctes()},{_match_set_cte(query, alpha)}
SELECT {cols}
FROM documents d JOIN matched USING (doc_id)"""


def complete_sql(prefix: str, k: int = 5, alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.complete: top-k LIVE dictionary terms with
    the prefix, df desc, term asc."""
    esc = prefix.replace("'", "''").replace("%", "\\%").replace("_", "\\_")
    return f"""WITH {_base_ctes()}
SELECT term, df FROM stats
WHERE idf > {alpha} AND term LIKE '{esc}%' ESCAPE '\\'
ORDER BY df DESC, term ASC LIMIT {k}"""


def date_histogram_sql(interval: str = "day", by: str = "event_type",
                       value_col: str = "value") -> str:
    """Twin of search_analytics.date_histogram over the events table."""
    return f"""
SELECT strftime(date_trunc('{interval}', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
       {by},
       count(*)::bigint AS n,
       round(sum({value_col}), 4) AS sum_{value_col}
FROM events
GROUP BY 1, 2 ORDER BY 1, 2"""


def top_hits_sql(query: str, bucket_col: str, per_bucket: int = 3,
                 k1: float = 1.5, b: float = 0.75,
                 alpha: float = -5.0) -> str:
    """Twin of search_analytics.top_hits (ES top_hits sub-agg): full
    match-set scores, top-per_bucket docs per bucket on the rounded
    deterministic order."""
    contrib = (f"s.idf * tf.tf * ({k1} + 1) / (tf.tf + {k1} * (1 - {b} + "
               f"{b} * ds.doc_len / (SELECT avgdl FROM corpus)))"
               f" * q.qcount")
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_query(query)}),
doc_scores AS (
  SELECT tf.doc_id, sum({contrib}) AS raw
  FROM tf JOIN stats s USING (term) JOIN q USING (term)
  JOIN doc_stats ds USING (doc_id)
  WHERE s.idf > {alpha}
  GROUP BY tf.doc_id
),
keyed AS (
  SELECT sc.doc_id, round(sc.raw, 4) AS score_r, d.{bucket_col} AS bkey
  FROM doc_scores sc JOIN documents d USING (doc_id)
)
SELECT bkey AS {bucket_col}, doc_id, score_r AS score,
       bucket_rank::int AS bucket_rank
FROM (SELECT *, row_number() OVER (
        PARTITION BY bkey ORDER BY score_r DESC, doc_id ASC
      ) AS bucket_rank FROM keyed)
WHERE bucket_rank <= {per_bucket}
ORDER BY bkey ASC, bucket_rank ASC"""


def histogram_moving_avg_sql(interval: str = "day",
                             by: str = "event_type",
                             window: int = 3) -> str:
    """Twin of search_analytics.histogram_moving_avg (ES moving_avg
    pipeline agg): trailing window-bucket average per series."""
    return f"""
WITH hist AS (
  SELECT strftime(date_trunc('{interval}', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
         {by}, count(*)::bigint AS n
  FROM events GROUP BY 1, 2
)
SELECT bucket, {by}, n,
       round(avg(n) OVER (PARTITION BY {by} ORDER BY bucket
                          ROWS BETWEEN {window - 1} PRECEDING
                          AND CURRENT ROW), 4) AS moving_avg
FROM hist ORDER BY bucket, {by}"""


def sample_matches_sql(query: str, n: int = 10, seed: str = "0",
                       alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.sample_matches: the deterministic
    md5-ordered sample of the match set (md5 hex is identical across
    Spark and DuckDB)."""
    esc = seed.replace("'", "''")
    return f"""WITH {_base_ctes()},{_match_set_cte(query, alpha)}
SELECT doc_id, md5(doc_id::varchar || ':{esc}') AS sample_key
FROM matched
ORDER BY sample_key ASC, doc_id ASC LIMIT {n}"""


def adjacency_matrix_sql(terms: dict) -> str:
    """Twin of IndexSearcher.adjacency_matrix: distinct-doc counts per
    named term filter and pairwise intersections."""
    names = sorted(terms)

    def docs_of(t: str) -> str:
        esc = t.replace("'", "''")
        return f"(SELECT DISTINCT doc_id FROM tf WHERE term = '{esc}')"

    parts = []
    for i, a in enumerate(names):
        parts.append(f"SELECT '{a}' AS key, count(*)::bigint AS n "
                     f"FROM {docs_of(terms[a])}")
        for b in names[i + 1:]:
            parts.append(
                f"SELECT '{a}&{b}' AS key, count(*)::bigint AS n FROM "
                f"(SELECT doc_id FROM {docs_of(terms[a])} INTERSECT "
                f"SELECT doc_id FROM {docs_of(terms[b])})")
    union = "\nUNION ALL\n".join(parts)
    return f"""WITH {_base_ctes()}
SELECT * FROM ({union}) ORDER BY key"""


def score_explain_sql(query: str, doc_id: int, k1: float = 1.5,
                      b: float = 0.75, alpha: float = -5.0) -> str:
    """Twin of IndexSearcher.score_explain (ES _explain): the additive
    per-term decomposition of one doc's BM25 score."""
    return f"""WITH {_base_ctes()},
q(term, qcount) AS (VALUES {_values_for_query(query)})
SELECT tf.term, tf.tf::bigint AS tf, s.df::bigint AS df,
       round(s.idf, 6) AS idf,
       round(s.idf * tf.tf * ({k1} + 1)
             / (tf.tf + {k1} * (1 - {b} + {b} * ds.doc_len
                                / (SELECT avgdl FROM corpus)))
             * q.qcount, 4) AS contribution
FROM tf JOIN stats s USING (term) JOIN q USING (term)
JOIN doc_stats ds USING (doc_id)
WHERE tf.doc_id = {int(doc_id)} AND s.idf > {alpha}
ORDER BY tf.term ASC"""


def span_near_sql(term1: str, term2: str, slop: int) -> str:
    """Twin of positions.span_near: unordered two-term proximity — min
    token distance (1-based positions) between any occurrence pair per
    doc, kept when <= slop."""
    t1 = term1.replace("'", "''")
    t2 = term2.replace("'", "''")
    return f"""
WITH docs AS (SELECT doc_id, {TOKENIZE.format(col="text")} AS toks FROM documents),
p AS (
  SELECT doc_id,
         [i for i in generate_series(1, len(toks)) if toks[i] = '{t1}'] AS p1,
         [i for i in generate_series(1, len(toks)) if toks[i] = '{t2}'] AS p2
  FROM docs
),
pairs AS (
  SELECT doc_id, abs(a - b) AS d
  FROM p, unnest(p1) AS u1(a), unnest(p2) AS u2(b)
)
SELECT doc_id, min(d)::bigint AS min_dist FROM pairs GROUP BY doc_id
HAVING min(d) <= {int(slop)} ORDER BY min_dist ASC, doc_id ASC"""


def span_window_sql(terms: list, width: int) -> str:
    """Twin of positions.span_window: smallest token window containing
    every term = min over occurrence tuples of (greatest − least),
    kept when < width."""
    cols, joins = [], []
    for i, t in enumerate(terms):
        esc = t.replace("'", "''")
        cols.append(f"[i for i in generate_series(1, len(toks)) "
                    f"if toks[i] = '{esc}'] AS p{i}")
        joins.append(f"unnest(p{i}) AS u{i}(a{i})")
    vs = ", ".join(f"a{i}" for i in range(len(terms)))
    return f"""
WITH docs AS (SELECT doc_id, {TOKENIZE.format(col="text")} AS toks FROM documents),
p AS (SELECT doc_id, {", ".join(cols)} FROM docs),
spans AS (
  SELECT doc_id, greatest({vs}) - least({vs}) AS s
  FROM p, {", ".join(joins)}
)
SELECT doc_id, min(s)::bigint AS min_span FROM spans GROUP BY doc_id
HAVING min(s) < {int(width)} ORDER BY min_span ASC, doc_id ASC"""


def phrase_suggest_sql(text: str, n: int = 3, max_edits: int = 2,
                       max_candidates: int = 5,
                       backoff: float = 0.4) -> str:
    """Twin of IndexSearcher.phrase_suggest: per-token candidates =
    top-max_candidates dictionary terms by (levenshtein asc, df desc,
    term asc) UNION the original token; sequences scored by the same
    stupid-backoff bigram LM with LEFT-ASSOCIATED double products in
    the engine's factor order, so scores hash-match bit-for-bit."""
    toks = tokenize_py(text)
    if not toks:
        return empty_sql({"suggestion": "VARCHAR", "score": "DOUBLE"})
    m = len(toks)
    cand_ctes = []
    for i, t in enumerate(toks):
        esc = t.replace("'", "''")
        cand_ctes.append(f"""
cand{i} AS (
  SELECT term FROM (
    SELECT term FROM dict WHERE levenshtein(term, '{esc}') <= {int(max_edits)}
    ORDER BY levenshtein(term, '{esc}') ASC, df DESC, term ASC
    LIMIT {int(max_candidates)})
  UNION SELECT '{esc}')""")
    seq_cols = ", ".join(f"c{i}.term AS w{i}" for i in range(m))
    seq_from = ", ".join(f"cand{i} c{i}" for i in range(m))
    joins = ["CROSS JOIN tcount tt",
             "LEFT JOIN uni u0 ON u0.term = seq.w0"]
    factors = ["(CAST(COALESCE(u0.cf, 0) AS DOUBLE) / CAST(tt.t AS DOUBLE))"]
    for i in range(1, m):
        joins.append(f"LEFT JOIN uni u{i} ON u{i}.term = seq.w{i}")
        joins.append(f"LEFT JOIN big b{i} ON b{i}.a = seq.w{i - 1} "
                     f"AND b{i}.b = seq.w{i}")
        factors.append(
            f"(CASE WHEN COALESCE(b{i}.c, 0) > 0 "
            f"THEN CAST(b{i}.c AS DOUBLE) / CAST(u{i - 1}.cf AS DOUBLE) "
            f"ELSE {float(backoff)!r} * (CAST(COALESCE(u{i}.cf, 0) AS DOUBLE)"
            f" / CAST(tt.t AS DOUBLE)) END)")
    sugg = " || ' ' || ".join(f"seq.w{i}" for i in range(m))
    score = " * ".join(factors)
    return f"""
WITH docs AS (SELECT doc_id, {TOKENIZE.format(col="text")} AS toks FROM documents),
pos AS (SELECT doc_id, unnest(toks) AS term,
               unnest(generate_series(1, len(toks))) AS ord FROM docs),
uni AS (SELECT term, count(*) AS cf FROM pos GROUP BY term),
tcount AS (SELECT count(*) AS t FROM pos),
big AS (SELECT p1.term AS a, p2.term AS b, count(*) AS c
        FROM pos p1 JOIN pos p2
          ON p1.doc_id = p2.doc_id AND p2.ord = p1.ord + 1
        GROUP BY 1, 2),
dict AS (SELECT term, count(DISTINCT doc_id) AS df FROM pos GROUP BY term),
{", ".join(cand_ctes)},
seq AS (SELECT {seq_cols} FROM {seq_from})
SELECT {sugg} AS suggestion, {score} AS score
FROM seq {" ".join(joins)}
ORDER BY score DESC, suggestion ASC LIMIT {int(n)}"""


def phrase_prefix_sql(phrase: str, max_expansions: int = 50,
                      alpha: float = -5.0) -> str:
    """Twin of positions.phrase_prefix_count (ES match_phrase_prefix):
    the last token expands to the top-max_expansions LIVE dictionary
    terms by df (term asc tie-break — Lucene's expansion order), the
    fixed tokens match verbatim at the preceding offsets."""
    qtokens = tokenize_py(phrase)
    m = len(qtokens)
    prefix = qtokens[-1].replace("'", "''") \
        .replace("%", "\\%").replace("_", "\\_")
    fixed = qtokens[:-1]
    flist = "[" + ", ".join(
        "'" + t.replace("'", "''") + "'" for t in fixed) + "]"
    fixed_cond = (f"toks[i:i+{m - 2}] = {flist} AND " if fixed else "")
    return f"""WITH {_base_ctes()},
exps AS (
  SELECT term FROM stats WHERE idf > {alpha}
    AND term LIKE '{prefix}%' ESCAPE '\\'
  ORDER BY df DESC, term ASC LIMIT {int(max_expansions)}
),
pos AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, len(toks) - {m - 1})) AS i
  FROM docs WHERE len(toks) >= {m}
)
SELECT doc_id, count(*)::bigint AS phrase_count
FROM pos
WHERE {fixed_cond}toks[i+{m - 1}] IN (SELECT term FROM exps)
GROUP BY doc_id
ORDER BY phrase_count DESC, doc_id ASC"""


def prefix_search_sql(prefix: str) -> str:
    """Per-doc occurrences of tokens starting with `prefix` — the
    brute-force twin of IndexSearcher.prefix_search (which answers from
    the term dictionary + tf varints without touching the corpus)."""
    esc = prefix.replace("'", "''").replace("%", "\\%").replace("_", "\\_")
    return f"""
WITH docs AS (SELECT doc_id, {TOKENIZE.format(col="text")} AS toks FROM documents)
SELECT doc_id,
       len(list_filter(toks, t -> t LIKE '{esc}%' ESCAPE '\\'))::bigint
         AS match_count
FROM docs
WHERE len(list_filter(toks, t -> t LIKE '{esc}%' ESCAPE '\\')) > 0
ORDER BY match_count DESC, doc_id ASC"""


def regex_search_sql(pattern: str) -> str:
    """Per-doc occurrences of tokens fully matching `pattern` — the
    brute-force twin of IndexSearcher.regex_search (term-dictionary
    filter + tf varints, no corpus scan). Keep contract patterns in the
    Java/RE2-common regex subset."""
    esc = pattern.replace("'", "''")
    return f"""
WITH docs AS (SELECT doc_id, {TOKENIZE.format(col="text")} AS toks FROM documents)
SELECT doc_id,
       len(list_filter(toks, t -> regexp_full_match(t, '{esc}')))::bigint
         AS match_count
FROM docs
WHERE len(list_filter(toks, t -> regexp_full_match(t, '{esc}'))) > 0
ORDER BY match_count DESC, doc_id ASC"""


def fuzzy_phrase_sql(query: str, max_mistakes: int = 1) -> str:
    from data_text_search_spark.functions.text import tokenize_py
    qtokens = tokenize_py(query)
    n = len(qtokens)
    qphrase = " ".join(qtokens).replace("'", "''")
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    tok = TOKENIZE.format(col="text")
    return f"""WITH docs AS (
  SELECT doc_id, length(array_to_string({tok}, ' ')) AS n_chars,
         {tok} AS toks
  FROM documents),
spans AS (
  SELECT doc_id, n_chars,
    unnest(list_transform(range(1, len(toks) - {n - 2}), i -> {parts})) AS span
  FROM docs WHERE len(toks) >= {n}),
m AS (
  SELECT doc_id, n_chars, count(*) AS match_count
  FROM spans WHERE levenshtein(span, '{qphrase}') <= {max_mistakes}
  GROUP BY doc_id, n_chars)
SELECT doc_id, match_count, n_chars,
  round(match_count / n_chars * 100, 4) AS score,
  abs(round(match_count / n_chars * 100, 2)) AS score_abs
FROM m WHERE match_count / n_chars * 100 > 0
ORDER BY doc_id"""


def chunk_docs_sql(chunk_size: int = 64, overlap: int = 16) -> str:
    """Token-window chunking twin (operators/curation.chunk_documents):
    identical tokenizer fragment, identical window arithmetic. DuckDB
    list slices are 1-based inclusive like Spark's slice(start, length)
    window [i*stride+1, i*stride+chunk_size]; array_to_string on an
    empty slice is NULL in DuckDB where Spark array_join gives '' —
    coalesced."""
    stride = chunk_size - overlap
    sl = f"toks[chunk_id*{stride}+1 : chunk_id*{stride}+{chunk_size}]"
    return f"""WITH docs AS ({_TOK_DOCS}),
planned AS (SELECT doc_id, toks,
  CASE WHEN len(toks) <= {chunk_size} THEN 1
       ELSE CAST(ceil((len(toks) - {chunk_size})
                      / CAST({stride} AS DOUBLE)) AS BIGINT) + 1
  END AS n_chunks FROM docs),
ex AS (SELECT doc_id, toks, unnest(range(n_chunks)) AS chunk_id
       FROM planned)
SELECT doc_id, chunk_id,
  coalesce(array_to_string({sl}, ' '), '') AS chunk_text,
  len({sl}) AS n_chunk_tokens
FROM ex ORDER BY doc_id, chunk_id"""


def scrub_text_sql() -> str:
    """PII/noise scrub twin (operators/curation.scrub_text): the exact
    SCRUB_STEPS pattern strings (spelled to mean the same in Java regex
    and RE2 — no \\b, no lookaround, explicit ASCII classes), applied in
    the same order, each step counting on the text as the chain sees
    it."""
    from data_text_search_spark.operators.curation import SCRUB_STEPS
    ctes = ["s0 AS (SELECT doc_id, cast(text AS varchar) AS t FROM documents)"]
    prev = "s0"
    names = []
    for i, (name, pat, repl) in enumerate(SCRUB_STEPS, start=1):
        pat_sql = pat.replace("'", "''")
        names.append(f"n_{name}")
        carried = ", ".join(names[:-1])
        carried = (carried + ", ") if carried else ""
        ctes.append(
            f"s{i} AS (SELECT doc_id, {carried}"
            f"len(regexp_extract_all(t, '{pat_sql}')) AS n_{name}, "
            f"regexp_replace(t, '{pat_sql}', '{repl}', 'g') AS t "
            f"FROM {prev})")
        prev = f"s{i}"
    cols = ", ".join(names)
    return (f"WITH {', '.join(ctes)}\n"
            f"SELECT doc_id, t AS scrubbed, {cols} "
            f"FROM {prev} ORDER BY doc_id")


def code_quality_sql() -> str:
    """code_quality twin (operators/curation.code_quality): identical
    line split (chr(10), trailing empties kept — matches Spark
    split(limit=-1)), identical ASCII character classes, identical
    integer keep arithmetic. DuckDB length() counts characters like
    Spark length (strlen would count bytes — wrong on unicode)."""
    from data_text_search_spark.operators.curation import (
        AVG_LINE_LEN, MAX_LINE_LEN, MIN_ALPHA_X4)
    return f"""WITH s AS (
  SELECT doc_id, cast(text AS varchar) AS t FROM documents),
l AS (
  SELECT doc_id, t, string_split(t, chr(10)) AS ls FROM s),
m AS (
  SELECT doc_id,
    cast(len(ls) AS bigint) AS n_lines,
    cast(list_aggregate(list_transform(ls, x -> length(x)), 'max')
         AS bigint) AS max_line_len,
    cast(coalesce(list_aggregate(list_transform(ls, x -> length(x)),
                                 'sum'), 0) AS bigint) AS sum_line_len,
    cast(length(t) AS bigint) AS n_chars,
    cast(length(regexp_replace(t, '[^A-Za-z0-9]', '', 'g'))
         AS bigint) AS n_alnum,
    cast(length(regexp_replace(t, '[^A-Za-z]', '', 'g'))
         AS bigint) AS n_alpha
  FROM l)
SELECT doc_id, n_lines, max_line_len, sum_line_len, n_chars, n_alnum,
  n_alpha,
  (n_chars > 0 AND 4 * n_alpha >= {MIN_ALPHA_X4} * n_chars
   AND max_line_len <= {MAX_LINE_LEN}
   AND sum_line_len <= {AVG_LINE_LEN} * n_lines) AS keep
FROM m ORDER BY doc_id"""


def repetition_stats_sql() -> str:
    """repetition_stats twin (operators/curation.repetition_stats):
    identical line split + tokenizer fragment; dup_line_chars = total
    line chars minus chars over list_distinct(lines); top bigram by
    ROW_NUMBER over (count DESC, gram ASC) — the same deterministic
    tie-break as the Spark window."""
    return f"""WITH docs AS (
  SELECT doc_id, cast(text AS varchar) AS t,
    {TOKENIZE.format(col='text')} AS toks
  FROM documents),
l AS (
  SELECT doc_id, toks, string_split(t, chr(10)) AS ls FROM docs),
base AS (
  SELECT doc_id, toks,
    cast(len(ls) AS bigint) AS n_lines,
    cast(coalesce(list_aggregate(list_transform(ls, x -> length(x)),
                                 'sum'), 0) AS bigint) AS line_chars,
    cast(coalesce(list_aggregate(
        list_transform(list_distinct(ls), x -> length(x)), 'sum'), 0)
      AS bigint) AS distinct_chars,
    cast(greatest(len(toks) - 1, 0) AS bigint) AS n_grams
  FROM l),
g AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(toks)),
                          i -> toks[i] || ' ' || toks[i+1])) AS gram
  FROM base WHERE n_grams > 0),
cnt AS (
  SELECT doc_id, gram, count(*) AS top_gram_count FROM g GROUP BY 1, 2),
top AS (
  SELECT doc_id, gram AS top_gram, top_gram_count,
    row_number() OVER (PARTITION BY doc_id
                       ORDER BY top_gram_count DESC, gram) AS rn
  FROM cnt)
SELECT b.doc_id, b.n_lines, b.line_chars,
  b.line_chars - b.distinct_chars AS dup_line_chars, b.n_grams,
  coalesce(t.top_gram, '') AS top_gram,
  cast(coalesce(t.top_gram_count, 0) AS bigint) AS top_gram_count
FROM base b LEFT JOIN (SELECT * FROM top WHERE rn = 1) t
  ON b.doc_id = t.doc_id
ORDER BY b.doc_id"""


def duplicate_spans_sql(span: int = 8) -> str:
    """duplicate_spans twin (operators/curation.duplicate_spans):
    identical tokenizer fragment, identical 64-bit md5-prefix span key
    over the space-joined span text, identical >= 2-distinct-docs
    duplication rule."""
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(span))
    return f"""WITH docs AS ({_TOK_DOCS}),
pos AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(toks) - {span - 2}),
                          i -> substr(md5({parts}), 1, 16))) AS h
  FROM docs WHERE len(toks) >= {span}),
dh AS (
  SELECT h FROM (
    SELECT h, count(DISTINCT doc_id) AS nd FROM pos GROUP BY h)
  WHERE nd >= 2),
per_doc AS (
  SELECT doc_id, count(*) AS n_dup_spans FROM pos
  WHERE h IN (SELECT h FROM dh) GROUP BY doc_id),
totals AS (
  SELECT doc_id,
    cast(greatest(len(toks) - {span - 1}, 0) AS bigint) AS n_spans
  FROM docs)
SELECT t.doc_id, t.n_spans,
  cast(coalesce(p.n_dup_spans, 0) AS bigint) AS n_dup_spans
FROM totals t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
ORDER BY t.doc_id"""


def stratified_sample_sql(fractions: dict[str, float],
                          default_fraction: float = 0.0,
                          salt: str = "") -> str:
    """stratified_sample twin: identical md5-hex-prefix comparison under
    the 'strata|' domain, per-group thresholds via CASE."""
    span = 16 ** 8

    def thr(frac: float) -> str:
        return format(min(int(frac * span), span - 1), "08x")

    def keep(frac: float) -> str:
        if frac >= 1.0:
            return "TRUE"
        if frac <= 0.0:
            return "FALSE"
        return f"b < '{thr(frac)}'"

    cases = " ".join(
        f"WHEN lang = '{k}' THEN {keep(v)}" for k, v in fractions.items())
    return f"""WITH h AS (
  SELECT doc_id, lang,
         substring(md5(cast(doc_id AS varchar) || 'strata|{salt}'), 1, 8) AS b
  FROM documents)
SELECT doc_id, lang FROM h
WHERE CASE {cases} ELSE {keep(default_fraction)} END
ORDER BY doc_id"""


def unigram_rarity_sql() -> str:
    """unigram_rarity twin (operators/textstats.unigram_rarity):
    identical integer backbone (corpus unigram counts, per-doc sum of
    occurrence counts) and exactly one ln on the identical double
    quotient, rounded to 6dp."""
    return f"""WITH docs AS ({_TOK_DOCS}),
tok AS (SELECT doc_id, unnest(toks) AS tok FROM docs),
c AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
tt AS (SELECT cast(sum(c) AS DOUBLE) AS total FROM c),
per AS (SELECT doc_id, sum(c.c) AS s FROM tok JOIN c USING (tok)
        GROUP BY doc_id),
base AS (SELECT doc_id, cast(len(toks) AS BIGINT) AS n_tokens FROM docs)
SELECT b.doc_id, b.n_tokens,
  cast(coalesce(p.s, 0) AS BIGINT) AS sum_tf,
  CASE WHEN b.n_tokens > 0 THEN
    round(-ln(cast(coalesce(p.s, 0) AS DOUBLE)
              / (cast(b.n_tokens AS DOUBLE) * tt.total)), 6)
  ELSE 0.0 END AS rarity
FROM base b LEFT JOIN per p USING (doc_id), tt
ORDER BY b.doc_id"""


def remove_dup_spans_sql(span: int = 8) -> str:
    """remove_duplicate_spans twin (operators/curation): identical span
    keys and min-doc_id canonical-owner rule, spelled relationally —
    token j of a doc is removed iff covered by a flagged start (a
    duplicated span this doc does not own); kept tokens re-joined with
    spaces in position order."""
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(span))
    return f"""WITH docs AS ({_TOK_DOCS}),
posi AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) - {span - 2})) AS i
  FROM docs WHERE len(toks) >= {span}),
pos AS (
  SELECT doc_id, i, substr(md5({parts}), 1, 16) AS h FROM posi),
own AS (
  SELECT h, min(doc_id) AS owner FROM pos
  GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
fl AS (
  SELECT p.doc_id, p.i FROM pos p JOIN own o USING (h)
  WHERE p.doc_id <> o.owner),
toki AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM docs),
tok AS (
  SELECT doc_id, i, toks[i] AS tok FROM toki),
keep AS (
  SELECT t.doc_id, t.i, t.tok FROM tok t
  WHERE NOT EXISTS (
    SELECT 1 FROM fl f
    WHERE f.doc_id = t.doc_id AND t.i BETWEEN f.i AND f.i + {span - 1})),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text_clean,
         count(*) AS kept_n
  FROM keep GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.text_clean, '') AS text_clean,
  cast(len(d.toks) AS bigint) AS n_tokens,
  cast(len(d.toks) - coalesce(a.kept_n, 0) AS bigint) AS n_tokens_removed
FROM docs d LEFT JOIN agg a USING (doc_id)
ORDER BY d.doc_id"""


def contamination_sql(span: int = 13, eval_mod: int = 37) -> str:
    """contamination_stats twin (operators/curation.contamination_stats):
    eval set = documents with doc_id % eval_mod == 0, identical
    tokenizer fragment and 64-bit md5-prefix span key on both sides,
    per-position semi-join counting."""
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(span))
    spans = (f"unnest(list_transform(range(1, len(toks) - {span - 2}), "
             f"i -> substr(md5({parts}), 1, 16)))")
    return f"""WITH docs AS ({_TOK_DOCS}),
ev AS (
  SELECT DISTINCT h FROM (
    SELECT {spans} AS h
    FROM docs WHERE doc_id % {eval_mod} = 0 AND len(toks) >= {span})),
pos AS (
  SELECT doc_id, {spans} AS h
  FROM docs WHERE len(toks) >= {span}),
per_doc AS (
  SELECT doc_id, count(*) AS n_overlap_spans FROM pos
  WHERE h IN (SELECT h FROM ev) GROUP BY doc_id),
totals AS (
  SELECT doc_id,
    cast(greatest(len(toks) - {span - 1}, 0) AS bigint) AS n_spans
  FROM docs)
SELECT t.doc_id, t.n_spans,
  cast(coalesce(p.n_overlap_spans, 0) AS bigint) AS n_overlap_spans
FROM totals t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
ORDER BY t.doc_id"""


def clean_sql() -> str:
    """F1 clean pipeline on lowercased text, regexes in reference order.

    DuckDB regexp_replace needs the 'g' flag for replace-all semantics
    (the engine/polars/Spark replace-all is the default there).
    """
    expr = "lower(cast(text as varchar))"
    steps = [
        (r"\\", "/"),
        (r"<.*?>|&([a-z0-9]+|#[0-9]{1,6}|#x[0-9a-f]{1,6});|\xa0|&nbsp;", ""),
        (r".*importance:|.*subject:", ""),
        (r"kind regards.*|many thanks.*|sincerely.*", ""),
        (r"\S*@\S*\s?", ""),
        (r"\s{2,}", " "),
    ]
    for pat, rep in steps:
        # duckdb standard strings pass backslashes through verbatim, so the
        # python regex string is the SQL literal as-is (only quotes escape)
        pat_sql = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{rep}', 'g')"
    return f"SELECT doc_id, {expr} AS cleaned FROM documents ORDER BY doc_id"
