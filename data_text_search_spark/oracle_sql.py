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

TOKENIZE = "regexp_extract_all(lower(cast({col} as varchar)), '[a-z0-9_]+|[^a-z0-9_\\s]')"


def _values_for_query(query: str) -> str:
    counts = Counter(tokenize_py(query))
    rows = ", ".join(f"('{t}', {c})" for t, c in sorted(counts.items()))
    return rows


def _base_ctes(table: str = "documents", text_col: str = "text") -> str:
    tok = TOKENIZE.format(col=text_col)
    return f"""
docs AS (
  SELECT doc_id, {tok} AS toks FROM {table}
),
doc_stats AS (SELECT doc_id, len(toks) AS doc_len FROM docs),
corpus AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM doc_stats),
tok AS (SELECT doc_id, unnest(toks) AS term FROM docs),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
stats AS (
  SELECT term, count(*) AS df,
         ln((SELECT n FROM corpus) - count(*) + 0.5) - ln(count(*) + 0.5) AS idf
  FROM tf GROUP BY term
)"""


def doc_stats_sql() -> str:
    return f"""WITH {_base_ctes()}
SELECT doc_id, doc_len FROM doc_stats ORDER BY doc_id"""


def term_stats_sql(alpha: float) -> str:
    return f"""WITH {_base_ctes()}
SELECT term, df, round(idf, 6) AS idf FROM stats WHERE idf > {alpha} ORDER BY term"""


def term_tf_sql(min_tf: int = 3) -> str:
    # restrict to tf >= min_tf to keep the compared result compact
    return f"""WITH {_base_ctes()}
SELECT term, doc_id, tf FROM tf WHERE tf >= {min_tf} ORDER BY term, doc_id"""


def bm25_topk_sql(query: str, k: int = 10, k1: float = 1.5, b: float = 0.75,
                  alpha: float = -5.0) -> str:
    return f"""WITH {_base_ctes()},
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
  WHERE s.idf > {alpha}
)
SELECT doc_id, round(sum(c), 4) AS score,
       abs(round(sum(c), 2)) AS score_abs
FROM contrib GROUP BY doc_id
ORDER BY sum(c) DESC, doc_id ASC LIMIT {k}"""


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
