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

Scale shape (the 100 TB posture):
- the edit-distance theta-join runs against the DISTINCT token
  vocabulary first (Zipf: vocab ≪ token occurrences — work ∝ vocab
  size), and the surviving (token, query_token) matches — a tiny set —
  are broadcast-equi-joined back to the exploded corpus tokens, so the
  per-occurrence hot path is a codegen hash join, not a per-occurrence
  levenshtein;
- both strategies conjoin a length-band prefilter
  (|len(tok) − len(qtok)| ≤ max_mistakes, a lower bound on edit
  distance) and a THRESHOLDED levenshtein (early-exit at
  max_mistakes+1), so even the vocab-sized theta-join skips the full
  O(n·m) DP for almost every pair.

Built-in F.levenshtein keeps the whole plan JVM-side; the reference's
100k-row refusal (:36-38) is unnecessary — this scales out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_text_search_spark.functions.hof import explode_keep as _explode_keep
from data_text_search_spark.functions.hof import once as _once
from data_text_search_spark.functions.text import tokenize_expr, tokenize_py


def _fuzzy_match_cond(left: Column, right: Column, max_mistakes: int) -> Column:
    """levenshtein(left, right) <= max_mistakes, cheaply: a length-band
    lower bound short-circuits ~95% of pairs before any DP, and the DP
    itself is thresholded (Spark's 3-arg levenshtein returns -1 and
    stops as soon as the distance provably exceeds the threshold)."""
    band = F.abs(F.length(left) - F.length(right)) <= max_mistakes
    return band & (F.levenshtein(left, right, max_mistakes) >= 0)


def fuzzy_phrase_search(spark: SparkSession, df: DataFrame, query: str,
                        max_mistakes: int = 1, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Z2 (spacy_search_funcs.py:58-92): whole-phrase fuzzy match — the
    reference PhraseMatcher(attr='LOWER') candidates filtered by
    Levenshtein.distance(query, span) <= max. Distributed as a sliding
    token window of the query's length, space-joined, levenshtein-filtered.
    Score semantics identical to Z3.

    Scale shape: window explode + whole-stage-codegen'd levenshtein
    filter + a hits-only aggregate (only MATCHED spans reach the
    shuffle — the filter sits below the groupBy, so the wide state is
    bounded by matches, not windows). Two round-6 restructures were
    measured SLOWER at sf1.0 and rejected: a map-only interpreted-HOF
    count (4.25 s) and a lambda-bound struct feeding the explode
    (5.9 s) vs 2.7 s for this shape — the multi-use non-cheap _toks
    alias already blocks CollapseProject from inlining the tokenize
    into the window lambda, so the explicit binding only cost."""
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
        _fuzzy_match_cond(F.col("span"), F.lit(qphrase), max_mistakes))
    return (
        matched.groupBy(id_col, "n_chars")
        .agg(F.count("*").alias("match_count"))
        .withColumn("score", F.col("match_count") / F.col("n_chars") * 100.0)
        .withColumn("score_abs", F.abs(F.round("score", 2)))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score_abs"), F.asc(id_col))
    )


def phrase_search(spark: SparkSession, df: DataFrame, query: str,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Exact phrase search: docs whose token sequence contains the
    query's token sequence VERBATIM, with the number of (overlapping)
    sliding-window occurrences — the m=0 specialization of Z2's window
    machinery (spacy_search_funcs.py:58-92), where the levenshtein
    verify collapses to array equality.

    Scale shape: one narrow map-only pass — tokenize ONCE per row (the
    _once lambda binding; the round-5 plan let PushDownPredicate inline
    the tokenize into the window lambda of a pushed filter, re-running
    the regex once per window position), then count window matches with
    a single JVM higher-order filter over the position range (no
    explode of windows; a doc contributes one row). The window match is
    element-wise with left-to-right short-circuit — most windows cost
    one element compare, never an array slice allocation. Zero shuffle,
    zero UDF; the orderBy is presentation only. For index-pruned
    candidates use IndexSearcher.phrase_search.

    Returns (id_col, phrase_count) with phrase_count >= 1, ordered
    count desc, id asc."""
    qtokens = tokenize_py(query)
    n = len(qtokens)
    if n == 0:
        return spark.createDataFrame([], f"{id_col} long, phrase_count long")

    def row_of(toks: Column) -> Column:
        def win(i: Column) -> Column:
            cond = None
            for j, qt in enumerate(qtokens):
                c = F.element_at(toks, i + j) == F.lit(qt)
                cond = c if cond is None else cond & c
            return cond

        hits = F.size(F.filter(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)), win))
        return (F.when(F.size(toks) >= n, hits)
                .otherwise(F.lit(0)).cast("long"))

    out = _explode_keep(df, [F.col(id_col)],
                        _once(tokenize_expr(text_col), row_of),
                        lambda c: c > 0)
    return (out.select(F.col(id_col), F.col("_r").alias("phrase_count"))
            .orderBy(F.desc("phrase_count"), F.asc(id_col)))


# auto-strategy gate: Catalyst's optimized-plan size estimate for the
# corpus below this → 'scan', above → 'vocab'. Measured A/B at sf0.1
# (50k docs, ~30 MB parquet, 5 interleaved passes, warm JVM, local[32]):
# scan 0.98 s median vs vocab 1.12 s — the vocab distinct-shuffle costs
# more than it saves when the whole corpus is this small, while at real
# corpus scale the Zipf vocab-compression (|vocab| ≪ occurrences)
# dominates. Unknown-size plans estimate huge → vocab (the safe side).
AUTO_SCAN_MAX_BYTES = 256 << 20


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate of the optimized plan — free (no
    job), file-size-based for file sources; a conservative huge default
    when unknown."""
    try:
        return int(str(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        return 1 << 62


def fuzzy_search(spark: SparkSession, df: DataFrame, query: str,
                 max_mistakes: int = 1, text_col: str = "text",
                 id_col: str = "doc_id",
                 max_rows: int | None = None,
                 strategy: str = "auto") -> DataFrame:
    """(doc_id, match_count, n_chars, score, score_abs) for docs with >0
    fuzzy token matches.

    `strategy`:
    - 'auto' (default): 'scan' for small corpora (Catalyst size estimate
      ≤ AUTO_SCAN_MAX_BYTES), 'vocab' above — the measured crossover
      (see AUTO_SCAN_MAX_BYTES). Both return identical rows, so the
      gate is pure cost.
    - 'vocab' (the scale path): edit distance runs over the
      DISTINCT token vocabulary only; matched tokens broadcast back as
      an equi-join. Work ∝ |vocab| · |query tokens| for the fuzzy part,
      ∝ occurrences for one codegen hash join. Identical results
      (tested + oracle-checked) — the match set per token is the same.
    - 'scan': the direct theta-join (every occurrence × query token) —
      the verification form, still length-band + threshold guarded.

    Against a persisted index, prefer IndexSearcher.fuzzy_search: the
    dictionary is already materialized and per-doc tf/n_chars come from
    the posting blocks — no corpus pass of any kind.

    `max_rows` (Z4, spacy_search_funcs.py:36-38): the reference refuses
    corpora over 100,000 rows because its per-row spaCy loop would take
    >30 min. The distributed form has no such wall (JVM levenshtein,
    ~38k rows/sec measured even pre-vocab-index), so the guard defaults
    to OFF; pass max_rows=100_000 for reference-identical refusal
    behavior."""
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
    if strategy == "auto":
        strategy = ("scan" if _plan_size_bytes(df) <= AUTO_SCAN_MAX_BYTES
                    else "vocab")
    if strategy == "vocab":
        # candidate index: levenshtein over distinct tokens (map-side
        # partial-agg distinct keeps the shuffle ∝ per-partition vocab),
        # then matched (tok, qtok) pairs — tiny — broadcast back. A doc
        # occurrence matching two query tokens still counts twice, as in
        # the scan form and the reference.
        # reference denominator: len(' '.join(tokens)) —
        # spacy_search_funcs.py:34,100-104
        toks = (df.withColumn("_toks", tokenize_expr(text_col))
                .select(F.col(id_col),
                        F.length(F.array_join("_toks", " ")).alias("n_chars"),
                        F.explode("_toks").alias("tok")))
        qdf = F.broadcast(spark.createDataFrame([(t,) for t in qtokens],
                                                "qtok string"))
        cond = _fuzzy_match_cond(F.col("tok"), F.col("qtok"), max_mistakes)
        vocab = toks.select("tok").distinct()
        matched_toks = F.broadcast(vocab.join(qdf, cond))
        matched = toks.join(matched_toks, "tok")
        return (
            matched.groupBy(id_col, "n_chars")
            .agg(F.count("*").alias("match_count"))
            .withColumn("score",
                        F.col("match_count") / F.col("n_chars") * 100.0)
            .withColumn("score_abs", F.abs(F.round("score", 2)))
            .filter(F.col("score") > 0)
            .orderBy(F.desc("score_abs"), F.asc(id_col))
        )

    # 'scan': map-only — per doc, one JVM HOF pass per query token counts
    # matching occurrences in place (thresholded levenshtein inside the
    # lambda; an occurrence matching two query tokens counts twice via
    # the sum, as in the vocab form and the reference). No token explode,
    # no join, no groupBy shuffle — the round-5 scan exploded every
    # occurrence into a corpus-sized theta-join + aggregate. Tokenize
    # runs once per row (_once lambda binding).
    def row_of(toks: Column) -> Column:
        cnt = None
        for qt in qtokens:
            c = F.size(F.filter(
                toks, lambda x: _fuzzy_match_cond(x, F.lit(qt),
                                                  max_mistakes)))
            cnt = c if cnt is None else cnt + c
        return F.struct(
            cnt.cast("long").alias("match_count"),
            F.length(F.array_join(toks, " ")).cast("int").alias("n_chars"))

    out = _explode_keep(df, [F.col(id_col)],
                        _once(tokenize_expr(text_col), row_of),
                        lambda r: r["match_count"] > 0)
    return (out.select(F.col(id_col),
                       F.col("_r.n_chars").alias("n_chars"),
                       F.col("_r.match_count").alias("match_count"))
            .withColumn("score",
                        F.col("match_count") / F.col("n_chars") * 100.0)
            .withColumn("score_abs", F.abs(F.round("score", 2)))
            .filter(F.col("score") > 0)
            .orderBy(F.desc("score_abs"), F.asc(id_col))
    )
