"""Search-analytics operators over the logical index: facet counts and
significant terms — the Lucene/Elasticsearch aggregations a search UI
runs NEXT TO the hit list (the reference exposes only the hit list; these
are the standard companions, reference app.py:150-210 renders per-result
metadata that a facet pass would aggregate).

Both operators are pure declarative DataFrame pipelines over the same
LogicalIndex tables the exhaustive scorer uses (bm25_exhaustive.py), so
Catalyst keeps them whole-stage-codegen'd and the only wide exchanges are
the vocab- or facet-bounded aggregates:

- MATCH SET semantics: a document matches iff it contains >= 1 live
  (post-alpha) query term — Lucene's boolean SHOULD recall set, which is
  exactly the set of docs the BM25 scorer assigns a score. Scores are
  never recomputed here; the per-doc sum is the same `bm25_contribution`
  column the scorer uses.
- 100-TB shape: the query-term table is tiny and broadcast; the match
  set stays distributed (no driver collect); facet aggregation shuffles
  |facet values| rows, significant-terms shuffles <= vocab rows — both
  bounded by dictionary-scale, not corpus-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_text_search_spark.functions.text import tokenize_expr, tokenize_py
from data_text_search_spark.operators.bm25_exhaustive import (
    LogicalIndex,
    bm25_contribution,
    query_terms_df,
)


def _doc_scores(index: LogicalIndex, spark: SparkSession,
                query: str) -> DataFrame:
    """(doc_id, score) for EVERY matching doc (no top-k) — the scorer's
    aggregation with the TakeOrderedAndProject lopped off."""
    qt = query_terms_df(spark, query)
    matched = F.broadcast(
        qt.join(index.term_stats, "term").select("term", "qcount", "idf"))
    return (index.term_doc.join(matched, "term")
            .withColumn("_avgdl", F.lit(index.avgdl))
            .withColumn("contrib", bm25_contribution(index.config))
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("score")))


def match_count(index: LogicalIndex, spark: SparkSession,
                query: str) -> DataFrame:
    """The ES `_count` API: how many documents match the query (contain
    >= 1 live query term), without ranking anything. One broadcast of
    the query-term table + a distinct-count over the semi-joined
    term_doc — no score evaluation, no sort, no top-k.

    Returns a single row (n_matching long)."""
    qt = query_terms_df(spark, query)
    matched = F.broadcast(qt.join(index.term_stats, "term").select("term"))
    return (index.term_doc.join(matched, "term")
            .agg(F.count_distinct("doc_id").alias("n_matching")))


def percolate(spark: SparkSession, docs: DataFrame,
              queries: list[str], text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Reverse search (Elasticsearch's percolator, term-query AND
    semantics): which REGISTERED QUERIES match each document? A query
    matches iff every one of its distinct tokens appears in the
    document — the alerting/saved-search primitive: docs stream in,
    queries are the stored side.

    Returns (doc_id, query_id) pairs, ordered doc_id asc, query_id asc;
    query_id is the position in `queries`. Empty-token queries match
    nothing.

    Scale shape: MAP-ONLY — queries compile to literal per-query AND
    conditions over each doc's token array (tokenized once per row via
    the functions.hof.once lambda binding; one array_contains per
    registered term), and matching query ids are emitted straight from
    a generator expression. No token explosion, no join, no aggregate
    shuffle — the round-5 form exploded every distinct token occurrence
    (corpus-token-scale rows) into a broadcast join + (doc, query)
    aggregate. The orderBy is presentation only."""
    from data_text_search_spark.functions import hof
    qterms = [sorted(set(tokenize_py(q))) for q in queries]
    if not any(qterms):
        return spark.createDataFrame([], "doc_id long, query_id int")

    def matches(toks) -> F.Column:
        # membership on the raw token array — array_contains needs no
        # distinct pass, and `toks` is the lambda-bound single evaluation
        hits = []
        for qid, terms in enumerate(qterms):
            if not terms:       # empty-token queries match nothing
                continue
            cond = None
            for t in terms:
                c = F.array_contains(toks, t)
                cond = c if cond is None else cond & c
            hits.append(F.when(cond, F.lit(qid)).otherwise(
                F.lit(None).cast("int")))
        return F.filter(F.array(*hits), lambda x: x.isNotNull())

    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.explode(hof.once(
                            tokenize_expr(F.col(text_col)), matches))
                        .alias("query_id"))
            .orderBy("doc_id", "query_id"))


def build_field_indexes(spark: SparkSession, df: DataFrame,
                        fields: dict[str, float], config=None,
                        id_col: str = "doc_id") -> dict:
    """Build (and persist) one LogicalIndex per field for repeated
    fielded_search calls — a query-per-call caller should not pay the
    per-field tokenize/aggregate pipeline every time."""
    from data_text_search_spark.config import BM25Config
    from data_text_search_spark.operators.bm25_exhaustive import (
        build_logical,
        ingest,
    )

    cfg = config or BM25Config(alpha=-5.0)
    return {col: build_logical(ingest(df, text_col=col, id_col=id_col),
                               cfg, persist=True)
            for col in fields}


def fielded_search(spark: SparkSession, df: DataFrame, query: str,
                   fields: dict[str, float], config=None,
                   id_col: str = "doc_id", n: int = 10,
                   indexes: dict | None = None) -> DataFrame:
    """Multi-field weighted search (Lucene's per-field boosts,
    `text:q^1.0 title:q^2.0`): each field is scored as its OWN BM25
    corpus — its own tokenization, doc lengths, avgdl, df/idf — and a
    document's final score is the weighted sum of its per-field scores
    (absent-in-field contributes 0). A doc matches if any field matches.

    Returns top-n (doc_id, score, score_abs), score desc / doc_id asc.

    Plan shape: one tokenize→tf/df/idf→score pipeline per field (the
    unchanged exhaustive scorer), fused by a unionByName + one hash
    aggregate keyed on doc_id — fusion input is |fields| × matching
    docs rows, never corpus × fields. Per-field weights multiply the
    per-field SUM once (not per contribution), keeping the float shape
    identical to the DuckDB twin."""
    from functools import reduce

    from data_text_search_spark.config import BM25Config
    from data_text_search_spark.operators.bm25_exhaustive import (
        build_logical,
        ingest,
    )

    cfg = config or BM25Config(alpha=-5.0)
    parts = []
    for col, w in sorted(fields.items()):
        if indexes is not None and col in indexes:
            idx = indexes[col]  # prebuilt (build_field_indexes)
        else:
            idx = build_logical(ingest(df, text_col=col, id_col=id_col),
                                cfg)
        scored = _doc_scores(idx, spark, query)
        parts.append(scored.select(
            "doc_id", (F.col("score") * F.lit(float(w))).alias("s")))
    fused = (reduce(lambda a, b: a.unionByName(b), parts)
             .groupBy("doc_id").agg(F.sum("s").alias("score")))
    return (fused.orderBy(F.desc("score"), F.asc("doc_id")).limit(n)
            .select("doc_id", F.round("score", 4).alias("score"),
                    F.abs(F.round("score", 2)).alias("score_abs")))


def search_facets(index: LogicalIndex, spark: SparkSession, query: str,
                  meta: DataFrame, facet_col: str = "lang") -> DataFrame:
    """Facet counts over the full match set: for each value of
    `facet_col` in `meta` (doc_id + attribute columns), the number of
    matching documents and the best BM25 score inside that bucket —
    Elasticsearch's `terms` aggregation run in filter-less query context.

    Returns (facet, n_docs, top_score) ordered n_docs desc, facet asc.
    Plan: match-set scores (above) hash-joined to meta on doc_id, then a
    facet-bounded hash aggregate — the join is doc-partitioned on both
    sides at scale (meta bucketed by doc_id), and no row ever reaches
    the driver."""
    scored = _doc_scores(index, spark, query)
    return (scored
            .join(meta.select("doc_id", F.col(facet_col).alias("facet")),
                  "doc_id")
            .groupBy("facet")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.max("score"), 4).alias("top_score"))
            .orderBy(F.desc("n_docs"), F.asc("facet")))


def search_collapse(index: LogicalIndex, spark: SparkSession, query: str,
                    meta: DataFrame, collapse_col: str,
                    n: int = 10) -> DataFrame:
    """Field collapsing (Elasticsearch `collapse`): the hit list keeps
    only the BEST-scoring document per value of `collapse_col`, then
    the group representatives rank normally — one result per source /
    domain / author, the classic SERP-diversity operator.

    Scores the FULL match set (a collapsed top-n can reach arbitrarily
    deep: a group's representative may sit far below the global top-k,
    so block-max pruning would be unsound here), joins the collapse key,
    picks each group's best on the deterministic ROUNDED order
    (round(score,4) desc, doc_id asc — same engine/oracle-stable total
    order as search_after), then takes the global top-n of the
    representatives on that order.

    Returns (doc_id, <collapse_col>, score, rank, score_abs). Plan:
    match-set aggregate + doc-keyed join + one window per collapse key
    (shuffle bounded by the match set, partitioned by a key whose
    cardinality is the number of groups) + TakeOrderedAndProject."""
    from pyspark.sql import Window

    scored = (_doc_scores(index, spark, query)
              .withColumn("score_r", F.round("score", 4)))
    keyed = scored.join(
        meta.select("doc_id", collapse_col), "doc_id")
    w = Window.partitionBy(collapse_col).orderBy(
        F.desc("score_r"), F.asc("doc_id"))
    best = (keyed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1))
    wg = Window.orderBy(F.desc("score_r"), F.asc("doc_id"))
    return (best
            .withColumn("rank", F.row_number().over(wg))
            .filter(F.col("rank") <= n)
            .select("doc_id", collapse_col,
                    F.col("score_r").alias("score"), "rank",
                    F.abs(F.round("score", 2)).alias("score_abs"))
            .orderBy("rank"))


def facet_ranges(index: LogicalIndex, spark: SparkSession, query: str,
                 meta: DataFrame, range_col: str,
                 boundaries: list[float]) -> DataFrame:
    """Range facets over the full match set: Elasticsearch's `range`
    aggregation — ascending `boundaries` [b1..bm] define m+1 buckets
    (-inf,b1), [b1,b2), ... [bm,inf) over a numeric `range_col` in
    `meta`; each bucket reports its matching-doc count and best BM25
    score. Empty buckets are kept (count 0, null score), exactly like
    ES, so the bucket frame is stable for dashboards.

    Returns (bucket_idx, bucket, n_docs, top_score) ordered bucket_idx
    asc. Plan: match-set scores joined to meta on doc_id, a CASE
    bucket assignment (pure JVM), a bucket-bounded hash aggregate,
    then a broadcast left join from the tiny literal bucket table —
    no UDF, no driver collect of data rows."""
    bs = list(boundaries)
    if bs != sorted(bs) or len(set(bs)) != len(bs) or not bs:
        raise ValueError("facet_ranges: boundaries must be non-empty, "
                         "ascending, distinct")

    def label(i: int) -> str:
        lo = "*" if i == 0 else f"{bs[i - 1]:g}"
        hi = "*" if i == len(bs) else f"{bs[i]:g}"
        return f"{lo}-{hi}"

    col = F.col(range_col).cast("double")
    expr = F.when(col < F.lit(float(bs[0])), F.lit(0))
    for i, b in enumerate(bs[1:], start=1):
        expr = expr.when(col < F.lit(float(b)), F.lit(i))
    expr = expr.otherwise(F.lit(len(bs)))
    scored = _doc_scores(index, spark, query)
    agg = (scored
           .join(meta.select("doc_id", range_col), "doc_id")
           .select(expr.alias("bucket_idx"), "score")
           .groupBy("bucket_idx")
           .agg(F.count("*").alias("n_docs"),
                F.round(F.max("score"), 4).alias("top_score")))
    buckets = spark.createDataFrame(
        [(i, label(i)) for i in range(len(bs) + 1)],
        "bucket_idx int, bucket string")
    # broadcast the AGG side (<= m+1 rows post-aggregate): Spark cannot
    # broadcast-build the preserved (left) side of a left-outer join
    return (buckets.join(F.broadcast(agg), "bucket_idx", "left")
            .select("bucket_idx", "bucket",
                    F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
                    "top_score")
            .orderBy("bucket_idx"))


def significant_terms(index: LogicalIndex, spark: SparkSession, query: str,
                      n: int = 20, min_fg_df: int = 2) -> DataFrame:
    """Significant-terms aggregation (Elasticsearch's significant_terms,
    'lift' heuristic): terms overrepresented in the query's match set
    relative to the whole corpus.

        lift(t) = (fg_df / fg_n) / (bg_df / n_docs)

    where fg_df = matching docs containing t, fg_n = |match set|,
    bg_df = t's corpus document frequency. The query's own terms are
    excluded (they trivially maximize lift); `min_fg_df` drops
    one-document noise terms. Live (post-alpha) vocabulary only — the
    same dictionary every scorer sees.

    Returns (term, fg_df, bg_df, lift) ordered lift desc, term asc,
    limited to `n`. Plan: the match set is doc-partitioned, the fg_df
    aggregate shuffles <= vocab rows, the bg join is against the (already
    aggregated, dictionary-scale) term_stats — corpus bytes are touched
    exactly once, in the term_doc scan."""
    qt = query_terms_df(spark, query)
    qterms = [r["term"] for r in qt.select("term").collect()]
    matched = F.broadcast(qt.join(index.term_stats, "term").select("term"))
    # materialize the match set once: the count action AND the fg_df
    # join both read it — without the checkpoint the corpus-scale
    # semi-join + distinct runs twice (once to count, once inside the
    # main job's broadcast build). The checkpoint is LAZY so the count
    # itself materializes it — eager=True ran a separate job first
    fg_docs = (index.term_doc.join(matched, "term")
               .select("doc_id").distinct().localCheckpoint(eager=False))
    fg_n = fg_docs.count()
    if fg_n == 0:
        return spark.createDataFrame(
            [], "term string, fg_df long, bg_df long, lift double")
    # fg_n is already known: broadcast the match set under the usual id
    # budget so term_doc (corpus-scale) never shuffles for this join;
    # past it, fall back to a plain shuffle join
    fg_side = F.broadcast(fg_docs) if fg_n <= 10_000_000 else fg_docs
    fg_df = (index.term_doc.join(fg_side, "doc_id")
             .groupBy("term").agg(F.count("*").alias("fg_df")))
    out = (fg_df
           .filter(~F.col("term").isin(qterms) if qterms else F.lit(True))
           .filter(F.col("fg_df") >= min_fg_df)
           .join(index.term_stats.select("term",
                                         F.col("df").alias("bg_df")),
                 "term")
           .withColumn(
               "lift",
               (F.col("fg_df") / F.lit(float(fg_n)))
               / (F.col("bg_df") / F.lit(float(index.n_docs)))))
    return (out.orderBy(F.desc("lift"), F.asc("term")).limit(n)
            .withColumn("lift", F.round("lift", 4))
            .select("term", "fg_df", "bg_df", "lift"))


def date_histogram(df: DataFrame, ts_col: str = "ts",
                   interval: str = "day", by: str | None = None,
                   value_col: str | None = None) -> DataFrame:
    """ES date_histogram aggregation: event counts per calendar bucket
    (day/hour/month via date_trunc — fixed calendar intervals), with an
    optional terms sub-aggregation (`by`) and an optional metric
    sub-aggregation (sum of `value_col`, rounded 4 dp — float sum order
    differs across engines). Buckets are emitted as 'yyyy-MM-dd HH:mm:ss'
    strings so the result is engine-portable; empty buckets are omitted
    (ES min_doc_count=1). Pure JVM expressions — one map-side-combined
    hash aggregate, the canonical Catalyst shape for a 100-TB event
    table."""
    bucket = F.date_format(F.date_trunc(interval, F.col(ts_col)),
                           "yyyy-MM-dd HH:mm:ss").alias("bucket")
    keys = [bucket] + ([F.col(by)] if by else [])
    aggs = [F.count("*").alias("n")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 4).alias(f"sum_{value_col}"))
    order = ["bucket"] + ([by] if by else [])
    return df.groupBy(*keys).agg(*aggs).orderBy(*order)


def top_hits(index: LogicalIndex, spark: SparkSession, query: str,
             meta: DataFrame, bucket_col: str,
             per_bucket: int = 3) -> DataFrame:
    """ES top_hits sub-aggregation: inside each bucket of a terms
    aggregation, the top-`per_bucket` matching docs by relevance — the
    "show me the best N per source/domain/author" operator
    (search_collapse's generalization from 1 representative to N).

    Scores the FULL match set (a bucket's hits can sit arbitrarily deep
    in the global ranking, so top-k pruning would be unsound), joins the
    bucket key, one window per bucket on the deterministic ROUNDED order
    (round(score,4) desc, doc_id asc). Shuffle is bounded by the match
    set, partitioned by the bucket key.

    Returns (bucket value, doc_id, score, bucket_rank), bucket asc,
    rank asc."""
    from pyspark.sql import Window

    scored = (_doc_scores(index, spark, query)
              .withColumn("score_r", F.round("score", 4)))
    keyed = scored.join(meta.select("doc_id", bucket_col), "doc_id")
    w = Window.partitionBy(bucket_col).orderBy(
        F.desc("score_r"), F.asc("doc_id"))
    return (keyed.withColumn("bucket_rank", F.row_number().over(w))
            .filter(F.col("bucket_rank") <= per_bucket)
            .select(F.col(bucket_col), "doc_id",
                    F.col("score_r").alias("score"), "bucket_rank")
            .orderBy(F.asc(bucket_col), F.asc("bucket_rank")))


def histogram_moving_avg(df: DataFrame, ts_col: str = "ts",
                         interval: str = "day", by: str = "event_type",
                         window: int = 3) -> DataFrame:
    """ES moving_avg PIPELINE aggregation over a date_histogram: the
    trailing `window`-bucket average of each bucket's count, per `by`
    series. Two JVM stages: the histogram hash aggregate, then one
    window over (series, bucket) — the buckets table is tiny relative to
    the events it summarizes, so the window is effectively free."""
    from pyspark.sql import Window

    hist = date_histogram(df, ts_col=ts_col, interval=interval, by=by)
    w = (Window.partitionBy(by).orderBy("bucket")
         .rowsBetween(-(window - 1), 0))
    return (hist.withColumn("moving_avg",
                            F.round(F.avg("n").over(w), 4))
            .select("bucket", by, "n", "moving_avg")
            .orderBy("bucket", by))
