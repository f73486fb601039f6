"""Retrieval evaluation: nDCG@k / MRR@k / recall@k per query — the
TREC-style harness for comparing rankers (BM25 vs hybrid vs ANN-backed)
on graded relevance judgments (qrels).

Everything is one declarative plan: results joined to qrels on
(query_id, doc_id), per-query aggregates, and the ideal DCG from a
per-query window over the qrels alone. Shuffles are bounded by
|results| + |qrels| rows (never corpus-scale); both inputs are
typically top-k lists and judgment sets, so this is dashboard-cheap at
any corpus size.

Formulas (the standard trec_eval definitions, deterministic):
    DCG@k   = Σ_{i<=k} grade_i / log2(i + 1)        (i = 1-based rank)
    IDCG@k  = DCG of the query's grades sorted desc (doc_id asc ties)
    nDCG@k  = DCG/IDCG (0 when the query has no judged-relevant docs)
    MRR@k   = 1 / (first rank with grade > 0), 0 if none in top k
    recall@k = |{relevant docs in top k}| / |{relevant docs}|
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def ranking_metrics(spark: SparkSession, results: DataFrame,
                    qrels: DataFrame, k: int = 10) -> DataFrame:
    """Per-query metrics for a ranking.

    results: (query_id, doc_id, rank) — rank 1-based within query.
    qrels:   (query_id, doc_id, grade) — grade > 0 means relevant;
             graded values feed DCG.

    Returns (query_id, ndcg, mrr, recall), each rounded to 4 dp,
    ordered query_id asc. Queries present in qrels but absent from
    results score 0; queries with no judged docs are omitted (nDCG is
    undefined without judgments — trec_eval drops them too)."""
    res = (results.filter(F.col("rank") <= k)
           .select("query_id", "doc_id", "rank"))
    qr = qrels.select("query_id", "doc_id",
                      F.col("grade").cast("double").alias("grade"))

    hits = (res.join(qr, ["query_id", "doc_id"])
            .select("query_id", "rank", "grade"))
    per_q_hits = (hits.groupBy("query_id").agg(
        F.sum(F.col("grade")
              / F.log2(F.col("rank") + F.lit(1.0))).alias("dcg"),
        F.min(F.when(F.col("grade") > 0, F.col("rank"))).alias("first_rel"),
        F.count(F.when(F.col("grade") > 0, True)).alias("rel_ret")))

    w = Window.partitionBy("query_id").orderBy(F.desc("grade"),
                                               F.asc("doc_id"))
    ideal = (qr.withColumn("pos", F.row_number().over(w))
             .filter(F.col("pos") <= k)
             .groupBy("query_id").agg(
                 F.sum(F.col("grade")
                       / F.log2(F.col("pos") + F.lit(1.0))).alias("idcg")))
    totals = (qr.filter(F.col("grade") > 0)
              .groupBy("query_id").agg(F.count("*").alias("n_rel")))

    out = (ideal.join(totals, "query_id", "left")
           .join(per_q_hits, "query_id", "left")
           .select(
               "query_id",
               F.round(F.when(F.col("idcg") > 0,
                              F.coalesce(F.col("dcg"), F.lit(0.0))
                              / F.col("idcg")).otherwise(0.0), 4)
               .alias("ndcg"),
               F.round(F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)), 4)
               .alias("mrr"),
               F.round(F.when(F.col("n_rel") > 0,
                              F.coalesce(F.col("rel_ret"), F.lit(0))
                              .cast("double") / F.col("n_rel"))
                       .otherwise(0.0), 4).alias("recall")))
    return out.orderBy("query_id")
