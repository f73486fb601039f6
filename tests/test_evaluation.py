"""ranking_metrics against hand-computed trec_eval-style values."""

from __future__ import annotations

import math

from data_text_search_spark.operators.evaluation import ranking_metrics


def test_ranking_metrics_hand_computed(spark):
    # q0: ranks 1..4 = docs 10,11,12,13; qrels: 10->2, 12->1, 99->1
    # q1: one hit at rank 3 (grade 1), 2 relevant total
    # q2: judged but NOTHING retrieved (absent from results)
    # q3: only grade-0 judgments -> all metrics 0
    results = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3), (0, 13, 4),
         (1, 20, 1), (1, 21, 2), (1, 22, 3)],
        "query_id int, doc_id long, rank int")
    qrels = spark.createDataFrame(
        [(0, 10, 2.0), (0, 12, 1.0), (0, 99, 1.0),
         (1, 22, 1.0), (1, 23, 1.0),
         (2, 30, 1.0),
         (3, 40, 0.0)],
        "query_id int, doc_id long, grade double")
    got = {r["query_id"]: (r["ndcg"], r["mrr"], r["recall"])
           for r in ranking_metrics(spark, results, qrels, k=10).collect()}

    dcg0 = 2 / math.log2(2) + 1 / math.log2(4)
    idcg0 = 2 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert math.isclose(got[0][0], round(dcg0 / idcg0, 4), abs_tol=1e-4)
    assert got[0][1] == 1.0                      # first relevant at rank 1
    assert math.isclose(got[0][2], round(2 / 3, 4), abs_tol=1e-4)

    dcg1 = 1 / math.log2(4)
    idcg1 = 1 / math.log2(2) + 1 / math.log2(3)
    assert math.isclose(got[1][0], round(dcg1 / idcg1, 4), abs_tol=1e-4)
    assert math.isclose(got[1][1], round(1 / 3, 4), abs_tol=1e-4)
    assert got[1][2] == 0.5

    assert got[2] == (0.0, 0.0, 0.0)   # judged, nothing retrieved
    assert got[3] == (0.0, 0.0, 0.0)   # idcg 0 -> everything 0

    # k cutoff: with k=2 q1's only hit (rank 3) drops out
    got2 = {r["query_id"]: (r["ndcg"], r["mrr"], r["recall"])
            for r in ranking_metrics(spark, results, qrels, k=2).collect()}
    assert got2[1] == (0.0, 0.0, 0.0)
