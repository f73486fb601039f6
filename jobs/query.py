#!/usr/bin/env python
"""spark-submit entry point: BM25 top-k queries against a built index.

    spark-submit --py-files engine.zip jobs/query.py \
        --index s3a://bucket/index/ --query "hash join" --k 10

Batch mode reads one query per line from --queries-file and answers the
whole set in a single Spark job.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", default=None)
    ap.add_argument("--queries-file", default=None)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()
    if not args.query and not args.queries_file:
        ap.error("need --query or --queries-file")

    from pyspark.sql import SparkSession

    from data_text_search_spark.operators.index_query import IndexSearcher

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from data_text_search_spark.session import get_spark
        spark = get_spark(app_name="query", cores=args.cores)

    searcher = IndexSearcher(spark, args.index)
    if args.query:
        rows = searcher.search(args.query, args.k).collect()
        for r in rows:
            print(json.dumps({"rank": r["rank"], "doc_id": r["doc_id"],
                              "score": r["score"], "score_abs": r["score_abs"]}))
    else:
        with open(args.queries_file) as f:
            queries = [line.rstrip("\n") for line in f if line.strip()]
        rows = searcher.search_batch(queries, args.k).collect()
        for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
            print(json.dumps({"query_id": r["query_id"], "rank": r["rank"],
                              "doc_id": r["doc_id"], "score": r["score"]}))


if __name__ == "__main__":
    main()
