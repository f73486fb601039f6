#!/usr/bin/env python
"""spark-submit CLI for the positional-postings sidecar.

Build once per corpus snapshot, then answer phrase / proximity queries
from position blocks alone (no corpus access at query time):

  # build
  spark-submit jobs/positions.py --build --corpus docs.parquet \
      --root /idx/pos [--text-col text --id-col doc_id --shards 64]

  # queries
  spark-submit jobs/positions.py --root /idx/pos --phrase "hash join"
  spark-submit jobs/positions.py --root /idx/pos --near hash join --slop 3
  spark-submit jobs/positions.py --root /idx/pos \
      --window hash join scan --width 12
  spark-submit jobs/positions.py --root /idx/pos \
      --phrase-prefix "hash st" --index /idx/bm25   # dictionary source

One mode per invocation; results print as JSON lines.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> list[dict]:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="positional sidecar root")
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--corpus", default=None, metavar="PARQUET")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--shards", type=int, default=None)
    ap.add_argument("--phrase", default=None)
    ap.add_argument("--near", nargs=2, default=None,
                    metavar=("T1", "T2"))
    ap.add_argument("--slop", type=int, default=3)
    ap.add_argument("--window", nargs="+", default=None, metavar="TERM")
    ap.add_argument("--width", type=int, default=12)
    ap.add_argument("--phrase-prefix", default=None, metavar="PHRASE")
    ap.add_argument("--index", default=None,
                    help="main index root (the dictionary source for "
                         "--phrase-prefix expansions)")
    ap.add_argument("--max-expansions", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)
    modes = [args.build, bool(args.phrase), bool(args.near),
             bool(args.window), bool(args.phrase_prefix)]
    if sum(modes) != 1:
        ap.error("need exactly one of --build / --phrase / --near / "
                 "--window / --phrase-prefix")
    if args.build and not args.corpus:
        ap.error("--build needs --corpus")
    if args.phrase_prefix and not args.index:
        ap.error("--phrase-prefix needs --index (dictionary source)")

    from pyspark.sql import SparkSession

    from data_text_search_spark.operators import positions as P

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from data_text_search_spark.session import get_spark
        spark = get_spark(app_name="positions", cores=args.cores)

    if args.build:
        corpus = spark.read.parquet(args.corpus)
        m = P.build_positions(spark, corpus, args.root,
                              text_col=args.text_col,
                              id_col=args.id_col, shards=args.shards)
        out = [{"built": args.root, "n_docs": m["n_docs"],
                "shards": m["shards"]}]
    elif args.phrase:
        res = P.phrase_count(spark, args.root, args.phrase)
        out = [{"doc_id": r["doc_id"], "phrase_count": r["phrase_count"]}
               for r in res.limit(args.k).collect()]
    elif args.near:
        res = P.span_near(spark, args.root, args.near[0], args.near[1],
                          args.slop)
        out = [{"doc_id": r["doc_id"], "min_dist": r["min_dist"]}
               for r in res.limit(args.k).collect()]
    elif args.window:
        res = P.span_window(spark, args.root, list(args.window),
                            args.width)
        out = [{"doc_id": r["doc_id"], "min_span": r["min_span"]}
               for r in res.limit(args.k).collect()]
    else:
        from data_text_search_spark.operators.index_query import (
            IndexSearcher,
        )
        s = IndexSearcher(spark, args.index)
        res = P.phrase_prefix_count(spark, args.root, args.phrase_prefix,
                                    s.term_stats,
                                    max_expansions=args.max_expansions)
        out = [{"doc_id": r["doc_id"], "phrase_count": r["phrase_count"]}
               for r in res.limit(args.k).collect()]

    for rec in out:
        print(json.dumps(rec))
    return out


if __name__ == "__main__":
    main()
