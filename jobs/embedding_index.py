#!/usr/bin/env python
"""spark-submit entry point: the embedding-side surface — build a
persisted ANN index (hyperplane-LSH buckets or IVF k-means cells),
search it (single vector or a whole query table in one job), or run an
exact batch kNN join between two vector tables.

    # build (kind: lsh | ivf)
    spark-submit --py-files engine.zip jobs/embedding_index.py build \
        --input s3a://b/embeddings/ --root s3a://b/ann/ --kind ivf \
        --n-centroids 4096

    # single-vector search (query taken from the input table by id)
    ... embedding_index.py search --root s3a://b/ann/ --kind ivf \
        --input s3a://b/embeddings/ --query-vec-id 42 --k 10 --nprobe 16

    # batched search: a (qid, embedding) parquet in, (qid, vec_id,
    # score) parquet out — one job for the whole table
    ... embedding_index.py batch-search --root s3a://b/ann/ --kind lsh \
        --queries s3a://b/queries/ --out s3a://b/hits/

    # exact batch kNN join (broadcast or 2-D blocked, auto-dispatched)
    ... embedding_index.py knn --left s3a://b/q/ --right s3a://b/corpus/ \
        --out s3a://b/knn/ --k 10 --exclude-self

Scale notes live on the operators themselves (operators/similarity.py):
index scans are partition-pruned to probed buckets/cells, batched
probes broadcast-join so index rows never shuffle, and the kNN block
path shuffles partial top-k rows, never a score matrix.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--root", required=True)
    b.add_argument("--kind", choices=["lsh", "ivf"], default="lsh")
    b.add_argument("--id-col", default="vec_id")
    b.add_argument("--vec-col", default="embedding")
    b.add_argument("--n-centroids", type=int, default=64)

    s = sub.add_parser("search")
    s.add_argument("--root", required=True)
    s.add_argument("--kind", choices=["lsh", "ivf"], default="lsh")
    s.add_argument("--input", required=True,
                   help="embeddings table holding the query vector")
    s.add_argument("--query-vec-id", type=int, required=True)
    s.add_argument("--id-col", default="vec_id")
    s.add_argument("--vec-col", default="embedding")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--nprobe", type=int, default=8)

    bs = sub.add_parser("batch-search")
    bs.add_argument("--root", required=True)
    bs.add_argument("--kind", choices=["lsh", "ivf"], default="lsh")
    bs.add_argument("--queries", required=True,
                    help="parquet with (qid, embedding)")
    bs.add_argument("--out", required=True)
    bs.add_argument("--k", type=int, default=10)
    bs.add_argument("--nprobe", type=int, default=8)

    kn = sub.add_parser("knn")
    kn.add_argument("--left", required=True)
    kn.add_argument("--right", required=True)
    kn.add_argument("--out", required=True)
    kn.add_argument("--k", type=int, default=10)
    kn.add_argument("--id-col", default="vec_id")
    kn.add_argument("--vec-col", default="embedding")
    kn.add_argument("--exclude-self", action="store_true")

    sd = sub.add_parser("semdedup")
    sd.add_argument("--input", required=True)
    sd.add_argument("--out", required=True,
                    help="parquet of (id_a, id_b, cosine) near-dup pairs")
    sd.add_argument("--threshold", type=float, default=0.9)
    sd.add_argument("--n-clusters", type=int, default=64)
    sd.add_argument("--cluster-cap", type=int, default=100_000)
    sd.add_argument("--id-col", default="vec_id")
    sd.add_argument("--vec-col", default="embedding")

    for p in (b, s, bs, kn, sd):
        p.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_text_search_spark.operators import similarity

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from data_text_search_spark.session import get_spark
        spark = get_spark(app_name=f"embedding_index_{args.cmd}",
                          cores=args.cores)

    if args.cmd == "build":
        df = spark.read.parquet(args.input)
        if args.kind == "lsh":
            similarity.build_ann_index(df, args.root, vec_col=args.vec_col,
                                       id_col=args.id_col)
        else:
            similarity.build_ivf_index(df, args.root, vec_col=args.vec_col,
                                       id_col=args.id_col,
                                       n_centroids=args.n_centroids)
        print(json.dumps({"built": args.kind, "root": args.root}))
    elif args.cmd == "search":
        emb = spark.read.parquet(args.input)
        row = (emb.filter(F.col(args.id_col) == args.query_vec_id)
               .select(args.vec_col).first())
        if row is None:
            raise SystemExit(
                f"search: no row with {args.id_col}={args.query_vec_id} "
                f"in {args.input}")
        qv = [float(v) for v in row[args.vec_col]]
        if args.kind == "lsh":
            res = similarity.ann_index_search(spark, args.root, qv, k=args.k)
        else:
            res = similarity.ivf_search(spark, args.root, qv, k=args.k,
                                        nprobe=args.nprobe)
        for r in res.collect():
            print(json.dumps({"vec_id": r["vec_id"], "score": r["score"]}))
    elif args.cmd == "batch-search":
        queries = spark.read.parquet(args.queries)
        if args.kind == "lsh":
            res = similarity.ann_index_search_batch(spark, args.root,
                                                    queries, k=args.k)
        else:
            res = similarity.ivf_search_batch(spark, args.root, queries,
                                              k=args.k, nprobe=args.nprobe)
        res.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"rows": spark.read.parquet(args.out).count()}))
    elif args.cmd == "semdedup":
        df = spark.read.parquet(args.input)
        res = similarity.semdedup_pairs(
            df, threshold=args.threshold, n_clusters=args.n_clusters,
            cluster_cap=args.cluster_cap, vec_col=args.vec_col,
            id_col=args.id_col)
        res.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"pairs": spark.read.parquet(args.out).count()}))
    else:
        left = spark.read.parquet(args.left)
        right = spark.read.parquet(args.right)
        res = similarity.knn_join(left, right, k=args.k,
                                  vec_col=args.vec_col, id_col=args.id_col,
                                  exclude_self=args.exclude_self)
        res.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"rows": spark.read.parquet(args.out).count()}))


if __name__ == "__main__":
    main()
