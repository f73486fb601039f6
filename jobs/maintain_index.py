#!/usr/bin/env python
"""spark-submit entry point: incremental index maintenance.

Append a delta segment:

    spark-submit --py-files engine.zip jobs/maintain_index.py \
        --index s3a://bucket/index/ add --input s3a://bucket/new_docs/ \
        --batch-key 2026-08-16T12

Segment-tier compaction (collapse all delta segments into one; base
postings untouched, cost ∝ segment size — works on any index root,
including object stores, since it only writes new directories):

    spark-submit --py-files engine.zip jobs/maintain_index.py \
        --index s3a://bucket/index/ merge-tier

Full compaction under refreshed global stats (bit-identical to a
from-scratch rebuild, without re-tokenizing). LOCAL-FS index roots
only — the final swap is two os.rename calls, which object stores
don't support; copy the index local, merge, sync back:

    spark-submit --py-files engine.zip jobs/maintain_index.py \
        --index /mnt/indexes/corpus/ merge
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--cores", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)
    add = sub.add_parser("add", help="append a delta segment")
    add.add_argument("--input", required=True, help="parquet delta path/glob")
    add.add_argument("--text-col", default="content")
    add.add_argument("--id-col", default=None)
    add.add_argument("--batch-key", default=None,
                     help="idempotency token (replays become no-ops)")
    add.add_argument("--rebuild-threshold", type=float, default=0.2)
    sub.add_parser("merge", help="full compaction, refreshed stats "
                                 "(local-FS index roots only)")
    sub.add_parser("merge-tier", help="collapse delta segments into one "
                                      "(base untouched; any filesystem)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from data_text_search_spark.streaming.incremental import (
        add_documents,
        merge_segments,
        merge_tier,
    )

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from data_text_search_spark.session import get_spark
        spark = get_spark(app_name="maintain_index", cores=args.cores)

    if args.cmd == "add":
        delta = spark.read.parquet(args.input)
        m = add_documents(spark, args.index, delta, text_col=args.text_col,
                          id_col=args.id_col, batch_key=args.batch_key,
                          rebuild_threshold=args.rebuild_threshold)
    elif args.cmd == "merge-tier":
        m = merge_tier(spark, args.index)
    else:
        m = merge_segments(spark, args.index)
    print(json.dumps({"n_docs": m["n_docs"], "drift": m.get("drift", 0.0),
                      "segments": len(m.get("segments", [])),
                      "needs_rebuild": m.get("needs_rebuild", False)}))


if __name__ == "__main__":
    main()
