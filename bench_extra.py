#!/usr/bin/env python
"""Round-6 optimization harness: per-query isolated timings + plan capture.

NOT the frozen bench (bench.py is the driver's measured artifact). This
file exists for guide-§1 discipline: time individual contract queries
with the same .collect() methodology as bench.py, label jobs, and dump
.explain("formatted") for the plans/r06/ evidence files.

Usage:
  python bench_extra.py [--sf DIR] [--passes N] [--explain OUTDIR] q1 q2 ...
  python bench_extra.py --all            # every contract row
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="directory for <q>_<suffix>.txt explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from data_text_search_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench_extra", cores=args.cpus,
                      shuffle_partitions=max(args.cpus, 8),
                      driver_memory="48g")

    contract = entrymod.queries()
    names = list(contract) if args.all else args.queries
    unknown = [n for n in names if n not in contract]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # mirror bench.py: pre-build heavyweight artifacts outside timings
    t0 = time.perf_counter()
    entrymod._physical_searcher(spark, args.sf)
    entrymod._physical_searcher(spark, args.sf, codec="compact")
    entrymod._positions_root(spark, args.sf)
    print(f"[prebuild core {time.perf_counter() - t0:.1f}s]", flush=True)
    needed = set(names)
    extra_builds = {
        "bm25_topk_incremental": entrymod._incremental_searcher,
        "bm25_topk_delta": entrymod._delta_searcher,
        "bm25_topk_deleted": entrymod._deleted_searcher,
        "bm25_topk_stopwords": entrymod._stopword_searcher,
        "bm25_federated": entrymod._federated,
        "bm25_batch_federated": entrymod._federated,
        "bm25_topk_snapshot": entrymod._snapshot_searcher,
        "phrase_positional_incremental": entrymod._positions_incr_root,
        "ann_lsh_cert": entrymod._ann_index_root,
        "ann_batch_cert": entrymod._ann_index_root,
        "ivf_cert": entrymod._ivf_index_root,
    }
    for q, builder in extra_builds.items():
        if q in needed:
            t0 = time.perf_counter()
            builder(spark, args.sf)
            print(f"[prebuild {q} {time.perf_counter() - t0:.1f}s]",
                  flush=True)

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in names:
            df = contract[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain,
                                   f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(txt)
            print(f"[explain {name} -> {args.explain}]", flush=True)

    samples: dict[str, list[float]] = {n: [] for n in names}
    for p in range(args.passes):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} pass{p}")
            t0 = time.perf_counter()
            contract[name](spark, args.sf).collect()
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            print(f"  pass{p} {name}: {dt:.3f}s", flush=True)
            spark.sparkContext.setJobDescription(None)
    if not args.passes:
        return
    med = {n: round(sorted(ts)[len(ts) // 2], 3) for n, ts in samples.items()}
    print(json.dumps({"sf": args.sf, "medians": med,
                      "minmax": {n: [round(min(t), 3), round(max(t), 3)]
                                 for n, t in samples.items()}},
                     indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
