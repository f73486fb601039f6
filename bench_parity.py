#!/usr/bin/env python
"""Rank-parity evidence at scale: physical-index results vs the pure-Python
reference oracle over the bundled query set, at a given corpus size
(default 50k docs = SF 0.1 per FIXTURES.md).

Prints one JSON line {"n_docs":..., "queries":..., "rank_identical":...,
"max_abs_score_diff":...} and appends a parity stanza to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)

    from data_text_search_spark.config import BM25Config
    from data_text_search_spark.fixtures.corpus import QUERIES, corpus_pandas
    from data_text_search_spark.operators.index_build import build_index
    from data_text_search_spark.operators.index_query import IndexSearcher
    from data_text_search_spark.session import get_spark
    from tests.oracle_bm25 import oracle_search

    spark = get_spark(app_name="parity", driver_memory="48g")
    corpus_path = f"/tmp/bench_corpus_{n_docs}"
    if not os.path.exists(f"{corpus_path}/_SUCCESS"):
        from data_text_search_spark.fixtures.corpus import corpus_df
        corpus_df(spark, n_docs).write.mode("overwrite").parquet(corpus_path)
    root = f"/tmp/parity_index_{n_docs}"
    shutil.rmtree(root, ignore_errors=True)
    build_index(spark, spark.read.parquet(corpus_path), root, BM25Config(),
                id_col="doc_id", shards=32, groups=1)
    searcher = IndexSearcher(spark, root)

    texts = corpus_pandas(n_docs)["content"].tolist()
    ok, max_diff = 0, 0.0
    per_query = {}
    for q in QUERIES:
        got = [(r["doc_id"], r["score"])
               for r in searcher.search(q["query_text"], 10).collect()]
        want = oracle_search(texts, q["query_text"], n=10)
        rank_same = [d for d, _ in got] == [d for d, _ in want]
        diffs = [abs(g - w) for (_, g), (_, w) in zip(got, want)]
        max_diff = max([max_diff] + diffs)
        per_query[f"q{q['query_id']}"] = {
            "rank_identical": rank_same, "n": len(got),
            "max_score_diff": max(diffs) if diffs else 0.0}
        ok += rank_same
    result = {"n_docs": n_docs, "queries": len(QUERIES),
              "rank_identical": ok, "max_abs_score_diff": max_diff,
              "all_rank_identical": ok == len(QUERIES)}
    print(json.dumps(result))
    assert ok == len(QUERIES), per_query
    assert max_diff < 1e-9

    marker = "## Rank parity at SF=0.1 scale (bench_parity.py, measured)"
    stanza = f"""{marker}

Physical-index (block-max executor) top-10 vs the pure-Python reference
oracle on the {n_docs}-doc corpus, all {len(QUERIES)} bundled queries:
**{ok}/{len(QUERIES)} rank-identical**, max |score diff| =
{max_diff:.2e} (pre-rounding doubles).
"""
    path = f"{repo}/BENCH/BASELINE.md"
    with open(path) as f:
        content = f.read()
    if marker in content:  # replace, don't accumulate stanzas
        content = content[: content.index(marker)]
    with open(path, "w") as f:
        f.write(content.rstrip("\n") + "\n\n" + stanza)


if __name__ == "__main__":
    main()
