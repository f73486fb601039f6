#!/usr/bin/env python
"""Per-round benchmark. Prints ONE JSON line.

Workload (matches BASELINE.json metric):
- index-build throughput (docs/sec) over the deterministic synthetic
  source-code corpus at the given SF (sf0.1 → 50k docs, ~10.5M tokens)
- BM25 query throughput (QPS) over the bundled 12-query set via the
  physical index (block-max executor)
- the driver-contract queries at $SPARK_GRAFT_SF_DIR for per-query secs

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
bench_scaling.py and recorded in BENCH/BASELINE.md — it needs two JVMs,
too heavy for the per-round loop.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time


def corpus_docs_for(sf_dir: str) -> int:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(name.replace("sf", ""))
    except ValueError:
        sf = 0.1
    return max(int(sf * 500_000), 500)


def ensure_corpus_parquet(spark, n_docs: int) -> str:
    """Corpus generation is not part of the measured build; cache it."""
    path = f"/tmp/bench_corpus_{n_docs}"
    if not os.path.exists(f"{path}/_SUCCESS"):
        from data_text_search_spark.fixtures.corpus import corpus_df
        corpus_df(spark, n_docs).write.mode("overwrite").parquet(path)
    return path


# side-file-only contract rows (see the stdout budget note in main):
# single-pass JVM-expression analytics/curation — stable across every
# round, full 3-decimal medians always in BENCH/bench_details_*.json
STDOUT_OMIT = frozenset({
    "doc_stats", "term_stats", "term_tf", "clean_pipeline",
    "token_count", "lang_id", "quality", "fingerprint",
    "hash_split", "chunk_docs", "scrub_text", "code_quality",
    "repetition_stats", "unigram_rarity", "stratified_sample",
    # round-5 single-aggregate JVM rows (one hash agg / dictionary
    # lookup, no kernel) — same stability class as the analytics above
    "completion_suggest", "date_histogram", "histogram_moving_avg",
    "search_sample", "sort_by_field", "search_stats",
    "search_percentiles",
    # rows whose trend a cheaper/identical-machinery row already tracks:
    # alias = federation + name resolution (bm25_federated), segmented
    # sidecar = phrase_positional's kernel over a union scan,
    # spell_suggest = one dictionary scan (suggest ranking is pytest'd)
    "bm25_topk_alias", "phrase_positional_incremental", "spell_suggest",
    # qstring trend is tracked by bm25_qstring (plain) and
    # bm25_qstring_fuzzy (adds the dictionary-expansion scan); the
    # boost variant is byte-identical machinery to plain
    "bm25_qstring_boost",
})


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from data_text_search_spark.config import BM25Config
    from data_text_search_spark.fixtures.corpus import QUERIES
    from data_text_search_spark.operators.index_build import build_index
    from data_text_search_spark.operators.index_query import IndexSearcher
    from data_text_search_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench", cores=cpus,
                      shuffle_partitions=max(cpus, 8), driver_memory="48g")

    n_docs = corpus_docs_for(sf_dir)
    corpus_path = ensure_corpus_parquet(spark, n_docs)
    corpus = spark.read.parquet(corpus_path)

    results: dict[str, float] = {}

    # --- index build (docs/sec) ---
    root = f"/tmp/bench_index_{n_docs}_{cpus}"
    shutil.rmtree(root, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(spark, corpus, root, BM25Config(), id_col="doc_id",
                shards=max(cpus, 8), groups=1)
    build_sec = time.perf_counter() - t0
    results["index_build"] = round(build_sec, 3)

    # --- query throughput over the physical index ---
    searcher = IndexSearcher(spark, root)
    searcher.warm()
    qtexts = [q["query_text"] for q in QUERIES]
    searcher.search_batch(qtexts, 10).collect()  # warm (parquet footers etc.)
    t0 = time.perf_counter()
    searcher.search_batch(qtexts, 10).collect()
    query_sec = time.perf_counter() - t0
    results["query_batch"] = round(query_sec, 3)
    # single-query latency (block-max pruned path)
    t0 = time.perf_counter()
    searcher.search(qtexts[2], 10).collect()
    results["query_single"] = round(time.perf_counter() - t0, 3)
    # interactive driver fast path: cold (one pruned fetch) vs warm (LRU)
    t0 = time.perf_counter()
    searcher.search_local(qtexts[3], 10)
    results["query_single_local_cold"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    searcher.search_local(qtexts[3], 10)
    results["query_single_local_warm"] = round(time.perf_counter() - t0, 4)

    # throughput-regime QPS: 1000 generated queries, one Spark job
    # (comparable to BENCH/BASELINE.md's scaling workload)
    import numpy as np
    from data_text_search_spark.fixtures.corpus import VOCAB
    rs = np.random.RandomState(123)
    big = qtexts + [" ".join(rs.choice(VOCAB[:200], size=1 + (i % 3)))
                    for i in range(1000 - len(qtexts))]
    searcher.search_batch(big[:8], 10).collect()
    t0 = time.perf_counter()
    searcher.search_batch(big, 10).collect()
    big_sec = time.perf_counter() - t0
    results["query_batch_1000"] = round(big_sec, 3)
    # same workload through the pandas bulk surface (no pandas->Spark->
    # Row round trip) — the honest engine-throughput number
    searcher.search_batch_pandas(big[:8], 10)
    t0 = time.perf_counter()
    searcher.search_batch_pandas(big, 10)
    results["query_batch_1000_pandas"] = round(time.perf_counter() - t0, 3)

    # --- driver-contract queries at sf_dir ---
    # pre-build the heavyweight one-time artifacts OUTSIDE the per-query
    # timings (and time them under their own keys), so the contract rows
    # below measure QUERY cost, not a bundled index build
    t0 = time.perf_counter()
    entrymod._physical_searcher(spark, sf_dir)
    results["physical_index_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    entrymod._physical_searcher(spark, sf_dir, codec="compact")
    results["physical_index_build_compact"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    entrymod._incremental_searcher(spark, sf_dir)
    results["incremental_pipeline_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    entrymod._deleted_searcher(spark, sf_dir)
    results["deleted_index_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    entrymod._delta_searcher(spark, sf_dir)
    results["delta_reindex_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    entrymod._ann_index_root(spark, sf_dir)
    results["ann_index_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    entrymod._ivf_index_root(spark, sf_dir)
    results["ivf_index_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    entrymod._positions_root(spark, sf_dir)
    results["positions_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    entrymod._positions_incr_root(spark, sf_dir)
    results["positions_incr_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    entrymod._stopword_searcher(spark, sf_dir)
    results["stopword_index_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    entrymod._federated(spark, sf_dir)
    results["federated_index_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    entrymod._snapshot_searcher(spark, sf_dir)
    results["snapshot_build_verify"] = round(time.perf_counter() - t0, 3)

    # Contract rows: N_PASSES INTERLEAVED passes over the whole query
    # list, report the MEDIAN per row. One-draw timings on this VM are
    # noise-dominated (2-5x neighbor swings — round 3 recorded a 13x
    # swing on a byte-identical code path); interleaving means drift
    # within a pass hits every row alike, and the median drops the
    # outlier draw. Pass 1 additionally pays one-time plan/cache
    # materialization (persisted prepared corpus, logical index), which
    # the median also absorbs. min/max per row are reported alongside so
    # a regression can be told from a noise spike.
    N_PASSES = 3
    contract = dict(entrymod.queries())
    # the capped candidate-generation form recommended for real corpora,
    # timed next to the uncapped exact oracle (queries()['ngram_jaccard'])
    from data_text_search_spark.operators import dedup

    def _ngram_capped(spark_, sf_dir_):
        return dedup.ngram_jaccard_pairs(
            entrymod._documents(spark_, sf_dir_), threshold=0.5,
            max_shingle_df=50)

    contract["ngram_jaccard_capped"] = _ngram_capped
    # cert rows reuse (not recompute) their exact counterparts within a
    # pass: seed the persisted pair sets OUTSIDE the timed window right
    # before the first cert that needs them, and clear at pass end so the
    # next pass's ngram_jaccard/cosine_dup_pairs rows stay fresh timings
    CERT_SEEDS = {"minhash_lsh_cert": "ngram", "minhash_recall_cert": "ngram",
                  "lsh_dup_cert": "cos", "semdedup_cert": "cos"}
    # (lsh_dup_recall_cert seeds nothing: its input is the embeddings
    # UNION planted copies, so no exact pair set is shared)
    samples: dict[str, list[float]] = {name: [] for name in contract}
    for _ in range(N_PASSES):
        for name, fn in contract.items():
            if name in CERT_SEEDS:
                entrymod.seed_pair_cache(spark, sf_dir, CERT_SEEDS[name])
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples[name].append(time.perf_counter() - t0)
        entrymod.clear_pair_cache()
    queries_minmax: dict[str, list[float]] = {}
    for name, ts in samples.items():
        results[name] = round(sorted(ts)[len(ts) // 2], 3)
        queries_minmax[name] = [round(min(ts), 3), round(max(ts), 3)]

    # --- ANN recall evidence (multi-probe persisted index vs exact) ---
    # recall of ann_index_search against the exact HIGH-SIMILARITY
    # neighbors (cosine >= 0.5) of held-out query vectors — what a
    # random-hyperplane LSH index promises to find (near-neighbors; a
    # weakly-similar cos~0.2 "top-20" entry is far in hamming by design).
    # Recorded per round so recall regressions surface like perf ones.
    # the driver's embeddings table has no non-trivial high-cosine pairs
    # (2nd-best neighbor ~0.29), so recall is measured on PLANTED
    # near-dups: noisy copies (cos ~0.97) of 20 base vectors are unioned
    # in, a fresh index built, and each base vector must retrieve its
    # copy through the multi-probe pruned scan.
    from data_text_search_spark.operators import similarity
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    base = emb.orderBy("vec_id").limit(20).collect()
    rs2 = np.random.RandomState(7)
    planted, queries_v = [], []
    for i, r in enumerate(base):
        v = np.asarray(r["embedding"], dtype=np.float64)
        noisy = v + rs2.standard_normal(v.size) * 0.15 * np.linalg.norm(v) / np.sqrt(v.size)
        planted.append((10_000_000 + i, [float(x) for x in noisy]))
        queries_v.append((10_000_000 + i, [float(x) for x in v]))
    big_emb = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(planted,
                              "vec_id long, embedding array<double>"))
    ann_probe_root = "/tmp/bench_ann_probe"
    shutil.rmtree(ann_probe_root, ignore_errors=True)
    similarity.build_ann_index(big_emb, ann_probe_root)
    found = 0
    probed = []
    for pid, qv in queries_v:
        hits = {r["vec_id"] for r in similarity.ann_index_search(
            spark, ann_probe_root, qv, k=5).collect()}
        found += int(pid in hits)
        probed.append(len(similarity.probe_buckets(qv))
                      / 2 ** similarity.BUCKET_BITS)
    ann_recall = round(found / len(queries_v), 4)
    ann_probed_fraction = round(sum(probed) / max(len(probed), 1), 4)

    # same planted-near-dup protocol for the IVF index (nprobe 8/64 =
    # 12.5% of cells — the same probed fraction the LSH path uses)
    ivf_probe_root = "/tmp/bench_ivf_probe"
    shutil.rmtree(ivf_probe_root, ignore_errors=True)
    similarity.build_ivf_index(big_emb, ivf_probe_root, n_centroids=64)
    ivf_found = 0
    for pid, qv in queries_v:
        hits = {r["vec_id"] for r in similarity.ivf_search(
            spark, ivf_probe_root, qv, k=5, nprobe=8).collect()}
        ivf_found += int(pid in hits)
    ivf_recall = round(ivf_found / len(queries_v), 4)
    emb.unpersist()

    # posting-payload evidence from the indexes already built above: the
    # bench's own f64 index and the contract's compact index
    # (bm25_topk_compact built it) — no redundant re-builds
    from data_text_search_spark.operators.index_build import load_manifest
    bpp_f64 = load_manifest(root)["groups_state"]["0"]["bytes_per_posting"]
    s_c = entrymod._physical_searcher(spark, sf_dir, codec="compact")
    bpp_c = s_c.manifest["groups_state"]["0"]["bytes_per_posting"]

    total = round(sum(results.values()), 3)
    # the driver captures only the last ~2,000 chars of output and
    # parses the JSON line from that window — round 4's line grew past
    # it (queries_minmax) and the round's metrics were lost
    # (parsed: null). Budget discipline for stdout:
    #  - CONTRACT rows only in "queries" (2-decimal medians); the
    #    build/diagnostic timings ride their own headline fields and the
    #    full-precision copy lives in the BENCH/ side file
    #  - compact separators (no spaces) — ~2 bytes/element
    #  - a hard assertion below fails the bench loudly if the line ever
    #    approaches the window again, instead of silently losing a round
    contract_names = set(contract)
    out = {
        "metric": "bm25_engine_total_sec",
        "value": total,
        "unit": "sec",
        # adaptive precision keeps the line bounded as rows grow: a
        # 3-digit outlier costs 5 chars at 0 dp instead of 6-7 at 2 dp,
        # and sub-10s rows (where regressions hide) keep 2 dp; the full
        # 3-decimal copy always lives in the BENCH/ side file.
        # stdout carries the rows whose per-round trend is the regression
        # signal; two classes are side-file-only (BENCH/bench_details_*):
        #  - *_cert rows: their signal is correctness (CORRECTNESS_rN),
        #    not timing
        #  - STDOUT_OMIT: single-pass JVM-expression analytics/curation
        #    rows (<1 s, no kernel, no index) that have never moved
        #    across rounds — trend-tracking them in the capture window
        #    crowds out the kernel rows where regressions actually hide
        "queries": {k: round(v, 2 if v < 10 else 1 if v < 100 else 0)
                    for k, v in results.items()
                    if k in contract_names and not k.endswith("_cert")
                    and k not in STDOUT_OMIT},
        "sf": float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1),
        "corpus_docs": n_docs,
        "build_docs_per_sec": round(n_docs / build_sec, 1),
        "query_qps": round(len(QUERIES) / query_sec, 2),
        "query_qps_batch1000": round(1000 / big_sec, 1),
        "ann_recall": ann_recall,
        "ivf_recall": ivf_recall,
        "cpus": cpus,
    }
    details = dict(out)
    details.update({
        "queries": results,  # full 3-decimal precision in the side file
        "queries_minmax": queries_minmax,
        "contract_passes": N_PASSES,
        "bytes_per_posting_f64": bpp_f64,
        "bytes_per_posting_compact": bpp_c,
        "ann_probed_fraction": ann_probed_fraction,
    })
    # side files are namespaced by SF; "latest" tracks only the headline
    # sf0.1 runs (an sf0.001 smoke once clobbered the round's sf0.1
    # details — commit 8b6c701)
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    with open(os.path.join(bench_dir,
                           f"bench_details_{sf_name}.json"), "w") as f:
        json.dump(details, f, indent=1, sort_keys=True)
    if out["sf"] >= 0.1:
        with open(os.path.join(bench_dir,
                               "bench_details_latest.json"), "w") as f:
            json.dump(details, f, indent=1, sort_keys=True)
    line = json.dumps(out, separators=(",", ":"))
    assert len(line) <= 1800, (
        f"bench stdout line {len(line)} B — would overflow the driver's "
        "~2000-char tail capture; trim queries or coarsen precision")
    print(line)


if __name__ == "__main__":
    main()
