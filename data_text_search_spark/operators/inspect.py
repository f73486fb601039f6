"""Index introspection — the operational `_cat/indices` + `EXPLAIN`
surface a long-lived search deployment needs (the reference app shows
its index state in the UI; re-expressed here as data, not widgets).

Everything answers from manifest fields, parquet FOOTERS (metadata-only
counts/aggregates) and filesystem metadata — no posting decode, no
corpus scan, so both calls are safe against a 100-TB index.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_text_search_spark.config import IndexPaths
from data_text_search_spark.operators.index_build import (
    committed_doc_stats_paths,
    committed_term_stats_paths,
    committed_tombstone_paths,
    load_manifest,
)
from data_text_search_spark.sources import fsio


def index_info(spark: SparkSession, root: str) -> dict:
    """One-call operational summary of a persisted index: document /
    vocabulary / posting counts (live + deleted), per-component byte
    sizes, segment + tombstone + drift state, and the build's recorded
    metrics. Cheap by construction: manifest JSON, footer-only parquet
    aggregates (count/sum push to metadata + column stats), and one
    recursive size listing per component."""
    m = load_manifest(root)
    if not m or not m.get("complete"):
        raise ValueError(f"no complete index at {root}")
    paths = IndexPaths(root)
    ts = spark.read.parquet(*committed_term_stats_paths(root, m))
    if "pruned" not in ts.columns:
        ts = ts.withColumn("pruned", F.lit(False))
    vocab = ts.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("pruned"), 1).otherwise(0)).alias("pruned"),
        F.sum("df").alias("postings")).collect()[0]
    n_docs = int(m["n_docs"])
    deleted = int(m.get("deleted_docs", 0))
    comp_dirs = {
        "postings": paths.postings,
        "term_stats": paths.term_stats,
        "doc_stats": paths.doc_stats,
        "tokenized": paths.tokenized,
        "tombstones": f"{root}/tombstones",
    }
    bytes_by = {k: fsio.du(p, spark) for k, p in comp_dirs.items()}
    # delta-segment sidecars (their postings already live under
    # postings/group=segN and are counted there)
    bytes_by["segment_sidecars"] = sum(
        fsio.du(f"{root}/{d}", spark)
        for d in ("tokenized_segs", "term_stats_segs", "doc_stats_segs"))
    live_postings = int(vocab["postings"] or 0)
    return {
        "root": root,
        "n_docs": n_docs,
        "live_docs": n_docs - deleted,
        "deleted_docs": deleted,
        "drift": m.get("drift", 0.0),
        "needs_rebuild": bool(m.get("needs_rebuild", False)),
        "avgdl": m["avgdl"],
        "vocab_size": int(vocab["n"]),
        "pruned_terms": int(vocab["pruned"] or 0),
        "n_postings": live_postings,
        "bytes_per_posting": (round(bytes_by["postings"] / live_postings, 2)
                              if live_postings else None),
        "segments": len(m.get("segments", [])),
        "tombstone_files": len(m.get("tombstones", [])),
        "shards": m["shards"],
        "term_buckets": m["term_buckets"],
        "config": dict(m["config"]),
        "bytes": bytes_by,
        "total_bytes": sum(bytes_by.values()),
        "metrics": dict(m.get("metrics", {})),
    }


def segment_info(spark: SparkSession, root: str) -> list[dict]:
    """Per-delta-segment detail (the merge-policy input): id, docs,
    new terms, doc_stats rows — straight from the manifest plus one
    footer count per segment's doc_stats."""
    m = load_manifest(root)
    if not m or not m.get("complete"):
        raise ValueError(f"no complete index at {root}")
    return [{"seg": s["segment"], "n_docs": s.get("n_docs"),
             "new_terms": s.get("new_terms")} for s in m.get("segments", [])]


def doc_length_histogram(spark: SparkSession, root: str,
                         n_buckets: int = 16) -> list[dict]:
    """Log2-bucketed doc-length histogram from doc_stats (one narrow
    column scan — the only call here that reads real data rows; ~8 B/doc
    and column-pruned, still no posting or corpus touch). The input to
    avgdl sanity checks and shard-skew reasoning."""
    m = load_manifest(root)
    if not m or not m.get("complete"):
        raise ValueError(f"no complete index at {root}")
    ds = spark.read.parquet(*committed_doc_stats_paths(root, m))
    tpaths = committed_tombstone_paths(root, m)
    if tpaths:
        ds = ds.join(spark.read.parquet(*tpaths).select("doc_id"),
                     "doc_id", "left_anti")
    bucket = F.least(F.floor(F.log2(F.greatest(F.col("doc_len"),
                                               F.lit(1)))).cast("int"),
                     F.lit(n_buckets - 1))
    rows = (ds.select(bucket.alias("b"))
            .groupBy("b").agg(F.count("*").alias("n_docs"))
            .orderBy("b").collect())
    return [{"min_len": 2 ** r["b"],
             "max_len": 2 ** (r["b"] + 1) - 1,
             "n_docs": r["n_docs"]} for r in rows]
