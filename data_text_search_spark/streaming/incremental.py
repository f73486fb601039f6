"""Incremental index maintenance (segment model) + streaming ingest.

The reference rebuilds its in-RAM index from scratch per session; the
north rule asks for checkpoint-resumable builds (done in index_build).
This module adds the natural next capability for a living corpus:
appending document *segments* without a full rebuild, Lucene-style.

Semantics and their honesty budget:
- A delta segment is encoded under the CURRENT global statistics
  (N, avgdl, idf from the manifest). Existing postings are not
  re-scored, and delta impacts use slightly stale stats — exactly the
  approximation long-lived search engines make between merges.
- Terms unseen by the base index get idf computed from the updated
  total N and their delta df, and are appended to term_stats (so they
  are queryable immediately).
- The manifest tracks cumulative drift = added_docs / total_docs; past
  `rebuild_threshold` the index is marked `needs_rebuild`; exact parity
  is restored with `build_index(..., resume=False)` over the full
  corpus, which wipes the index root including all segment dirs (a
  resume=True call on a complete manifest is intentionally a no-op).

`stream_ingest` wires this into Structured Streaming: a file-source
readStream over a corpus directory, foreachBatch → add_documents, so
new parquet drops become queryable segments with checkpointed exactly-
once batch tracking.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_text_search_spark.config import BM25Config, IndexPaths
from data_text_search_spark.operators.bm25_exhaustive import ingest
from data_text_search_spark.operators.index_build import (
    POSTINGS_SCHEMA,
    _encode_shard_factory,
    _write_manifest_atomic,
    load_manifest,
)
from data_text_search_spark.functions.text import tokenize_tf_pandas_udf


def add_documents(spark: SparkSession, root: str, new_corpus: DataFrame,
                  text_col: str = "content", id_col: str | None = None,
                  rebuild_threshold: float = 0.2,
                  batch_key: str | None = None) -> dict:
    """Append a delta segment of documents to an existing index.

    `batch_key`: idempotency token — a key already recorded in the
    manifest is skipped (foreachBatch delivers at-least-once; a replayed
    micro-batch must not double-ingest its documents).

    Note: an IndexSearcher snapshots the postings file listing at
    construction; re-open it after appends to see new segments.
    """
    paths = IndexPaths(root)
    manifest = load_manifest(root)
    if not manifest or not manifest.get("complete"):
        raise ValueError(f"no complete index at {root}")
    if batch_key is not None and batch_key in manifest.get("applied_batches", []):
        return manifest
    cfg = manifest["config"]
    shards = manifest["shards"]
    tp = manifest["term_buckets"]
    n_old, avgdl = manifest["n_docs"], manifest["avgdl"]
    seg_id = len(manifest.get("segments", []))

    t0 = time.perf_counter()
    prep = ingest(new_corpus, text_col=text_col, id_col=id_col,
                  clean=cfg["clean"], materialize_tokens=False)
    # pairs (pre-explode) is the unit of truth: zero-token docs are rows
    # here (pairs=[], doc_len=0) and must reach n_docs/doc_stats, exactly
    # like the base build
    pairs_df = (prep.select(
        "doc_id", tokenize_tf_pandas_udf("prepared").alias("s"),
        F.pmod(F.xxhash64("doc_id"), F.lit(shards)).cast("int").alias("shard"))
        .select("doc_id", "shard", F.col("s.pairs").alias("pairs"),
                F.col("s.doc_len").alias("doc_len"))).persist()
    row = pairs_df.agg(F.count("*").alias("n"),
                       F.countDistinct("doc_id").alias("nd")).first()
    n_new = int(row["n"] or 0)
    if int(row["nd"] or 0) != n_new:
        pairs_df.unpersist()
        raise ValueError("delta contains duplicate doc_ids")
    existing = spark.read.parquet(paths.doc_stats).select("doc_id")
    n_dup = pairs_df.join(existing, "doc_id").count()
    if n_dup:
        pairs_df.unpersist()
        raise ValueError(
            f"{n_dup} delta doc_ids already exist in the index — re-adding "
            "would double their postings; dedup upstream or rebuild")
    n_total = n_old + n_new

    td = (pairs_df.select("doc_id", "doc_len", "shard",
                          F.explode("pairs").alias("p"))
          .select("doc_id", "doc_len", "shard",
                  F.col("p.term").alias("term"), F.col("p.tf").alias("tf")))

    # anti-join against ALL terms (incl. alpha-pruned ones, which are
    # flagged, not deleted) — a pruned hot term in the delta must stay
    # pruned, not resurrect with a delta-only df and inflated IDF
    full_stats = spark.read.parquet(paths.term_stats)
    delta_terms = (td.groupBy("term").agg(F.count("*").alias("df"))
                   .join(full_stats.select("term"), "term", "left_anti")
                   .withColumn("idf",
                               F.log(F.lit(float(n_total)) - F.col("df") + 0.5)
                               - F.log(F.col("df") + 0.5))
                   .withColumn("pruned",
                               ~(F.col("idf") > F.lit(cfg["alpha"])))
                   .withColumn("term_bucket",
                               F.pmod(F.xxhash64("term"), F.lit(tp)).cast("int"))
                   ).persist()
    new_terms = delta_terms.count()
    if new_terms:
        delta_terms.write.mode("append").parquet(paths.term_stats)
    delta_terms.unpersist()
    live_stats = (spark.read.parquet(paths.term_stats)
                  .filter(~F.col("pruned")))

    k1, b = cfg["k1"], cfg["b"]
    enc = (td.join(live_stats.select("term", "idf"), "term")
           .withColumn(
               "impact",
               F.col("idf") * F.col("tf") * F.lit(k1 + 1)
               / (F.col("tf") + F.lit(k1)
                  * (1 - b + b * F.col("doc_len") / F.lit(avgdl))))
           .select("term", "doc_id", "tf", "impact", "shard"))
    kernel = _encode_shard_factory(cfg["block_size"])
    blocks = (enc.groupBy("shard").applyInPandas(kernel, schema=POSTINGS_SCHEMA)
              .withColumn("term_bucket",
                          F.pmod(F.xxhash64("term"), F.lit(tp)).cast("int"))
              .repartition(tp, "term_bucket")
              .sortWithinPartitions("term", "shard", "block_id"))
    gdir = f"{paths.postings}/group=seg{seg_id}"
    blocks.write.mode("overwrite").partitionBy("term_bucket").parquet(gdir)
    pairs_df.select("doc_id", "doc_len", "shard").write.mode(
        "append").parquet(paths.doc_stats)
    pairs_df.unpersist()

    drift = manifest.get("drift", 0.0) + (n_new / n_total if n_total else 0.0)
    manifest.setdefault("segments", []).append({
        "segment": seg_id, "n_docs": n_new, "new_terms": int(new_terms),
        "seconds": round(time.perf_counter() - t0, 3)})
    manifest["n_docs"] = n_total
    manifest["drift"] = round(drift, 6)
    manifest["needs_rebuild"] = drift > rebuild_threshold
    if batch_key is not None:
        manifest.setdefault("applied_batches", []).append(batch_key)
    _write_manifest_atomic(paths.manifest, manifest)
    return manifest


def stream_ingest(spark: SparkSession, root: str, source_dir: str,
                  schema: str, checkpoint: str, text_col: str = "content",
                  id_col: str | None = None):
    """Structured Streaming: file-source corpus directory → per-batch
    delta segments (exactly-once via the stream checkpoint)."""
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # foreachBatch is at-least-once; the manifest-recorded batch key
        # makes a replayed micro-batch a no-op (true exactly-once effect)
        add_documents(spark, root, batch_df, text_col=text_col, id_col=id_col,
                      batch_key=f"{checkpoint}#{batch_id}")

    return (stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
