#!/usr/bin/env python
"""spark-submit entry point: the LLM-training-data corpus pipeline.

Chains the training-data operators over a parquet corpus, parquet in /
parquet out — the first touch of a pipeline user (the search jobs cover
indexing; this one covers corpus curation):

1. exact dedup      — sha256-fingerprint hash-groupBy; keeps the
                      canonical (min-id) doc of each duplicate group
2. near-dup dedup   — MinHash-LSH pairs (banded, candidate-capped);
                      the higher id of every verified pair is dropped
                      (greedy, deterministic — at threshold ~0.5+ the
                      pair graph is dominated by tight clusters)
3. text analytics   — language-ID, quality signals, token counts,
                      content fingerprint, joined into one row per doc
4. quality filter   — optional min/max token bounds + stopword-ratio
                      floor (the standard cheap corpus gate)

Cluster usage:

    zip -r engine.zip data_text_search_spark
    spark-submit --py-files engine.zip jobs/corpus_pipeline.py \
        --input s3a://bucket/corpus/ --output s3a://bucket/clean/ \
        --text-col content --near-dup-threshold 0.5

Local smoke:

    python jobs/corpus_pipeline.py --input /tmp/docs --output /tmp/clean

Scale shape: every stage is a hash aggregate, a banded candidate join
or a JVM-expression projection — no all-pairs work, no per-row Python
(MinHash signatures are one vectorized pandas UDF over shingle-hash
arrays). The near-dup stage is the only shuffle-heavy one and is
bounded by the LSH bucket cap.
"""

from __future__ import annotations

import argparse
import json


def run_pipeline(spark, corpus, text_col: str = "text",
                 id_col: str = "doc_id", near_dup_threshold: float | None = 0.5,
                 min_tokens: int | None = None, max_tokens: int | None = None,
                 min_stop_ratio: float | None = None,
                 lsh_bucket_cap: int = 100_000,
                 near_dup_mode: str = "pair",
                 sample_fraction: float | None = None,
                 split_fractions: dict[str, float] | None = None,
                 scrub: bool = False,
                 code_quality_gate: bool = False,
                 max_dup_line_frac: float | None = None,
                 decontam_eval: "DataFrame | None" = None,
                 decontam_span: int = 13,
                 remove_dup_spans: int | None = None,
                 embeddings: "DataFrame | None" = None,
                 semantic_threshold: float | None = None,
                 semantic_clusters: int = 64):
    """Returns (cleaned DataFrame with analytics columns, stats dict)."""
    from pyspark.sql import functions as F

    from data_text_search_spark.operators import dedup, textstats

    stats: dict[str, int] = {"input_docs": corpus.count()}
    df = corpus

    # 0. optional deterministic subsample (content-addressed — the same
    #    rows every run / cluster size; how you debug a 100 TB pipeline
    #    at 1% without the sample drifting under you)
    if sample_fraction is not None and sample_fraction < 1.0:
        if sample_fraction <= 0.0:
            raise ValueError(
                f"sample_fraction must be in (0, 1], got {sample_fraction}")
        from data_text_search_spark.operators import sampling
        df = sampling.hash_sample(df, sample_fraction, id_col=id_col)
        stats["after_sample"] = df.count()

    # 0.5 optional PII/noise scrub — BEFORE dedup, so two documents
    #     that differ only in redacted spans (emails, ticket URLs)
    #     collapse into one exact-dup group
    if scrub:
        from data_text_search_spark.operators import curation
        # inline the chain (withColumn) instead of joining scrub_text's
        # (id, scrubbed) back on id — that join is a corpus-sized
        # self-join that recomputes the whole regex chain a second time
        scrub_col, counts = curation.scrub_exprs(text_col)
        red_total = counts[0]
        for c in counts[1:]:
            red_total = red_total + c
        red = df.select(
            F.sum(red_total.cast("long")).alias("s")).first()["s"]
        stats["scrub_redactions"] = int(red or 0)
        df = df.withColumn(text_col, scrub_col)

    # 1. exact dedup — keep the canonical representative per group
    groups = dedup.exact_dup_groups(df, text_col=text_col, id_col=id_col)
    keep = groups.filter(F.col("doc_id") == F.col("canonical_doc_id")) \
                 .select(F.col("doc_id").alias(id_col))
    df = df.join(keep, id_col)
    stats["after_exact_dedup"] = df.count()

    # 2. near-dup dedup over verified LSH pairs — two policies:
    #    'pair'    — drop the higher id of every pair (greedy; keeps
    #                more data, guarantees no surviving pair)
    #    'cluster' — resolve pairs into connected components and keep
    #                only the smallest id per component (transitive;
    #                one survivor per boilerplate family even when the
    #                family is a chain the greedy rule keeps 2+ of)
    if near_dup_threshold is not None:
        pairs = dedup.minhash_lsh_pairs(
            df, text_col=text_col, id_col=id_col,
            threshold=near_dup_threshold, bucket_cap=lsh_bucket_cap)
        if near_dup_mode == "cluster":
            df = dedup.dedup_keep_canonical(df, pairs, id_col=id_col)
        else:
            drop = pairs.select(F.col("doc_b").alias(id_col)).distinct()
            df = df.join(drop, id_col, "left_anti")
        stats["after_near_dedup"] = df.count()

    # 2.5 optional SEMANTIC dedup (SemDeDup shape) — an embeddings
    #     table (id, vector) keyed like the corpus: k-means-bounded
    #     intra-cluster exact-cosine pairs, resolved with the SAME
    #     keep-canonical policy as stage 2's cluster mode (paraphrase
    #     families that lexical shingles miss)
    if embeddings is not None and semantic_threshold is not None:
        from data_text_search_spark.operators import similarity
        pairs = similarity.semdedup_pairs(
            embeddings, threshold=semantic_threshold,
            n_clusters=semantic_clusters, id_col=embeddings.columns[0],
            vec_col=embeddings.columns[1])
        pairs = pairs.select(F.col("id_a").alias("doc_a"),
                             F.col("id_b").alias("doc_b"))
        df = dedup.dedup_keep_canonical(df, pairs, id_col=id_col)
        stats["after_semantic_dedup"] = df.count()

    # 2.7 optional train/test decontamination — any document sharing a
    #     verbatim decontam_span-token window with the eval set is
    #     dropped (GPT-3 appendix-C rule); runs AFTER dedup so one
    #     leaked boilerplate family costs one flagged survivor
    if decontam_eval is not None:
        from data_text_search_spark.operators import curation
        df = curation.decontaminate(df, decontam_eval, span=decontam_span,
                                    text_col=text_col, id_col=id_col)
        stats["after_decontam"] = df.count()

    # 2.8 optional surgical duplicate-span REMOVAL — instead of (or on
    #     top of) dropping whole near-dup documents, excise passages
    #     duplicated across >= 2 docs, keeping each passage once in its
    #     canonical owner (Lee et al. exact-substring dedup); rewrites
    #     text_col in place on the tokenized view
    # code-shaped gates (step 4.5) must read the ORIGINAL line
    # structure: the span-removal rewrite below re-joins kept tokens
    # with spaces, so post-rewrite text is one long line — code_quality
    # would then drop almost everything (avg-line-length rule) and the
    # Gopher dup-line gate would pass everything (no repeated lines)
    structure_df = df
    if remove_dup_spans is not None:
        from data_text_search_spark.operators import curation
        # persisted: the stats aggregate and the rewrite join both read
        # it — without the persist the whole span-hash aggregate chain
        # would execute twice (disk-backed, so corpus-sized is fine)
        cleaned = curation.remove_duplicate_spans(
            df, span=remove_dup_spans, text_col=text_col,
            id_col=id_col).persist()
        stats["dup_span_tokens_removed"] = int(
            cleaned.agg(F.sum("n_tokens_removed")).first()[0] or 0)
        df = (df.drop(text_col)
              .join(cleaned.select(id_col,
                                   F.col("text_clean").alias(text_col)),
                    id_col))

    # 3. analytics — one broadcast-free join chain on the id
    lang = textstats.lang_id(df, text_col=text_col, id_col=id_col)
    qual = textstats.quality(df, text_col=text_col, id_col=id_col)
    cnt = textstats.token_count(df, text_col=text_col, id_col=id_col) \
                   .select(id_col, "n_bpe_tokens", "n_chars")
    fp = textstats.fingerprint(df, text_col=text_col, id_col=id_col)
    out = (df.join(lang, id_col).join(qual, id_col)
             .join(cnt, id_col).join(fp, id_col))

    # 4. quality gate
    if min_tokens is not None:
        out = out.filter(F.col("n_tokens") >= min_tokens)
    if max_tokens is not None:
        out = out.filter(F.col("n_tokens") <= max_tokens)
    if min_stop_ratio is not None:
        out = out.filter(F.col("stop_ratio") >= min_stop_ratio)

    # 4.5 optional code-shaped gates (StarCoder keep rule; Gopher
    #     dup-line fraction) — each one more narrow analytics join on
    #     the id, integer/exact signals
    if code_quality_gate or max_dup_line_frac is not None:
        from data_text_search_spark.operators import curation
        if code_quality_gate:
            cq = (curation.code_quality(structure_df, text_col=text_col,
                                        id_col=id_col)
                  .select(id_col, "keep", "max_line_len"))
            out = out.join(cq, id_col).filter(F.col("keep")).drop("keep")
            stats["after_code_quality"] = out.count()
        if max_dup_line_frac is not None:
            rep = (curation.repetition_stats(structure_df,
                                             text_col=text_col,
                                             id_col=id_col,
                                             include_bigrams=False)
                   .select(id_col, "line_chars", "dup_line_chars"))
            out = (out.join(rep, id_col)
                   .filter(F.col("dup_line_chars")
                           <= max_dup_line_frac * F.col("line_chars")))
            stats["after_dup_line_gate"] = out.count()

    # 5. optional deterministic split column (train/val/test) — assigned
    #    AFTER dedup/filtering so near-dups can't straddle splits via a
    #    surviving twin, and stable under future corpus growth
    if split_fractions:
        from data_text_search_spark.operators import sampling
        out = sampling.hash_split(out, split_fractions, id_col=id_col)
    return out, stats


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet corpus path/glob")
    ap.add_argument("--output", required=True, help="output parquet path")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--near-dup-threshold", type=float, default=0.5,
                    help="MinHash-LSH Jaccard threshold; negative disables "
                         "the near-dup stage")
    ap.add_argument("--min-tokens", type=int, default=None)
    ap.add_argument("--max-tokens", type=int, default=None)
    ap.add_argument("--min-stop-ratio", type=float, default=None)
    ap.add_argument("--lsh-bucket-cap", type=int, default=100_000)
    ap.add_argument("--near-dup-mode", choices=["pair", "cluster"],
                    default="pair",
                    help="'pair' drops the higher id per LSH pair; "
                         "'cluster' keeps one canonical doc per "
                         "connected component (transitive)")
    ap.add_argument("--sample", type=float, default=None,
                    help="deterministic content-addressed input "
                         "subsample fraction (same rows every run)")
    ap.add_argument("--split", default=None,
                    help="add a deterministic split column, e.g. "
                         "'train=0.8,val=0.1,test=0.1'")
    ap.add_argument("--scrub", action="store_true",
                    help="redact URLs/emails/IPs/long digit runs "
                         "(before dedup, so docs differing only in "
                         "redacted spans collapse)")
    ap.add_argument("--code-quality-gate", action="store_true",
                    help="drop files failing the StarCoder-style keep "
                         "rule (alpha density, line-length shape)")
    ap.add_argument("--max-dup-line-frac", type=float, default=None,
                    help="drop docs whose duplicated-line chars exceed "
                         "this fraction of total line chars (Gopher)")
    ap.add_argument("--decontam-eval", default=None,
                    help="parquet path of an eval/benchmark set; any doc "
                         "sharing a verbatim --decontam-span token window "
                         "with it is dropped (GPT-3 13-gram rule)")
    ap.add_argument("--decontam-span", type=int, default=13)
    ap.add_argument("--embeddings", default=None, metavar="PARQUET",
                    help="(id, vector) table keyed like --id-col: "
                         "enables the semantic-dedup stage")
    ap.add_argument("--semantic-threshold", type=float, default=None,
                    help="SemDeDup cosine threshold (needs --embeddings)")
    ap.add_argument("--semantic-clusters", type=int, default=64)
    ap.add_argument("--remove-dup-spans", type=int, default=None,
                    metavar="SPAN",
                    help="excise cross-doc duplicated SPAN-token windows "
                         "(kept once in their canonical owner) instead of "
                         "only dropping whole near-dup docs")
    ap.add_argument("--cores", type=int, default=None,
                    help="local mode cores (ignored under spark-submit)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from data_text_search_spark.session import get_spark
        spark = get_spark(app_name="corpus_pipeline", cores=args.cores)

    corpus = spark.read.parquet(args.input)
    thr = args.near_dup_threshold if args.near_dup_threshold >= 0 else None
    out, stats = run_pipeline(
        spark, corpus, text_col=args.text_col, id_col=args.id_col,
        near_dup_threshold=thr, min_tokens=args.min_tokens,
        max_tokens=args.max_tokens, min_stop_ratio=args.min_stop_ratio,
        lsh_bucket_cap=args.lsh_bucket_cap,
        near_dup_mode=args.near_dup_mode,
        sample_fraction=args.sample,
        split_fractions=(
            {kv.split("=")[0]: float(kv.split("=")[1])
             for kv in args.split.split(",")} if args.split else None),
        scrub=args.scrub,
        code_quality_gate=args.code_quality_gate,
        max_dup_line_frac=args.max_dup_line_frac,
        decontam_eval=(spark.read.parquet(args.decontam_eval)
                       if args.decontam_eval else None),
        decontam_span=args.decontam_span,
        remove_dup_spans=args.remove_dup_spans,
        embeddings=(spark.read.parquet(args.embeddings)
                    if args.embeddings else None),
        semantic_threshold=args.semantic_threshold,
        semantic_clusters=args.semantic_clusters)
    out.write.mode("overwrite").parquet(args.output)
    stats["output_docs"] = spark.read.parquet(args.output).count()
    print(json.dumps(stats))
    return stats


if __name__ == "__main__":
    main()
