"""Curation transforms for large-scale training-data pipelines.

Two operators the reference has no analogue for (its scope stops at
search), both pure JVM expressions — narrow transformations with zero
shuffle, zero Python in the plan, so they scale linearly with input
bytes on any cluster:

- ``chunk_documents``: overlapping token-window passage splitting (the
  standard pre-embedding step). Tokenization reuses the engine's pinned
  spec (functions/text.py TOKEN_PATTERN) so chunk boundaries are
  consistent with the search index; the explode is shuffle-free.
- ``scrub_text``: heuristic PII/noise redaction (URLs, emails, IPv4,
  long digit runs) as a fixed chain of regexp_replace steps, plus
  per-step match counts (the curation filter signals).

Pattern dialect: every regex below is spelled to mean the SAME thing in
Java regex (Spark) and RE2 (DuckDB oracle) — explicit ASCII classes
only, no ``\\b`` (Java's word boundary is unicode-aware, RE2's is
ASCII: adjacent non-ASCII letters flip the match), no lookaround (RE2
has none), no ``\\s``/``\\d`` shorthands (engine-dependent sets). Both
oracles in oracle_sql.py use these exact pattern strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_text_search_spark.functions.text import tokenize_expr

# (name, pattern, placeholder) in application order. URL first so
# emails/IPs embedded in URLs are consumed by <URL>; placeholders
# contain no [A-Za-z0-9@:/]-run the later patterns could re-match.
# Greedy trailing punctuation on URLs is accepted (documented heuristic;
# consistent across engines beats natural-language edge polish here).
SCRUB_STEPS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^ \t\n\r\f\x0B]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("num", r"[0-9]{9,}", "<NUM>"),
)


def scrub_text(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, scrubbed, n_url, n_email, n_ip, n_num).

    Each step counts its matches on the text AS THE CHAIN SEES IT (after
    the previous replacements) and then replaces them — so the counts
    are exactly the number of placeholders each step inserted, even when
    patterns overlap (an email inside a URL is one <URL>, not both).
    """
    cur: Column = F.col(text_col).cast("string")
    counts: list[Column] = []
    for name, pat, repl in SCRUB_STEPS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return df.select(F.col(id_col), cur.alias("scrubbed"), *counts)


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_size: int = 64,
                    overlap: int = 16) -> DataFrame:
    """(doc_id, chunk_id, chunk_text, n_chunk_tokens): overlapping
    token windows of ``chunk_size`` tokens advancing by
    ``chunk_size - overlap``.

    Every token lands in at least one chunk; consecutive chunks share
    exactly ``overlap`` tokens except possibly the last (which ends at
    the document end). A document with <= chunk_size tokens (including
    an empty one) is exactly one chunk. Deterministic: chunk_id i covers
    token positions [i*stride+1, i*stride+chunk_size] (1-based).

    Plan: tokenize (projection) -> explode over sequence(0, n_chunks-1)
    -> slice/array_join — all narrow, whole-stage-codegen'd; at 100 TB
    this is a map-only pass whose output partitioning follows the input.
    """
    if overlap < 0 or overlap >= chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got "
                         f"overlap={overlap} chunk_size={chunk_size}")
    stride = chunk_size - overlap
    toks = tokenize_expr(text_col)
    base = df.select(F.col(id_col), toks.alias("_toks"),
                     F.size(toks).alias("_n"))
    n_chunks = (
        F.when(F.col("_n") <= chunk_size, F.lit(1))
        .otherwise(F.ceil((F.col("_n") - chunk_size) / F.lit(float(stride)))
                   .cast("int") + 1))
    exploded = base.select(
        id_col, "_toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"))
    chunk = F.slice(F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_size)
    return exploded.select(
        id_col,
        F.col("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_chunk_tokens"),
    )
