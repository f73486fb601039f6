"""Curation transforms for large-scale training-data pipelines.

Operators the reference has no analogue for (its scope stops at
search); the first four are pure JVM expressions — narrow
transformations with zero shuffle, zero Python in the plan, so they
scale linearly with input bytes on any cluster:

- ``chunk_documents``: overlapping token-window passage splitting (the
  standard pre-embedding step). Tokenization reuses the engine's pinned
  spec (functions/text.py TOKEN_PATTERN) so chunk boundaries are
  consistent with the search index; the explode is shuffle-free.
- ``scrub_text``: heuristic PII/noise redaction (URLs, emails, IPv4,
  long digit runs) as a fixed chain of regexp_replace steps, plus
  per-step match counts (the curation filter signals).
- ``code_quality``: StarCoder-style per-file filter signals for a
  source-code corpus (line-length shape, alnum/alpha density) — every
  signal an exact integer and the keep flag pure integer arithmetic, so
  the result is bit-identical across engines (no float thresholds).
- ``repetition_stats``: Gopher-style per-document repetition signals —
  duplicated-line characters (narrow, higher-order functions only) and
  the most frequent token bigram (one hash aggregate keyed by
  (doc, gram) — partial map-side combine applies, key cardinality is
  bounded by corpus token count, no skew beyond document size).
- ``duplicate_spans``: cross-document exact substring duplication in
  the style of Lee et al. 2021 ("Deduplicating Training Data Makes
  Language Models Better") at token-span granularity: every k-token
  span is content-addressed (64-bit xxhash64 of the token slice —
  see _span_hash_expr) and a span position counts as
  duplicated when the same span text appears in >= 2 distinct
  documents. Inverted-index shape — span-hash aggregate + semi-join
  back, never a pairwise join — so the cost is O(total positions), and
  the hottest boilerplate span costs one aggregate cell, not an
  M^2 pair explosion.

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


def scrub_exprs(text_col: str = "text") -> tuple[Column, list[Column]]:
    """The scrub chain as raw column expressions:
    (scrubbed_text, [n_url, n_email, n_ip, n_num] — unaliased).
    For callers that want to inline the chain into an existing
    projection (`withColumn(text_col, scrubbed)`) instead of joining
    scrub_text's (id, scrubbed) output back onto the corpus — at scale
    that join is a corpus-sized self-join that recomputes the whole
    regex chain a second time."""
    cur: Column = F.col(text_col).cast("string")
    counts: list[Column] = []
    for _name, pat, _repl in SCRUB_STEPS:
        # count-only probe: regexp_count runs the same matcher without
        # materializing every matched substring into an array
        counts.append(F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, _repl)
    return cur, counts


def scrub_text(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """(doc_id, scrubbed, n_url, n_email, n_ip, n_num).

    Each step counts its matches on the text AS THE CHAIN SEES IT (after
    the previous replacements) and then replaces them — so the counts
    are exactly the number of placeholders each step inserted, even when
    patterns overlap (an email inside a URL is one <URL>, not both).
    """
    cur, counts = scrub_exprs(text_col)
    named = [c.alias(f"n_{name}") for c, (name, _, _)
             in zip(counts, SCRUB_STEPS)]
    return df.select(F.col(id_col), cur.alias("scrubbed"), *named)


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
    # NULL text must yield one empty chunk, not a vanished document:
    # tokenize(NULL) is NULL, NULL n_chunks makes sequence() NULL and
    # explode() drops the row entirely
    toks = tokenize_expr(F.coalesce(F.col(text_col).cast("string"),
                                    F.lit("")))
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


# StarCoder-ish keep thresholds, spelled as exact integer comparisons
# (4*n_alpha >= n_chars  <=>  alpha fraction >= 0.25, etc.) so the flag
# never rides a float boundary.
MAX_LINE_LEN = 1000
AVG_LINE_LEN = 100
MIN_ALPHA_X4 = 1  # keep iff 4 * n_alpha >= MIN_ALPHA_X4 * n_chars


def code_quality(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_lines, max_line_len, sum_line_len, n_chars, n_alnum,
    n_alpha, keep): per-file quality signals for a source-code corpus.

    The filters follow the published StarCoder/SantaCoder recipe
    (drop files with extreme line lengths or low alphabetic density —
    minified bundles, embedded blobs, auto-generated tables), but every
    emitted signal is an exact integer and ``keep`` is pure integer
    arithmetic:

        keep = n_chars > 0
               AND 4 * n_alpha >= n_chars          (alpha frac >= 0.25)
               AND max_line_len <= 1000
               AND sum_line_len <= 100 * n_lines   (avg line len <= 100)

    Plan: one projection of higher-order-function expressions over the
    line split — narrow, zero shuffle, whole-stage-codegen'd; at corpus
    scale this is a map-only pass.
    """
    t = F.col(text_col).cast("string")
    lines = F.split(t, "\n", -1)
    lens = F.transform(lines, lambda x: F.length(x).cast("long"))
    out = df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.array_max(lens).alias("max_line_len"),
        F.aggregate(lens, F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("sum_line_len"),
        F.length(t).cast("long").alias("n_chars"),
        # counting chars in a class needs no replaced STRING — the
        # round-6-start length(regexp_replace(...)) built two full
        # near-copies of every document just to measure them
        F.regexp_count(t, F.lit("[A-Za-z0-9]")).cast("long")
        .alias("n_alnum"),
        F.regexp_count(t, F.lit("[A-Za-z]")).cast("long").alias("n_alpha"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_chars") > 0)
        & (4 * F.col("n_alpha") >= MIN_ALPHA_X4 * F.col("n_chars"))
        & (F.col("max_line_len") <= MAX_LINE_LEN)
        & (F.col("sum_line_len") <= AVG_LINE_LEN * F.col("n_lines")))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     include_bigrams: bool = True) -> DataFrame:
    """(doc_id, n_lines, line_chars, dup_line_chars, n_grams, top_gram,
    top_gram_count): Gopher-style repetition signals.

    - ``dup_line_chars``: characters in repeat occurrences of a line
      (total line chars minus chars over the distinct line set) — the
      "fraction of characters in duplicated lines" numerator, kept as
      an exact integer. Computed with array higher-order functions:
      narrow, no shuffle.
    - ``top_gram`` / ``top_gram_count``: the document's most frequent
      token bigram (engine tokenizer), tie-broken deterministically by
      (count DESC, gram ASC). One hash aggregate keyed by
      (doc_id, gram) with map-side partial combine, then a per-doc
      window over the (small) per-doc distinct-gram sets. Documents
      with < 2 tokens get ('', 0).

    ``include_bigrams=False`` skips the corpus-wide (doc, gram)
    aggregate entirely (top_gram is '' / 0 for every row) — the line
    columns alone are then a narrow shuffle-free projection, which is
    what a dup-line-fraction gate needs; Catalyst cannot prune the
    bigram subplan away on its own (it can't prove the window-filtered
    join side is unique).
    """
    t = F.col(text_col).cast("string")
    lines = F.split(t, "\n", -1)
    line_chars = F.aggregate(
        F.transform(lines, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    distinct_chars = F.aggregate(
        F.transform(F.array_distinct(lines),
                    lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    toks = tokenize_expr(text_col)
    base = df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        line_chars.alias("line_chars"),
        (line_chars - distinct_chars).alias("dup_line_chars"),
        toks.alias("_toks"),
        F.greatest(F.size(toks) - 1, F.lit(0)).cast("long")
        .alias("n_grams"),
    )
    grams = F.zip_with(
        F.slice(F.col("_toks"), 1, F.size(F.col("_toks")) - 1),
        F.slice(F.col("_toks"), 2, F.size(F.col("_toks")) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b))
    if not include_bigrams:
        return base.drop("_toks").select(
            id_col, "n_lines", "line_chars", "dup_line_chars", "n_grams",
            F.lit("").alias("top_gram"),
            F.lit(0).cast("long").alias("top_gram_count"))
    # (count DESC, gram ASC) argmax as ONE min_by aggregate over the
    # lexicographic struct ordering (-count, gram) — the round-6-start
    # shape ran a row_number window, paying a per-doc sort of the whole
    # (doc, gram) frame just to keep one row per doc
    top = (base.filter(F.col("n_grams") > 0)
           .select(id_col, F.explode(grams).alias("gram"))
           .groupBy(id_col, "gram")
           .agg(F.count(F.lit(1)).alias("c"))
           .groupBy(id_col)
           .agg(F.min_by(
               F.struct(F.col("gram"), F.col("c")),
               F.struct((-F.col("c")).alias("nc"), F.col("gram"))).alias("b"))
           .select(id_col, F.col("b.gram").alias("top_gram"),
                   F.col("b.c").alias("top_gram_count")))
    return (base.drop("_toks")
            .join(top, on=id_col, how="left")
            .select(id_col, "n_lines", "line_chars", "dup_line_chars",
                    "n_grams",
                    F.coalesce("top_gram", F.lit("")).alias("top_gram"),
                    F.coalesce("top_gram_count", F.lit(0)).cast("long")
                    .alias("top_gram_count")))


def _span_hash_expr(span: int):
    """Content-addressed span keys over the standard (_toks, _n)
    projection: 1-based position i owns a 64-bit hash of the
    ``span``-token window starting there — xxhash64 over the token
    SLICE (seed-chained per element, so token boundaries are mixed in
    and no separator string is ever built). The SAME expression feeds
    duplicate_spans, remove_duplicate_spans, and contamination_stats;
    change all of them together or none.

    The round-5 key was substring(md5(array_join(slice)), 1, 16) —
    chosen so the DuckDB twins could compute the byte-identical key.
    But the oracle comparison is on the emitted COUNTS, not the keys,
    and the engine paid for that mirroring on every position: build a
    ~50-char string, run md5, keep a 16-char shuffle key. xxhash64 over
    the slice does no string work and shuffles an 8-byte long. The two
    keys agree on every count unless a 64-bit collision differs between
    the families: both are 64-bit content addresses, so either engine
    merges two distinct spans with probability ~n²/2^65 (≈1e-8 at the
    driver's correctness SFs) — the same collision class the md5 prefix
    already accepted, just no longer mirrored pairwise."""
    return F.transform(
        F.sequence(F.lit(1), F.col("_n") - (span - 1)),
        lambda i: F.xxhash64(F.slice(F.col("_toks"), i, span)))


def remove_duplicate_spans(df: DataFrame, span: int = 8,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(doc_id, text_clean, n_tokens, n_tokens_removed): excise
    cross-document duplicated content instead of just measuring it —
    the removal half of Lee et al. 2021's exact-substring deduplication,
    at the same k-token granularity as duplicate_spans.

    Rule: a position's span is DUPLICATED when its text occurs in >= 2
    distinct documents (same key and threshold as duplicate_spans). For
    each duplicated span hash the CANONICAL owner is the smallest
    doc_id containing it; every other document removes all tokens
    covered by any occurrence of that span. Exactly one document keeps
    each duplicated passage (its min-id owner, which keeps ALL its
    occurrences), the corpus-wide token mass of boilerplate drops to ~1
    copy, and the choice is a pure function of the data — identical
    across runs, engines, and partitionings. ``text_clean`` is the
    space-joined KEPT tokens: removal operates on the tokenized view
    (the view every scoring operator in this engine reads), not on raw
    bytes, so original whitespace/punctuation between tokens is not
    reconstructed.

    Scale shape: span keys are the same content-addressed 64-bit
    hashes (_span_hash_expr); ownership is a single window over the
    span-key partition (owner = min doc, duplicated = min != max —
    one position-scale exchange, no second explode, no join-back);
    flagged starts aggregate per doc — never a pairwise document join.
    Per doc, flagged starts are merged into disjoint intervals with one
    array fold (so a fully-boilerplate document masks against ONE
    interval, not n starts), and the keep-mask is a narrow HOF pass
    over the token array.
    """
    if span < 2:
        raise ValueError(f"span must be >= 2, got {span}")
    # NULL text must come through as ('', 0, 0), not a NULL row — the
    # same tokenize(NULL) hazard chunk_documents guards against
    toks = tokenize_expr(F.coalesce(F.col(text_col).cast("string"),
                                    F.lit("")))
    base = df.select(F.col(id_col), toks.alias("_toks"),
                     F.size(toks).alias("_n"))
    pos = (base.filter(F.col("_n") >= span)
           .select(id_col, F.posexplode(_span_hash_expr(span))
                   .alias("_p0", "h")))
    # single-pass ownership (round-6): a window over the span-key
    # partition yields the canonical owner (min doc) and the >=2
    # distinct-docs flag (min != max) in place — the round-6-start
    # shape exploded the corpus a second time and paid an aggregate
    # exchange plus a position-scale join-back
    from pyspark.sql.window import Window
    w = Window.partitionBy("h")
    flg = pos.select(id_col, "_p0",
                     F.min(id_col).over(w).alias("_owner"),
                     F.max(id_col).over(w).alias("_mx"))
    flagged = (flg.filter((F.col("_owner") != F.col("_mx"))
                          & (F.col(id_col) != F.col("_owner")))
               .groupBy(id_col)
               .agg(F.collect_set(F.col("_p0") + 1).alias("_starts")))
    # merge sorted 1-based starts into disjoint [lo, hi] token intervals
    iv_t = "array<struct<lo:int,hi:int>>"

    def _merge(acc, s):
        last = F.element_at(acc, -1)
        new_iv = F.array(F.struct(s.cast("int").alias("lo"),
                                  (s + span - 1).cast("int").alias("hi")))
        grown = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(F.struct(last["lo"].alias("lo"),
                             F.greatest(last["hi"], s + span - 1)
                             .cast("int").alias("hi"))))
        return (F.when(F.size(acc) == 0, new_iv)
                .when(s <= last["hi"] + 1, grown)
                .otherwise(F.concat(acc, new_iv)))

    merged = F.aggregate(F.sort_array("_starts"),
                         F.array().cast(iv_t), _merge)
    tagged = base.join(flagged, on=id_col, how="left").select(
        id_col, "_toks", "_n",
        F.coalesce(merged, F.array().cast(iv_t)).alias("_ivs"))
    kept = F.transform(
        F.filter(
            F.transform(
                F.col("_toks"),
                lambda x, j: F.struct(
                    x.alias("t"),
                    (~F.exists(F.col("_ivs"),
                               lambda iv: (iv["lo"] <= j + 1)
                               & (j + 1 <= iv["hi"]))).alias("k"))),
            lambda st: st["k"]),
        lambda st: st["t"])
    return tagged.select(
        id_col,
        F.array_join(kept, " ").alias("text_clean"),
        F.col("_n").cast("long").alias("n_tokens"),
        (F.col("_n") - F.size(kept)).cast("long").alias("n_tokens_removed"))


def contamination_stats(corpus: DataFrame, eval_df: DataFrame,
                        span: int = 13, text_col: str = "text",
                        id_col: str = "doc_id",
                        eval_text_col: str | None = None,
                        broadcast_max_spans: int = 5_000_000) -> DataFrame:
    """(doc_id, n_spans, n_overlap_spans): per corpus document, how many
    of its ``span``-token windows occur VERBATIM anywhere in the
    evaluation set — the train/test decontamination check (GPT-3
    appendix-C 13-gram overlap; Lee et al. 2021 §6.2). A leaked
    benchmark answer inflates eval scores silently; this measures the
    leak per document so a pipeline can drop or audit it.

    Same content-addressed span key as duplicate_spans (64-bit
    xxhash64 of the tokenized span slice — see _span_hash_expr for why
    the key no longer mirrors the DuckDB twin's md5 prefix; the emitted
    counts agree up to the same 64-bit collision class).
    Corpus documents shorter than ``span`` tokens emit (0, 0). Each
    corpus POSITION counts at most once however many eval docs share
    its span (semi-join semantics).

    Scale shape: the eval side reduces to its DISTINCT span-hash set —
    eval suites are tiny next to a training corpus — broadcast below
    ``broadcast_max_spans`` hashes (~16 B each), shuffle semi-join
    above; the corpus side is one explode + hash semi-join, never a
    pairwise document join, and the corpus text itself never shuffles.
    """
    if span < 2:
        raise ValueError(f"span must be >= 2, got {span}")
    etc = eval_text_col or text_col

    def _positions(df: DataFrame, col: str, keep_id: bool) -> DataFrame:
        toks = tokenize_expr(col)
        head = [F.col(id_col)] if keep_id else []  # eval may lack the id col
        base = df.select(*head, toks.alias("_toks"),
                         F.size(toks).alias("_n"))
        return (base.filter(F.col("_n") >= span)
                .select(*head, F.explode(_span_hash_expr(span)).alias("h")))

    # persisted: the gate count and the mark join both read the eval
    # hash set — without it the eval tokenize+explode+distinct runs
    # twice (the set is eval-suite-sized, tiny next to the corpus)
    eval_h = _positions(eval_df, etc, keep_id=False).distinct().persist()
    marker = eval_h.withColumn("_m", F.lit(1))
    if eval_h.count() <= broadcast_max_spans:
        marker = F.broadcast(marker)
    # round-6 single-pass form: a LEFT join against the (distinct, so
    # row-preserving) eval set marks overlapping positions in place,
    # and the per-doc totals ride the same aggregate (n_spans = the
    # doc's position count) — the round-6-start shape semi-joined, then
    # paid a THIRD corpus tokenize pass just to recompute totals.
    # Short docs re-enter via a column-pruned id scan.
    pos = _positions(corpus, text_col, keep_id=True)
    per_doc = (pos.join(marker, on="h", how="left")
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).cast("long").alias("n_spans"),
                    F.count("_m").cast("long").alias("n_overlap_spans")))
    return (corpus.select(F.col(id_col))
            .join(per_doc, on=id_col, how="left")
            .select(id_col,
                    F.coalesce("n_spans", F.lit(0)).cast("long")
                    .alias("n_spans"),
                    F.coalesce("n_overlap_spans", F.lit(0)).cast("long")
                    .alias("n_overlap_spans")))


def decontaminate(corpus: DataFrame, eval_df: DataFrame, span: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  eval_text_col: str | None = None,
                  max_overlap_spans: int = 0) -> DataFrame:
    """Drop every corpus document sharing more than ``max_overlap_spans``
    ``span``-token windows with the evaluation set (default 0: any
    verbatim 13-gram overlap removes the document, the GPT-3 rule).
    The corpus passes through a broadcast-or-shuffle anti-join on ids —
    its columns are untouched."""
    flagged = (contamination_stats(corpus, eval_df, span=span,
                                   text_col=text_col, id_col=id_col,
                                   eval_text_col=eval_text_col)
               .filter(F.col("n_overlap_spans") > max_overlap_spans)
               .select(id_col))
    return corpus.join(flagged, id_col, "left_anti")


def duplicate_spans(df: DataFrame, span: int = 8, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_spans, n_dup_spans): cross-document exact substring
    duplication at k-token granularity (Lee et al. 2021 shape).

    Every token position i (1-based, i <= n_tokens - span + 1) owns the
    span of ``span`` consecutive tokens starting there, content-
    addressed by a 64-bit xxhash64 of the token slice (_span_hash_expr
    has the key-vs-oracle collision analysis). A position is DUPLICATED
    when its span text occurs in >= 2 distinct documents — within-doc
    repeats alone do not count. Documents shorter than ``span`` tokens
    emit (0, 0).

    Scale shape (round-6 single-pass form): ONE position explode —
    O(corpus tokens) — exchanged once by span key; a window over the
    key partition flags cross-document duplication in place (a span is
    in >= 2 distinct docs iff min(doc) != max(doc) over its partition —
    no countDistinct, no second explode, no semi-join back), and the
    per-doc totals ride the same pass (n_spans = the doc's position
    count). The round-6-start shape exploded the corpus twice and paid
    two position-scale exchanges (distinct + aggregate) plus the
    join-back. Short docs re-enter via a column-pruned id scan.
    No pairwise document join exists anywhere, so boilerplate
    spans shared by millions of files cost one window group each.
    """
    if span < 2:
        raise ValueError(f"span must be >= 2, got {span}")
    from pyspark.sql.window import Window
    toks = tokenize_expr(text_col)
    base = df.select(F.col(id_col), toks.alias("_toks"),
                     F.size(toks).alias("_n"))
    pos = (base.filter(F.col("_n") >= span)
           .select(id_col, F.explode(_span_hash_expr(span)).alias("h")))
    w = Window.partitionBy("h")
    flagged = pos.select(
        id_col,
        (F.min(id_col).over(w) != F.max(id_col).over(w)).alias("_dup"))
    per_doc = (flagged.groupBy(id_col)
               .agg(F.count(F.lit(1)).cast("long").alias("n_spans"),
                    F.sum(F.col("_dup").cast("long")).alias("n_dup_spans")))
    return (df.select(F.col(id_col)).join(per_doc, on=id_col, how="left")
            .select(id_col,
                    F.coalesce("n_spans", F.lit(0)).cast("long")
                    .alias("n_spans"),
                    F.coalesce("n_dup_spans", F.lit(0)).cast("long")
                    .alias("n_dup_spans")))
