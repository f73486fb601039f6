"""Text-analysis operators for large-scale training-data pipelines.

All four stay JVM-side (whole-stage codegen; zero Python in the plan):
token counting, language-ID heuristic, quality scoring, document
fingerprinting. Each has an equivalent DuckDB oracle in oracle_sql.py.

These extend the reference's scope (it has no corpus-analytics layer);
tokenization reuses the engine's pinned spec so stats are consistent
with the search index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_text_search_spark.functions.text import lower_expr, tokenize_expr

# deterministic tiny stopword sets (ranking heuristics only)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "on", "with", "as"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "para"],
    "de": ["der", "die", "und", "das", "nicht", "von", "mit", "ist", "auf", "ein"],
    "fr": ["le", "la", "et", "les", "des", "une", "est", "pour", "dans", "que"],
}
LANG_PREFERENCE = ["en", "es", "de", "fr"]  # deterministic tie-break order


def _tokens(text_col: str) -> Column:
    return tokenize_expr(text_col)


# BPE-ish pre-tokenization (GPT-2 flavored, dialect-portable subset):
# UNICODE letter runs (\pL — the engine tokenizer is unicode, and an
# ASCII-only [a-z] proxy counted every CJK character as a symbol run,
# drastically inflating the LLM-training cost estimate on non-Latin
# corpora), <=3-digit number chunks (GPT-style number splitting), symbol
# runs — no capture groups or quotes so the same literal works in Java
# regex and RE2 (DuckDB); NOT python re (no \pL there — tests go through
# the engines)
BPE_PATTERN = r"[\pL]+|[0-9]{1,3}|[^\s\pL0-9]+"


def token_count(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_words, n_bpe_tokens, n_chars): engine-tokenizer
    count, whitespace word count, a BPE-style pre-tokenizer count (the
    LLM-training cost proxy), and raw length."""
    from data_text_search_spark.functions.text import TOKEN_PATTERN
    low = F.lower(F.col(text_col).cast("string"))
    # counting matches needs no materialized match ARRAY — regexp_count
    # runs the same matcher without building every token substring
    # (identical value to size(regexp_extract_all(...)) by definition)
    return df.select(
        F.col(id_col),
        F.regexp_count(low, F.lit(TOKEN_PATTERN)).alias("n_tokens"),
        F.size(F.split(F.trim(F.col(text_col).cast("string")), r"\s+")).alias("n_words"),
        F.regexp_count(low, F.lit(BPE_PATTERN)).alias("n_bpe_tokens"),
        F.length(F.col(text_col).cast("string")).alias("n_chars"),
    )


def _stop_ratio(toks: Column, words: list[str]) -> Column:
    # distinct-hit ratio: |tokens ∩ stopwords| / |distinct tokens|
    return (
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        / F.nullif(F.size(F.array_distinct(toks)), F.lit(0))
    ).cast("double")


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred, lang_score): argmax of per-language stopword-hit
    ratios, ties broken by LANG_PREFERENCE order. A coarse n-gram-free
    heuristic; the operator contract (not model quality) is the point."""
    # project the tokenized column ONCE — inlining the tokenizer expression
    # into each ratio would re-run regex extraction per language
    base = df.select(F.col(id_col),
                     F.array_distinct(_tokens(text_col)).alias("_toks"))
    cols = {
        lang: F.coalesce(_stop_ratio(F.col("_toks"), words), F.lit(0.0))
        .alias(f"r_{lang}")
        for lang, words in STOPWORDS.items()
    }
    scored = base.select(F.col(id_col), *cols.values())
    pred = F.lit(LANG_PREFERENCE[-1])
    best = F.col(f"r_{LANG_PREFERENCE[-1]}")
    for lang in reversed(LANG_PREFERENCE[:-1]):
        cond = F.col(f"r_{lang}") >= best
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
        best = F.when(cond, F.col(f"r_{lang}")).otherwise(best)
    return scored.select(
        id_col, pred.alias("lang_pred"), F.round(best, 6).alias("lang_score"))


def quality(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, punct_ratio, stop_ratio, mean_token_len):
    the standard cheap quality signals for corpus filtering."""
    t = df.select(F.col(id_col), _tokens(text_col).alias("toks"))
    n = F.size("toks")
    npunct = F.size(F.filter("toks", lambda x: x.rlike("^[^\\p{L}\\p{N}_]$")))
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    nstop = F.size(F.filter("toks", lambda x: F.array_contains(en, x)))
    tok_chars = F.aggregate("toks", F.lit(0), lambda acc, x: acc + F.length(x))
    safe_n = F.nullif(n.cast("double"), F.lit(0.0))
    return t.select(
        id_col,
        n.alias("n_tokens"),
        F.coalesce(F.round(npunct / safe_n, 6), F.lit(0.0)).alias("punct_ratio"),
        F.coalesce(F.round(nstop / safe_n, 6), F.lit(0.0)).alias("stop_ratio"),
        F.coalesce(F.round(tok_chars / safe_n, 6), F.lit(0.0)).alias("mean_token_len"),
    )


def unigram_rarity(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   vocab_max_terms: int | None = None) -> DataFrame:
    """(doc_id, n_tokens, sum_tf, rarity): a CCNet-style frequency prior
    computed from the corpus ITSELF (no external model). ``sum_tf`` is
    the sum over the doc's token occurrences of each token's CORPUS
    count; ``rarity`` = -ln(sum_tf / (n_tokens · total_tokens)) — the
    negative log of the doc's mean relative token frequency. Stopword
    soup and templated boilerplate sit at low rarity, lexically rich
    prose in the middle, and hash dumps / minified blobs at the top:
    both tails are curation candidates, which is how CCNet uses its LM
    perplexity buckets.

    Cross-engine exactness: the per-doc backbone (n_tokens, sum_tf) is
    pure INTEGER arithmetic; exactly one ln per doc runs on an
    identical double quotient in Spark and DuckDB, rounded to 6dp — the
    same discipline as the engine's other ratio columns.

    Scale shape (round-6): per-doc (token, tf) entries are computed
    IN-ROW (sort + run-length over the tokenize output — a narrow JVM
    pass emitting one row per DISTINCT token per doc instead of one per
    occurrence), so the corpus count aggregate and the count join-back
    both run over the far smaller distinct-entry frame, and the doc's
    n_tokens rides the same pass (Σ tf) — the round-6-start shape paid
    three corpus tokenize passes and two occurrence-scale explodes.
    One (token → corpus count) hash aggregate (map-side combine; Zipf:
    result is vocab-sized), broadcast-joined back to the entries, one
    per-doc aggregate. ``vocab_max_terms`` optionally caps the
    broadcast to the top-N terms by count — beyond-cap tokens fall back
    to count 1 (their true count is >= 1) — for corpora whose long tail
    outgrows the driver; the oracle-gated contract row runs uncapped."""
    from data_text_search_spark.functions import hof

    entry_t = "array<struct<tok:string,tf:bigint>>"

    def rle(s):
        # run starts over the sorted token array (1-based); CaseWhen
        # branches evaluate lazily, so s[i-1] is never touched at i=1
        starts = F.filter(
            F.sequence(F.lit(1), F.size(s)),
            lambda i: F.when(i == 1, F.lit(True))
            .otherwise(F.element_at(s, i - 1) != F.element_at(s, i)))

        def entries(st):
            return F.transform(
                F.sequence(F.lit(1), F.size(st)),
                lambda j: F.struct(
                    F.element_at(s, F.element_at(st, j)).alias("tok"),
                    ((F.when(j == F.size(st), F.size(s) + 1)
                      .otherwise(F.element_at(st, j + 1)))
                     - F.element_at(st, j)).cast("long").alias("tf")))

        return F.when(F.size(s) > 0, hof.once(starts, entries)) \
                .otherwise(F.array().cast(entry_t))

    ent = df.select(
        F.col(id_col),
        # n_tokens spelled exactly as before (size of the raw tokenize —
        # NULL text stays NULL, empty stays 0)
        F.size(_tokens(text_col)).cast("long").alias("n_tokens"),
        F.explode_outer(
            hof.once(F.array_sort(_tokens(text_col)), rle)).alias("e"))
    occ = ent.select(id_col, "n_tokens", F.col("e.tok").alias("tok"),
                     F.col("e.tf").alias("tf"))
    # explode_outer emits a NULL entry for empty/NULL docs — keep it out
    # of the vocabulary (it can never match a real token in the join)
    counts = (occ.filter(F.col("tok").isNotNull())
              .groupBy("tok").agg(F.sum("tf").alias("c")))
    if vocab_max_terms is not None:
        counts = (counts.orderBy(F.desc("c"), F.asc("tok"))
                  .limit(vocab_max_terms))
    # persisted: the total/size gate and the join back both read the
    # count table — without it the corpus-wide entry pass runs twice
    # (the table is vocab-sized, Zipf-small next to the entries)
    counts = counts.persist()
    row = counts.agg(F.sum("c").alias("s"),
                     F.count(F.lit(1)).alias("v")).first()
    total, n_terms = (row["s"] or 0), row["v"]
    # a web-scale long-tail vocabulary can outgrow the driver: only
    # force the broadcast when the term table is bounded (same gate
    # pattern as dedup_keep_canonical); above it, a plain shuffle join
    lookup = (F.broadcast(counts) if n_terms <= 5_000_000 else counts)
    per = (occ.join(lookup, on="tok", how="left")
           .groupBy(id_col)
           .agg(F.first("n_tokens").alias("n_tokens"),
                F.sum(F.col("tf") * F.coalesce(F.col("c"), F.lit(1)))
                .alias("sum_tf")))
    quot = (F.col("sum_tf").cast("double")
            / (F.col("n_tokens").cast("double") * F.lit(float(total))))
    return (per.select(id_col, "n_tokens",
                       F.coalesce("sum_tf", F.lit(0)).cast("long")
                       .alias("sum_tf"))
            .withColumn("rarity",
                        F.when(F.col("n_tokens") > 0,
                               F.round(-F.log(quot), 6))
                        .otherwise(F.lit(0.0))))


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp): content fingerprint = sha256 of whitespace-normalized
    lowercase text — the cross-engine-stable exact-dedup key."""
    norm = F.trim(F.regexp_replace(lower_expr(text_col), r"\s+", " "))
    return df.select(F.col(id_col), F.sha2(norm, 256).alias("fp"))
