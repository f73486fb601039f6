"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale shapes:
- exact: one hash aggregate on a normalized fingerprint — the cheapest
  pass, always run first at corpus scale.
- ngram_jaccard_pairs: EXACT near-dup pairs via a shingle inverted-index
  self-join (only pairs sharing >=1 shingle are generated — never an
  all-pairs cross join). Correct but shuffle-heavy at 100 TB; it is the
  verification oracle for the approximate paths.
- minhash_lsh_pairs: the scale path. 64-perm MinHash signatures
  (vectorized pandas UDF over shingle-hash arrays), banded into
  buckets; only same-bucket candidates are verified with exact Jaccard.
  Work ∝ candidates, not pairs.
- simhash: 64-bit weighted-bit fingerprint per doc; near-dups collide
  on 16-bit bands and verify with hamming distance.

All hashing is deterministic (xxhash64 JVM-side; fixed perm seeds), so
results are reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from data_text_search_spark.functions import hof
from data_text_search_spark.functions.text import lower_expr, tokenize_expr

# ---------------------------------------------------------------- exact


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, canonical_doc_id, group_size) — exact dedup on the
    whitespace-normalized lowercase content (the canonical
    representative is the smallest doc_id, deterministic).

    One shuffle: window aggregates over the fingerprint partition. The
    round-5 groupBy+join-back form computed the normalize+sha2
    fingerprint twice (once per join side) and paid two exchanges of
    64-char keys."""
    from pyspark.sql.window import Window
    norm = F.trim(F.regexp_replace(lower_expr(text_col), r"\s+", " "))
    fp = df.select(F.col(id_col).alias("doc_id"), F.sha2(norm, 256).alias("fp"))
    w = Window.partitionBy("fp")
    return fp.select(
        "doc_id",
        F.min("doc_id").over(w).alias("canonical_doc_id"),
        F.count(F.lit(1)).over(w).alias("group_size"))


# ------------------------------------------------------- shingles (shared)


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             n: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams of the engine tokenizer's
    output, space-joined. Docs with < n tokens produce no shingles.
    The tokenize is lambda-bound (functions.hof.once) so it runs once
    per row — referenced bare inside the window transform it would be
    re-evaluated per window position (the round-5 plan did exactly
    that)."""

    def spans(toks):
        # guard: F.sequence(1, 0) yields a DESCENDING [1, 0] — short docs
        # must produce an empty shingle list instead
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    sh = hof.once(tokenize_expr(text_col), spans)
    return (df.select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
            .distinct())


def _hashed_shingle_set(text_col: str, n: int):
    """IN-ROW distinct word-n-gram set of a doc under a 64-bit content
    address: xxhash64 over the n-token SLICE (seed-chained per element —
    token boundaries are mixed in, no separator string is ever
    materialized), deduplicated with array_distinct per row. A doc's
    shingle SET is a per-row property, so no corpus-scale distinct
    exchange is needed (the round-6-start form exploded and then
    distinct'd (doc, long) rows — one full shuffle that this projection
    deletes; the round-5 form before it paid two string-keyed ones).
    Collision class is the same 64-bit mass the md5 prefix already
    accepted (see curation._span_hash_expr for the vs-oracle
    analysis)."""

    def spans(toks):
        return F.array_distinct(F.when(
            F.size(toks) >= n,
            F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                        lambda i: F.xxhash64(F.slice(toks, i, n))),
        ).otherwise(F.array().cast("array<bigint>")))

    return hof.once(tokenize_expr(text_col), spans)


def _hashed_shingles(df: DataFrame, text_col: str, id_col: str,
                     n: int) -> DataFrame:
    """(doc_id, shingle bigint) — exploded view of _hashed_shingle_set
    (already distinct per doc, hence globally distinct on (doc,
    shingle) with zero shuffle)."""
    return df.select(F.col(id_col).alias("doc_id"),
                     F.explode(_hashed_shingle_set(text_col, n))
                     .alias("shingle"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5,
                        max_shingle_df: int | None = None) -> DataFrame:
    """(doc_a, doc_b, jaccard) for all pairs with exact shingle-set Jaccard
    >= threshold. Inverted-index join: candidate pairs come only from
    shared shingles.

    `max_shingle_df`: hot-shingle ceiling for the candidate join — a
    boilerplate shingle shared by M docs would alone emit M²/2 candidate
    rows, so shingles with document frequency above the cap are excluded
    from candidate GENERATION (standard practice; a pair is lost only if
    *every* shared shingle is ultra-common). Jaccard for surviving
    candidates is still computed over the FULL shingle sets, so emitted
    values are exact. None (the default) = the uncapped exact oracle."""
    sh = _hashed_shingles(df, text_col, id_col, n)
    if max_shingle_df is None:
        # self-join key: the 64-bit xxhash64 span address — the
        # candidate exchange moves fixed 8-byte longs instead of
        # arbitrary-length text, and no per-span string or md5 is ever
        # computed (the round-4/5 form built every span string, md5'd
        # it, and distinct'd twice; see _hashed_shingle_set). Set sizes
        # are an in-row F.size over the same per-row set — no aggregate
        # over the exploded frame.
        sizes = df.select(F.col(id_col).alias("doc_id"),
                          F.size(_hashed_shingle_set(text_col, n))
                          .alias("sz"))
        a = sh.alias("a")
        # SHUFFLE_HASH pinned for the candidate self-join: measured
        # fastest AND steadiest of the three strategies at the 10x
        # measurement scale (9.2-10.2 s vs broadcast 10.4-17.3 — the
        # in-row form's small file-size estimate otherwise tempts the
        # planner into broadcasting the multi-million-row exploded side,
        # a driver-built hash table that degrades under bench memory
        # pressure — and vs sort-merge 9.1-14.9, which pays a sort the
        # hash join doesn't need). Also the honest 100-TB shape:
        # large-large equi-join, per-partition bounded build side.
        b = sh.hint("shuffle_hash").alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
            .agg(F.count("*").alias("inter"))
        )
        sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
        sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
        return (
            inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )
    # capped path: same 8-byte span keys; a collision can only ADD a
    # candidate pair, which the exact set-verify below filters (the df
    # cap itself is a heuristic ceiling, so counting it over hashed keys
    # is equivalent in practice)
    rare = sh.join(
        sh.groupBy("shingle").agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_shingle_df).select("shingle"),
        "shingle")
    # same pinned join strategy as the uncapped path (see above)
    a, b = rare.alias("a"), rare.hint("shuffle_hash").alias("b")
    cand = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    # exact verification over the full (hashed) shingle sets — the cap
    # bounds candidates, never the Jaccard value itself. In-row set
    # build (sorted for the merge-style array_intersect), no groupBy.
    sets = df.select(F.col(id_col).alias("doc_id"),
                     F.sort_array(_hashed_shingle_set(text_col, n))
                     .alias("hs"))
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("set_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("set_b"))
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    return (cand.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("jaccard", F.round(inter / union, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard"))


# ------------------------------------------------------------ MinHash-LSH

N_PERM = 64
_MERSENNE = (1 << 61) - 1
_rs = np.random.RandomState(0xC0FFEE)
_PERM_A = _rs.randint(1, _MERSENNE, size=N_PERM, dtype=np.int64)
_PERM_B = _rs.randint(0, _MERSENNE, size=N_PERM, dtype=np.int64)


@F.pandas_udf(ArrayType(LongType()))
def minhash_sig(shingle_hashes: pd.Series) -> pd.Series:
    """64-perm MinHash signature from a doc's shingle-hash array.

    Per doc: one (n_shingles x 64) broadcast min, with in-place
    arithmetic (the per-doc matrix stays L2-sized — a whole-batch flat
    matrix was measured SLOWER: 64x the input blows every cache level)
    and the exact Mersenne shift-add fold replacing the integer
    division: for x < 2^64 and M = 2^61-1, (x>>61) + (x&M) is congruent
    to x mod M and < M + 8, so one conditional subtract finishes it —
    bit-identical values (fold == ``%`` verified exhaustively in
    pytest), no 3.2e9-division pass at sf1.0."""
    A = _PERM_A.astype(np.uint64)
    B = _PERM_B.astype(np.uint64)
    M = np.uint64(_MERSENNE)
    S61 = np.uint64(61)

    def sig(hashes):
        if hashes is None or len(hashes) == 0:
            return None
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        # (n, 64): (a*h + b) with uint64 wrap — a deterministic family
        vals = np.multiply.outer(h, A)
        vals += B
        high = vals >> S61
        vals &= M
        vals += high
        vals[vals >= M] -= M
        return vals.min(axis=0).astype(np.int64).tolist()

    return shingle_hashes.map(sig)


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(doc_id, shingle_set array<long>, sig array<long>).

    The distinct shingle-hash set is built IN-ROW (array_distinct +
    sort_array over the windowed hashes) — a doc's shingle set is a
    per-row property, so the round-6-start shape (explode string
    shingles → corpus-wide distinct → groupBy collect_set) paid two
    corpus-scale exchanges for what one narrow projection computes.
    The shingle address is the SAME seed-chained xxhash64-over-the-
    token-SLICE the exact ngram_jaccard path uses
    (_hashed_shingle_set): no per-window span string is ever built —
    the round-start concat_ws+xxhash64(string) form spent more time
    building 50M interpreted-HOF strings at sf1.0 than the whole
    MinHash permutation pass. Swapping one injective-up-to-2^-64
    64-bit content address for another leaves every Jaccard VALUE
    identical (set cardinalities are hash-family-independent modulo
    the same collision class) and re-rolls only WHICH hash values the
    permutations see — the banding recall guarantee is probabilistic
    over the family (P(miss) <= 3.9e-8 per J>=0.9 pair at 16x4), and
    the recall certificate was re-verified EMPTY at sf0.001/0.01/0.1
    and the round-6 measurement corpus after the change. Docs with
    < n tokens produce no row, exactly as the explode form dropped
    them (their sets are empty — they must not band into a degenerate
    shared bucket)."""
    hashed = (df.select(
        F.col(id_col).alias("doc_id"),
        F.sort_array(_hashed_shingle_set(text_col, n))
        .alias("shingle_set"))
        .filter(F.size("shingle_set") > 0))
    return hashed.withColumn("sig", minhash_sig("shingle_set"))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3,
                      threshold: float = 0.5, bands: int = 16,
                      bucket_cap: int | None = 100_000,
                      sig_prefilter_margin: float | None = 0.2) -> DataFrame:
    """(doc_a, doc_b, jaccard) — LSH candidates (same band bucket) verified
    with EXACT Jaccard on the shingle-hash sets. Approximate in recall
    (a pair missed by every band is lost), exact in precision.

    `bucket_cap`: (band, bucket) groups larger than the cap are skipped
    before the self-join, bounding candidates against degenerate buckets
    (e.g. the empty-signature class, boilerplate-only docs).

    `sig_prefilter_margin`: before the exact-verify join attaches both
    docs' FULL shingle-hash sets (the dominant shuffle at corpus scale —
    a hot doc in k candidate pairs replicates its whole set k times),
    candidates are pre-filtered by the signature-estimated Jaccard
    (matching minhash slots / N_PERM, 512 B of sigs per pair instead of
    the sets) ≥ threshold − margin. The estimate is Binomial(64, J)/64:
    at margin 0.2 a true pair at J = threshold is mis-pruned with
    probability ~Φ(−0.2/0.0625) < 1e-3 — and only if it also collided in
    some band. None disables the pre-filter (exact verify semantics)."""
    rows = N_PERM // bands
    sigs = minhash_signatures(df, text_col, id_col, n).persist()
    band_cols = F.explode(F.array(*[
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(F.slice("sig", bi * rows + 1, rows).cast("string"))
            .alias("bucket"),
        )
        for bi in range(bands)
    ]))
    banded = sigs.select("doc_id", band_cols.alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    if bucket_cap is not None:
        ok = (banded.groupBy("band", "bucket")
              .agg(F.count("*").alias("_bsz"))
              .filter(F.col("_bsz") <= bucket_cap).select("band", "bucket"))
        banded = banded.join(ok, ["band", "bucket"])
    # join strategy deliberately left to the planner: with the sigs
    # frame persisted, a within-session alternating A/B at the 10x
    # scale measured broadcast / shuffle-hash / shuffle-merge all at
    # ~2.2 s medians for this candidate join — there is nothing to pin
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    if sig_prefilter_margin is not None:
        ga = sigs.select(F.col("doc_id").alias("doc_a"),
                         F.col("sig").alias("sig_a"))
        gb = sigs.select(F.col("doc_id").alias("doc_b"),
                         F.col("sig").alias("sig_b"))
        est = (F.size(F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda m: m)) / F.lit(float(N_PERM)))
        cand = (cand.join(ga, "doc_a").join(gb, "doc_b")
                .filter(est >= threshold - sig_prefilter_margin)
                .select("doc_a", "doc_b"))
    sa = sigs.select(F.col("doc_id").alias("doc_a"),
                     F.col("shingle_set").alias("set_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"),
                     F.col("shingle_set").alias("set_b"))
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --------------------------------------------------------------- SimHash


@F.pandas_udf(LongType())
def simhash_from_hashes(hashes: pd.Series) -> pd.Series:
    """64-bit SimHash from per-token-occurrence 64-bit hashes: bit i of
    the fingerprint is set iff more than half the occurrences have bit i
    set (tf-weighted majority vote — each occurrence votes once).

    Fully batch-vectorized: one flat (total_tokens, 64) bit matrix per
    Arrow slice with a reduceat segment-sum — no per-row Python loop and
    no Python-side hashing (token hashes arrive from JVM xxhash64)."""
    n = len(hashes)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return pd.Series(out)
    lens = np.fromiter(
        (0 if h is None else len(h) for h in hashes), dtype=np.int64, count=n)
    nz = np.flatnonzero(lens > 0)
    if nz.size == 0:
        return pd.Series(out)
    # bound the bit-matrix working set: process ~1M tokens per slice
    budget = 1_000_000
    pos = 0
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    while pos < nz.size:
        end = pos
        tok = 0
        while end < nz.size and (tok == 0 or tok + lens[nz[end]] <= budget):
            tok += lens[nz[end]]
            end += 1
        idx = nz[pos:end]
        flat = np.concatenate([
            np.asarray(hashes.iloc[i], dtype=np.int64) for i in idx
        ]).view(np.uint64)
        bits = ((flat[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
        starts = np.concatenate(([0], np.cumsum(lens[idx])[:-1]))
        ones = np.add.reduceat(bits, starts, axis=0)
        setbit = (2 * ones) > lens[idx][:, None]
        sig = np.zeros(idx.size, dtype=np.uint64)
        for b in range(64):
            sig |= setbit[:, b].astype(np.uint64) << np.uint64(b)
        out[idx] = sig.view(np.int64)
        pos = end
    return pd.Series(out)


def simhash_expr(text_col: str):
    """SimHash plan: JVM-side tokenize + per-token xxhash64 (inside a
    higher-order transform, whole-stage codegen) → one vectorized vote
    UDF. The old per-row blake2b loop was the slowest code per byte in
    the repo; hashing now never leaves the JVM."""
    tok_hashes = F.transform(tokenize_expr(text_col), lambda t: F.xxhash64(t))
    return simhash_from_hashes(tok_hashes)


def simhash_fingerprints(df: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sh) — the 64-bit SimHash fingerprint per doc. Exposed so
    a caller that bands the SAME corpus more than once (e.g. the
    simhash_cert row's two independent band decompositions) can pay the
    tokenize + vote pass a single time and hand the materialized frame
    to simhash_pairs(fingerprints=...)."""
    return df.select(F.col(id_col).alias("doc_id"),
                     simhash_expr(text_col).alias("sh"))


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  bucket_cap: int | None = None,
                  band_bits: int = 16,
                  fingerprints: DataFrame | None = None) -> DataFrame:
    """(doc_a, doc_b, hamming) for pairs within max_hamming bits.
    Candidates via band collisions over 64/band_bits bands (any pair
    with hamming < n_bands shares at least one band — pigeonhole, exact
    recall whenever max_hamming < 64/band_bits; 4x16-bit default).
    Two different band_bits choices are independent decompositions that
    must produce identical pair sets — the driver-contract certificate
    exploits exactly that.

    `bucket_cap`: (band, bucket) groups above the cap are skipped before
    the self-join, same guard as minhash_lsh_pairs/lsh_dup_pairs — a
    degenerate bucket (thousands of empty or boilerplate docs all
    fingerprinting to the same band value) would emit M²/2 join rows.
    With a cap the pigeonhole recall guarantee narrows to pairs with at
    least one NON-oversubscribed shared band. The default is None — the
    documented contract of this operator is EXACT pigeonhole recall, so
    the cap is strictly opt-in (pass e.g. 100_000 at corpus scale, as
    minhash_lsh_pairs callers do)."""
    n_bands = 64 // band_bits
    if max_hamming >= n_bands:
        raise ValueError(
            f"exact pigeonhole recall needs max_hamming < {n_bands} bands "
            f"(band_bits={band_bits}); got max_hamming={max_hamming}")
    mask = (1 << band_bits) - 1
    # `fingerprints`: a precomputed (doc_id, sh) frame (the caller is
    # responsible for having materialized it — persist/localCheckpoint)
    # so N bandings of one corpus share a single tokenize + vote pass
    sh = (fingerprints if fingerprints is not None
          else simhash_fingerprints(df, text_col, id_col).persist())
    bands = F.explode(F.array(*[
        F.struct(
            F.lit(bi).alias("band"),
            F.shiftrightunsigned("sh", bi * band_bits).bitwiseAND(F.lit(mask))
            .alias("bucket"))
        for bi in range(n_bands)
    ]))
    banded = sh.select("doc_id", "sh", bands.alias("bb")).select(
        "doc_id", "sh", F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"))
    if bucket_cap is not None:
        ok = (banded.groupBy("band", "bucket")
              .agg(F.count("*").alias("_bsz"))
              .filter(F.col("_bsz") <= bucket_cap).select("band", "bucket"))
        banded = banded.join(ok, ["band", "bucket"])
    # SHUFFLE_MERGE pinned: band groups are large on duplicate-heavy
    # corpora (identical fingerprints share every bucket), and the
    # group-cross inside a sorted merge measured fastest in a
    # within-session alternating A/B at the 10x scale (medians:
    # merge 3.4 s, broadcast 4.9, shuffle-hash 6.0) — broadcast also
    # rebuilds a driver-side hash table per call
    a, b = banded.alias("a"), banded.hint("shuffle_merge").alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"), ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------- cluster resolution

def dup_clusters(pairs: DataFrame, a_col: str = "doc_a",
                 b_col: str = "doc_b", max_iter: int = 50,
                 driver_max_edges: int = 2_000_000) -> DataFrame:
    """Resolve a near-dup PAIR list into connected components:
    (doc_id, cluster_id) for every id that appears in a pair, where
    cluster_id is the smallest doc id reachable through the pair graph
    — the step between pair generation (ngram/minhash/simhash/cosine)
    and actually dropping rows, which needs a per-document verdict, not
    an edge list.

    Distributed min-label propagation WITH pointer doubling: labels
    start as self, and each round every vertex takes the min of (its
    own label, all neighbours' labels, its label's label). The
    neighbour term alone converges in O(diameter) rounds; the
    shortcutting term (label is always a vertex id, so label[label[x]]
    is defined) collapses already-linked chains exponentially, giving
    O(log n) rounds even on a degenerate 1M-doc chain — near-dup
    graphs are usually unions of small dense clusters where 2-3 rounds
    suffice. Per round: one shuffle of the edge list joined to current
    labels, one labels self-join, one min-aggregate — work ∝ |E|,
    never materializing components. localCheckpoint() truncates the
    lineage each round (iterative plans otherwise grow exponentially
    in Catalyst); convergence is detected by counting changed labels
    inside the same action that produces them (observe), so each
    round costs exactly one job.

    Below `driver_max_edges` (2M pair rows ≈ 32 MB — the same size-gate
    pattern as the query executor's driver merge) the pair list is
    pulled in ONE limit(gate+1).toPandas() action and resolved with a
    vectorized numpy propagation: the iterative path pays ~1-2 s of
    scheduling floor PER ROUND, which dwarfs the actual work on
    small-to-medium pair lists. (The round-6-start shape spent three
    extra jobs — two eager localCheckpoints and a count — just deciding
    the gate; the limit-pull IS the gate and the data.) Identity
    between the two paths is pytest-pinned; pass driver_max_edges=0 to
    force the distributed path.
    """
    sel = pairs.select(F.col(a_col).cast("long").alias("src"),
                       F.col(b_col).cast("long").alias("dst"))
    if driver_max_edges > 0:
        head = sel.limit(driver_max_edges + 1).toPandas()
        if len(head) <= driver_max_edges:
            return _dup_clusters_driver(pairs.sparkSession, head)
    # materialize the (possibly expensive) pair computation ONCE before
    # symmetrizing: a union of `pairs` with its own swap re-runs the
    # whole upstream plan twice (the round-5 dup_clusters row paid its
    # cosine_dup_pairs input two times — 15.8 s where the pairs
    # themselves cost 7.8 s)
    half = sel.localCheckpoint(eager=True)
    edges = (half
             .union(half.select(F.col("dst").alias("src"),
                                F.col("src").alias("dst")))
             .distinct())
    edges = edges.localCheckpoint(eager=True)
    labels = (edges.select("src").distinct()
              .select(F.col("src").alias("id"), F.col("src").alias("label")))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr = (edges.join(labels, edges["dst"] == labels["id"])
               .select(edges["src"].alias("id"),
                       F.col("label").alias("label")))
        l2 = labels.select(F.col("id").alias("_lid"),
                           F.col("label").alias("_llabel"))
        jump = (labels.join(l2, labels["label"] == l2["_lid"])
                .select("id", F.col("_llabel").alias("label")))
        obs = Observation()
        new = (labels.union(nbr).union(jump)
               .groupBy("id").agg(F.min("label").alias("new_label"))
               .join(labels, "id")
               .observe(obs, F.sum((F.col("new_label") < F.col("label"))
                                   .cast("long")).alias("changed"))
               .select("id", F.col("new_label").alias("label")))
        new = new.localCheckpoint(eager=True)
        changed = obs.get["changed"]
        labels = new
        if not changed:
            break
    return labels.select(F.col("id").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def _dup_clusters_driver(spark, pdf: pd.DataFrame) -> DataFrame:
    """Connected components on the collected (already size-gated) pair
    list — same (doc_id, min-reachable-id) output as the propagation
    path. Fully VECTORIZED min-label propagation with pointer doubling
    (np.minimum.at over BOTH edge directions + labels[labels]
    shortcutting, O(log n) whole-array rounds) — the round-5 form ran a
    pure-Python find/union loop over every edge, several seconds at the
    2M-edge gate. Takes the RAW directed pair rows (duplicates and
    orientation are immaterial to a min fixpoint), so the caller needs
    no symmetrize/distinct pass."""
    if pdf.empty:
        return spark.createDataFrame([], "doc_id long, cluster_id long")
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    ids, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = inv[:src.size], inv[src.size:]
    labels = np.arange(ids.size, dtype=np.int64)
    while True:
        new = labels.copy()
        np.minimum.at(new, si, labels[di])   # neighbour min, both edge
        np.minimum.at(new, di, labels[si])   # directions
        new = np.minimum(new, new[new])      # pointer doubling
        if np.array_equal(new, labels):
            # fixpoint ⇒ labels[labels] == labels (labels only ever
            # decrease and label[y] <= y), so labels are already roots
            break
        labels = new
    # ids is sorted, so the min index in a component IS the min id
    out = pd.DataFrame({"doc_id": ids, "cluster_id": ids[labels]})
    return spark.createDataFrame(out, schema="doc_id long, cluster_id long")


def dedup_keep_canonical(df: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id",
                         a_col: str = "doc_a",
                         b_col: str = "doc_b",
                         broadcast_max_rows: int = 20_000_000) -> DataFrame:
    """Drop every near-duplicate except the canonical (smallest-id)
    member of its cluster: df minus { ids whose cluster_id != own id }.
    Documents that appear in no pair pass through untouched. The
    drop-list is ≤ the number of paired docs — broadcast-joined when it
    fits (~8 B/id, 20M ids ≈ 160 MB) so the corpus never shuffles; on a
    dedup-heavy corpus whose loser list exceeds the gate (a forced
    broadcast would collect it to the driver and die on
    spark.driver.maxResultSize) the anti-join runs as a plain shuffle
    join of ids only — the corpus side still moves no text payload
    beyond the join columns Spark needs."""
    clusters = dup_clusters(pairs, a_col=a_col, b_col=b_col)
    losers = (clusters.filter(F.col("doc_id") != F.col("cluster_id"))
              .select(F.col("doc_id").alias(id_col)))
    n_losers = losers.count()
    if n_losers <= broadcast_max_rows:
        losers = F.broadcast(losers)
    return df.join(losers, id_col, "left_anti")
