"""Similarity search + near-duplicate pairs over an embedding column.

Three layers, ordered by scale:

- cosine_topk: exact brute-force scorer — JVM-side dot product via
  zip_with/aggregate (no Python in the plan), TakeOrderedAndProject
  top-k. The baseline and the verification oracle for ANN.
- Signatures: every vector gets a 64-bit random-hyperplane signature
  (one BLAS matmul per Arrow batch — vectorized pandas UDF, never
  per-row Python). Signatures are computed ONCE and persisted: either
  as a column (`with_signature`, the "at embed time" surface) or as a
  bucket-partitioned parquet index (`build_ann_index`).
- ann_index_search: the scale path — the query probes only buckets
  whose prefix is within `bucket_hamming` bits of its own signature
  prefix (directory-level partition pruning; 37/256 buckets at the
  defaults), then filters by full 64-bit signature hamming, then scores
  the survivors exactly. I/O and FLOPs ∝ probed fraction of the corpus.

Near-dup pairs:
- cosine_dup_pairs: EXACT all-pairs above a threshold. Auto-dispatches
  between a broadcast matmul (small inputs) and a block-partitioned
  pairwise matmul (no driver collect, no full-matrix broadcast: rows
  are hashed into B blocks, each of the B(B+1)/2 block pairs is one
  task doing a sub-matrix BLAS matmul). Exact all-pairs is inherently
  O(N²) FLOPs — at corpus scale use lsh_dup_pairs and keep this as the
  verification oracle.
- lsh_dup_pairs: the scale path — 8 bands × 8 bits of the 64-bit
  signature; same-bucket candidates verified with exact cosine.
  Approximate recall, exact precision. A per-bucket size cap bounds the
  candidate self-join against degenerate buckets (the all-zeros vector
  cluster class of problem).

The reference's semantic search (semantic_functions.py:239-368) is the
brute-force shape: normalize, dot product, sort desc, head k (its
model-based embedder is stubbed here — no model in the sandbox; the
driver's embeddings table stands in).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

EMB_DIM = 64   # driver embeddings table dimension
NBITS = 64     # hyperplane signature width (bits)
BUCKET_BITS = 8  # partition-bucket prefix width (256 buckets)

_rs = np.random.RandomState(0x5EED)
_HYPERPLANES = _rs.standard_normal((NBITS, EMB_DIM))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / F.nullif(_norm(a) * _norm(b), F.lit(0.0))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                cutoff: float | None = None) -> DataFrame:
    """Exact top-k by cosine similarity against a literal query vector.
    (vec_id, score) ordered score desc, vec_id asc."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine_expr(F.col(vec_col), q).alias("_raw"),
    )
    if cutoff is not None:
        # reference score-cutoff filter (semantic_functions.py:192-198)
        scored = scored.filter(F.col("_raw") > cutoff)
    return (scored.orderBy(F.desc("_raw"), F.asc(id_col)).limit(k)
            .select(id_col, F.round("_raw", 6).alias("score")))


# ------------------------------------------------------------ signatures

def _pack_bits(bits: np.ndarray) -> np.ndarray:
    """(n, NBITS) boolean → int64 signature (bit i = column i)."""
    sig = np.zeros(bits.shape[0], dtype=np.uint64)
    for i in range(bits.shape[1]):
        sig |= bits[:, i].astype(np.uint64) << np.uint64(i)
    return sig.view(np.int64)


def _sig_batch(mat: np.ndarray) -> np.ndarray:
    """One BLAS matmul per batch: (n, d) @ (d, NBITS) → packed int64."""
    return _pack_bits(mat @ _HYPERPLANES.T > 0)


@F.pandas_udf(LongType())
def sig64_udf(vecs: pd.Series) -> pd.Series:
    out = np.empty(len(vecs), dtype=np.int64)
    if len(vecs):
        mat = np.array(vecs.tolist(), dtype=np.float64)
        out[:] = _sig_batch(mat)
    return pd.Series(out)


def sig64_py(vec: list[float]) -> int:
    """Driver-side signature of one vector — identical spec to sig64_udf."""
    return int(_sig_batch(np.asarray(vec, dtype=np.float64)[None, :])[0])


def with_signature(df: DataFrame, vec_col: str = "embedding",
                   bucket_bits: int = BUCKET_BITS) -> DataFrame:
    """Persist-at-embed-time surface: adds `sig` (int64 hyperplane
    signature) and `bucket` (top `bucket_bits` bits — the partition key
    of the ANN layout). Compute once, write once; every downstream ANN /
    dedup pass reuses the columns instead of re-hashing the corpus."""
    return (df.withColumn("sig", sig64_udf(F.col(vec_col)))
            .withColumn("bucket",
                        F.shiftrightunsigned("sig", NBITS - bucket_bits)
                        .cast("int")))


def bucket_of(sig: int, bucket_bits: int = BUCKET_BITS) -> int:
    return (sig & 0xFFFFFFFFFFFFFFFF) >> (NBITS - bucket_bits)


def probe_buckets(query_vec: list[float], bucket_bits: int = BUCKET_BITS,
                  n_flip_bits: int = 5) -> list[int]:
    """Query-directed multi-probe (Lv et al., VLDB'07 shape): enumerate
    the 2^n buckets reachable by flipping subsets of the `n_flip_bits`
    LOWEST-MARGIN prefix bits — the planes the query is closest to, i.e.
    the bits a true neighbor is most likely to flip. Dominates a
    hamming-ball probe measured on planted near-dups: 32 buckets (12.5%
    scan) reach recall 1.00 where a hamming-2 ball needs 37 buckets for
    0.97."""
    qv = np.asarray(query_vec, dtype=np.float64)
    base = bucket_of(sig64_py(list(qv)), bucket_bits)
    n_flip_bits = min(n_flip_bits, bucket_bits)
    # prefix bit f ↔ hyperplane NBITS - bucket_bits + f
    margins = np.abs(_HYPERPLANES[NBITS - bucket_bits:NBITS] @ qv)
    low = np.argsort(margins)[:n_flip_bits]
    out = set()
    for r in range(n_flip_bits + 1):
        for flip in combinations(low, r):
            m = 0
            for f in flip:
                m |= 1 << int(f)
            out.add(base ^ m)
    return sorted(out)


# --------------------------------------------------------- ANN index

def build_ann_index(df: DataFrame, root: str, vec_col: str = "embedding",
                    id_col: str = "vec_id",
                    bucket_bits: int = BUCKET_BITS) -> None:
    """Persist a bucket-partitioned ANN index: parquet partitioned by the
    signature-prefix bucket, carrying (id, vector, full signature).
    Queries prune to probed bucket directories — the scan reads only the
    probed fraction of the corpus (plan-pinned in tests/test_plans.py)."""
    (with_signature(df.select(F.col(id_col).alias("vec_id"),
                              F.col(vec_col).alias("embedding")),
                    "embedding", bucket_bits)
     # one output file per bucket dir, not (tasks × buckets) small files
     .repartition(2 ** bucket_bits, "bucket")
     .write.mode("overwrite").partitionBy("bucket").parquet(root))


def ann_index_search(spark: SparkSession, root: str, query_vec: list[float],
                     k: int = 10, probe_hamming: int = 16,
                     n_flip_bits: int = 5,
                     bucket_bits: int = BUCKET_BITS,
                     shortlist: int | None = None) -> DataFrame:
    """Approximate top-k over a persisted ANN index.

    Scan ∝ probed buckets (query-directed multi-probe + partition
    pruning: 2^n_flip_bits of 2^bucket_bits directories) → full-signature
    hamming filter (cheap int ops on the persisted sig — no vector math)
    → exact cosine only for survivors. Approximate recall, exact scores.

    The hamming cutoff alone is a CLIFF: on a corpus with no true near
    neighbors (random vectors sit at expected hamming ≈ 32 ± 4 of 64),
    nothing survives ``ham <= 16`` and a top-k query returns almost no
    rows. So the candidate set is the cutoff survivors UNION the
    `shortlist` lowest-hamming vectors of the probed buckets (default
    max(4k, 64); a TakeOrdered over the pruned scan, never a global
    sort) — k rows come back whenever the probed buckets hold k vectors,
    ranked by exact cosine. The union only ADDS candidates, so with
    probe_hamming=64 and all buckets probed the search still degenerates
    to exhaustive brute force (pinned in tests), and on a near-dup-heavy
    corpus the cutoff survivors dominate exactly as before."""
    qsig = sig64_py(query_vec)
    buckets = probe_buckets(query_vec, bucket_bits, n_flip_bits)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    idx = (spark.read.parquet(root).filter(F.col("bucket").isin(buckets))
           .withColumn("_ham",
                       F.bit_count(F.col("sig").bitwiseXOR(F.lit(qsig)))))
    cap = max(shortlist if shortlist is not None else 4 * k, k, 64)
    cand = (idx.filter(F.col("_ham") <= probe_hamming)
            .unionByName(idx.orderBy(F.asc("_ham"), F.asc("vec_id")).limit(cap))
            .dropDuplicates(["vec_id"]))
    return (cand
            .select("vec_id",
                    F.round(cosine_expr(F.col("embedding"), q), 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(k))


def lsh_ann_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 probe_hamming: int = 16,
                 shortlist: int | None = None) -> DataFrame:
    """Ad-hoc (no persisted index) approximate top-k: score only vectors
    whose 64-bit hyperplane signature is within `probe_hamming` bits of
    the query's, backfilled with the `shortlist` lowest-hamming vectors
    so k rows come back even when nothing clears the cutoff (same
    cliff-vs-shortlist reasoning as ann_index_search). One signature
    matmul pass over the input — for repeated queries build_ann_index +
    ann_index_search is the real path (the signature is persisted and
    the scan bucket-pruned)."""
    qsig = sig64_py(query_vec)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    # reuse a persisted signature column (with_signature at embed time)
    # instead of re-hashing the corpus per query
    sig = F.col("sig") if "sig" in df.columns else sig64_udf(F.col(vec_col))
    hamed = df.withColumn("_ham", sig.bitwiseXOR(F.lit(qsig))) \
              .withColumn("_ham", F.bit_count(F.col("_ham")))
    cap = max(shortlist if shortlist is not None else 4 * k, k, 64)
    cand = (hamed.filter(F.col("_ham") <= probe_hamming)
            .unionByName(hamed.orderBy(F.asc("_ham"), F.asc(id_col)).limit(cap))
            .dropDuplicates([id_col]))
    return (
        cand
        .select(F.col(id_col),
                F.round(cosine_expr(F.col(vec_col), q), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


# ------------------------------------------------------------- dup pairs

def cosine_dup_pairs(df: DataFrame, threshold: float = 0.9,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     strategy: str = "auto",
                     broadcast_max_rows: int = 200_000,
                     block_rows: int = 100_000,
                     max_blocks: int = 64) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) for all
    pairs with cosine >= threshold — EXACT (the verification oracle for
    lsh_dup_pairs; exact all-pairs is O(N²) FLOPs by definition).

    strategy:
    - 'broadcast': the input matrix is broadcast and each partition
      multiplies its rows against it (fastest when the matrix fits).
    - 'block': no driver collect, no full broadcast — rows hash into B
      blocks; each of the B(B+1)/2 block pairs is one task doing a
      sub-matrix BLAS matmul. Replication factor B+1; per-task memory
      2·(N/B) vectors.
    - 'auto': broadcast only when BOTH the row count and the estimated
      matrix bytes (rows × dim × 8) fit — 200k rows of 4k-dim fp64 is a
      6.4 GB broadcast, which must go through the block path.
    """
    BROADCAST_MAX_BYTES = 512 << 20
    if strategy == "auto":
        # one job for both stats (count + a first-row dim), not two
        # back-to-back actions each paying the scheduling floor
        r = df.agg(F.count(F.lit(1)).alias("n"),
                   F.first(F.size(vec_col), ignorenulls=True)
                   .alias("d")).first()
        n = int(r["n"])
        dim = int(r["d"]) if r["d"] is not None else 0
        strategy = ("broadcast"
                    if n <= broadcast_max_rows
                    and n * dim * 8 <= BROADCAST_MAX_BYTES else "block")
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if strategy == "broadcast":
        return _dup_pairs_broadcast(base, threshold)
    return _dup_pairs_block(base, threshold, block_rows, max_blocks)


def _candidate_pairs(sims: np.ndarray, th: float):
    """(row_idx, col_idx, rounded_cosine) for entries with round(sims, 6)
    >= th — rounding only the CANDIDATES. round(x, 6) >= th implies
    x >= th - 1e-6 for any th on the 1e-6 grid or off it, so the raw
    prefilter is a strict superset and the re-filter on the rounded
    values is exact. The round-5 kernels rounded the FULL n×m matrix and
    materialized a second n×m boolean for the id-order mask — two extra
    full-matrix passes that cost as much as the matmul itself."""
    li, gi = np.nonzero(sims >= th - 1e-6)
    if not li.size:
        return li, gi, np.empty(0, dtype=np.float64)
    vals = np.round(sims[li, gi], 6)
    m = vals >= th
    return li[m], gi[m], vals[m]


def _dup_pairs_broadcast(base: DataFrame, threshold: float) -> DataFrame:
    # Arrow transfer (toPandas), not a row collect — the driver pull of
    # the id+vector table is the fixed cost of this strategy
    pdf = base.toPandas()
    ids = pdf["id"].to_numpy(dtype=np.int64)
    mat = np.array(pdf["v"].tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    # pre-normalize ONCE: the batch matmul then yields cosines directly,
    # instead of two further full-matrix division passes per batch
    mat /= norms[:, None]
    spark = base.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    th = float(threshold)

    def block(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            bid = pdf["id"].to_numpy(dtype=np.int64)
            bv = np.array(pdf["v"].tolist(), dtype=np.float64)
            bn = np.linalg.norm(bv, axis=1)
            bn[bn == 0] = 1.0
            sims = (bv / bn[:, None]) @ all_mat.T
            li, gi, vals = _candidate_pairs(sims, th)
            keep = bid[li] < all_ids[gi]
            yield pd.DataFrame({
                "id_a": bid[li[keep]], "id_b": all_ids[gi[keep]],
                "cosine": vals[keep]})

    return base.mapInPandas(block, schema="id_a long, id_b long, cosine double")


def _dup_pairs_block(base: DataFrame, threshold: float,
                     block_rows: int, max_blocks: int) -> DataFrame:
    n = base.count()
    nblk = int(min(max_blocks, max(2, -(-n // block_rows))))
    th = float(threshold)
    blk = F.pmod(F.xxhash64("id"), F.lit(nblk)).cast("int")
    tagged = base.withColumn("blk", blk)
    # role 0 rows fan out to every block pair (blk, j≥blk); role 1 rows to
    # every (i≤blk, blk) — each unordered block pair gets both sides once
    a = (tagged.withColumn("j", F.explode(F.sequence(F.col("blk"),
                                                     F.lit(nblk - 1))))
         .select("id", "v", F.col("blk").alias("i"), "j",
                 F.lit(0).alias("role")))
    b = (tagged.withColumn("i", F.explode(F.sequence(F.lit(0), F.col("blk"))))
         .select("id", "v", "i", F.col("blk").alias("j"),
                 F.lit(1).alias("role")))

    def kernel(key, pdf):
        i, j = int(key[0]), int(key[1])
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "cosine": pd.Series([], dtype="float64")})
        A = pdf[pdf["role"] == 0]
        Bm = A if i == j else pdf[pdf["role"] == 1]
        if A.empty or Bm.empty:
            return empty
        aid = A["id"].to_numpy(dtype=np.int64)
        av = np.array(A["v"].tolist(), dtype=np.float64)
        an = np.linalg.norm(av, axis=1)
        an[an == 0] = 1.0
        av = av / an[:, None]
        if i == j:
            bid, bv = aid, av
        else:
            bid = Bm["id"].to_numpy(dtype=np.int64)
            bv = np.array(Bm["v"].tolist(), dtype=np.float64)
            bn = np.linalg.norm(bv, axis=1)
            bn[bn == 0] = 1.0
            bv = bv / bn[:, None]
        sims = av @ bv.T
        li, gi, vals = _candidate_pairs(sims, th)
        m = aid[li] != bid[gi]
        li, gi, vals = li[m], gi[m], vals[m]
        ia, ib = aid[li], bid[gi]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        out = pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": vals})
        if i == j:
            # diagonal block: each unordered pair appears twice (x,y)+(y,x)
            out = out.drop_duplicates(["id_a", "id_b"])
        return out

    return (a.unionByName(b).groupBy("i", "j")
            .applyInPandas(kernel, schema="id_a long, id_b long, cosine double"))


def lsh_dup_pairs(df: DataFrame, threshold: float = 0.9,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  band_bits: int = 8,
                  bucket_cap: int | None = 100_000) -> DataFrame:
    """Scale path for cosine near-dup pairs: candidates share one of
    NBITS/band_bits signature bands (8 × 8 bits by default = 256-way
    buckets per band, 64 signature bits total); verified with exact
    cosine. Approximate recall, exact precision (tested vs
    cosine_dup_pairs).

    Shuffle shape: the band fan-out, self-join and candidate dedup all
    carry ONLY (id, sig) — 16 bytes/row — never the embedding vector;
    vectors are re-attached by two joins ONCE per surviving candidate
    pair, right before the exact-cosine verify (plan-pinned in
    tests/test_plans.py: no array column crosses the banding exchange).
    At corpus scale the 8-way explode of full vectors was the dominant
    shuffle cost of this operator.

    `bucket_cap`: (band, bucket) groups larger than the cap are skipped
    before the self-join — a degenerate bucket of M docs would emit
    M²/2 candidate rows. Standard LSH practice: a pair lost this way
    had EVERY one of its shared bands oversubscribed."""
    n_bands = NBITS // band_bits
    mask = (1 << band_bits) - 1
    if "sig" in df.columns:
        # persisted signature (with_signature at embed time): no re-hash
        base = df.select(F.col(id_col).alias("id"),
                         F.col(vec_col).alias("v"), "sig")
    else:
        base = with_signature(
            df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
            "v")
    banded = base.select(
        "id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftrightunsigned("sig", i * band_bits)
                     .bitwiseAND(F.lit(mask)).alias("bucket"))
            for i in range(n_bands)
        ])).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    if bucket_cap is not None:
        sizes = (banded.groupBy("band", "bucket")
                 .agg(F.count("*").alias("_bsz"))
                 .filter(F.col("_bsz") <= bucket_cap))
        banded = banded.join(sizes.select("band", "bucket"), ["band", "bucket"])
    # join strategy deliberately left to the planner: the banded side
    # is (id, band, bucket) rows only — N x n_bands of 16 B — and a
    # within-session alternating A/B at the 10x scale measured the
    # planner's broadcast FASTEST for this join (medians: broadcast
    # 2.9 s, shuffle-hash 4.4, shuffle-merge 5.3): candidates stream
    # out of map-side hash probes with no candidate-scale exchange
    a, b = banded.alias("a"), banded.alias("b")
    cand_raw = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")))
    # exact-cosine verify. When the (id, vector) table fits the same
    # broadcast gate cosine_dup_pairs uses, candidates verify in ONE
    # vectorized kernel against the broadcast normalized matrix — only
    # 16-byte id pairs ever flow, and the per-pair work is a BLAS row
    # dot instead of two candidate-sized vector-attach joins plus an
    # interpreted 64-element fold per pair (the round-5 shape: ~30M
    # candidates at sf1.0 shuffled ~15 GB of vectors through the
    # verify). Past the gate, the join form remains the scale path.
    th = float(threshold)
    r = df.agg(F.count(F.lit(1)).alias("n"),
               F.first(F.size(vec_col), ignorenulls=True).alias("d")).first()
    n, dim = int(r["n"]), int(r["d"] or 0)
    if n <= 200_000 and n * dim * 8 <= (512 << 20):
        pdf = base.select("id", "v").toPandas()
        ids = pdf["id"].to_numpy(dtype=np.int64)
        mat = np.array(pdf["v"].tolist(), dtype=np.float64)
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat /= norms[:, None]
        bc = df.sparkSession.sparkContext.broadcast((ids, mat))

        # keep the candidate-level distinct: skipping it and verifying
        # the raw band-collision multiset was measured SLOWER at sf1.0
        # (9.5 s vs 7.5 s — the extra ~9M duplicate rows through the
        # Arrow boundary cost more than the dedup exchange saves).
        # When both ids fit 31 bits (known for free — the id vector is
        # already on the driver), the pair is PACKED into one long
        # before the distinct: the dominant exchange and the Arrow
        # transfer carry 8-byte keys instead of 16, and the hash/dedup
        # works one field. Beyond 31 bits the two-column form remains.
        if ids.size and ids.min() >= 0 and ids.max() < (1 << 31):
            packed = cand_raw.select(
                F.shiftleft(F.col("id_a"), 32).bitwiseOR(F.col("id_b"))
                .alias("p")).distinct()

            def verify_packed(batches):
                bids, bmat = bc.value
                for b_ in batches:
                    p = b_["p"].to_numpy(np.int64)
                    aid = p >> 32
                    bid2 = p & np.int64(0x7FFFFFFF)
                    ia = np.searchsorted(bids, aid)
                    ib = np.searchsorted(bids, bid2)
                    vals = np.round((bmat[ia] * bmat[ib]).sum(axis=1), 6)
                    m = vals >= th
                    yield pd.DataFrame({"id_a": aid[m], "id_b": bid2[m],
                                        "cosine": vals[m]})

            return packed.mapInPandas(
                verify_packed, schema="id_a long, id_b long, cosine double")

        def verify(batches):
            bids, bmat = bc.value
            for b_ in batches:
                ia = np.searchsorted(bids, b_["id_a"].to_numpy(np.int64))
                ib = np.searchsorted(bids, b_["id_b"].to_numpy(np.int64))
                vals = np.round((bmat[ia] * bmat[ib]).sum(axis=1), 6)
                m = vals >= th
                yield pd.DataFrame({"id_a": b_["id_a"].to_numpy(np.int64)[m],
                                    "id_b": b_["id_b"].to_numpy(np.int64)[m],
                                    "cosine": vals[m]})

        return cand_raw.distinct().mapInPandas(
            verify, schema="id_a long, id_b long, cosine double")
    # join path: dedup candidates BEFORE attaching vectors (a duplicate
    # candidate would re-shuffle its vectors per band collision)
    cand = cand_raw.distinct()
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (cand.join(va, "id_a").join(vb, "id_b")
            .withColumn(
                "cosine", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
            .filter(F.col("cosine") >= threshold)
            .select("id_a", "id_b", "cosine"))


# ------------------------------------------------------------- knn join

def knn_join(left: DataFrame, right: DataFrame, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             left_vec_col: str | None = None,
             left_id_col: str | None = None,
             exclude_self: bool = False,
             strategy: str = "auto",
             broadcast_max_rows: int = 200_000,
             block_rows: int = 100_000,
             max_blocks: int = 64) -> DataFrame:
    """EXACT batch top-k: for every left row, its k nearest right rows by
    cosine — (qid, vec_id, score), score desc / vec_id asc per qid. The
    workhorse of embedding-based curation (retrieval eval, near-dup
    attribution, hard-negative mining) and the verification oracle for
    the batched ANN path.

    strategy (same gates as cosine_dup_pairs — the RIGHT side must fit
    to broadcast; the left side streams in both forms):
    - 'broadcast': right matrix broadcast once, one mapInPandas pass over
      left, one BLAS matmul + argpartition per Arrow batch. No shuffle of
      either side; output is exactly |left|·k rows.
    - 'block': neither side collected — left hashes into BL row-blocks,
      right into BR; each (i, j) block pair is one task doing a
      sub-matrix matmul and a PARTIAL top-k (k rows per left row per
      right-block), so the only shuffle after the fan-out carries
      ≤ |left|·BR·k partial rows into a per-qid window merge — never the
      |left|×|right| score matrix.
    - 'auto': broadcast iff right rows ≤ broadcast_max_rows AND
      rows·dim·8 ≤ 512 MB.

    Tie order at the k boundary follows RAW score desc then id asc
    (matching ORDER BY cosine DESC, vec_id in SQL); with >32-way
    exact raw-score ties at the boundary (bit-identical duplicate
    vectors) the broadcast path's candidate expansion may pick a
    different id subset — dedup first if that matters.
    exclude_self drops qid == vec_id matches BEFORE top-k (self-join
    convention when left IS right)."""
    lvec = left_vec_col or vec_col
    lid = left_id_col or id_col
    lt = left.select(F.col(lid).alias("qid"), F.col(lvec).alias("qv"))
    rt = right.select(F.col(id_col).alias("rid"), F.col(vec_col).alias("rv"))
    if strategy == "auto":
        n = rt.count()
        first = rt.select(F.size("rv").alias("d")).first()
        dim = int(first["d"]) if first and first["d"] is not None else 0
        strategy = ("broadcast"
                    if n <= broadcast_max_rows
                    and n * dim * 8 <= (512 << 20) else "block")
    if strategy == "broadcast":
        return _knn_broadcast(lt, rt, k, exclude_self)
    return _knn_block(lt, rt, k, exclude_self, block_rows, max_blocks)


def _knn_topk_rows(qids: np.ndarray, sims: np.ndarray, rids: np.ndarray,
                   k: int, exclude_self: bool) -> pd.DataFrame:
    """Deterministic per-row top-k of a (|q|, |r|) raw-score block:
    argpartition to k+32 candidates, exact (score desc, id asc) lexsort
    among them, emit ≤ k rows per query. RAW scores out (rounding is the
    caller's display step — merges must compare raw)."""
    nq, nr = sims.shape
    if exclude_self:
        sims = np.where(qids[:, None] == rids[None, :], -np.inf, sims)
    m = min(nr, k + 32)
    if m < nr:
        cand = np.argpartition(-sims, m - 1, axis=1)[:, :m]
    else:
        cand = np.broadcast_to(np.arange(nr), (nq, nr))
    rows_q, rows_r, rows_s = [], [], []
    for i in range(nq):
        ci = cand[i]
        si = sims[i, ci]
        keep = si > -np.inf
        ci, si = ci[keep], si[keep]
        order = np.lexsort((rids[ci], -si))[:k]
        rows_q.append(np.full(len(order), qids[i], dtype=np.int64))
        rows_r.append(rids[ci[order]])
        rows_s.append(si[order])
    if not rows_q:
        return pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                             "vec_id": pd.Series([], dtype="int64"),
                             "_raw": pd.Series([], dtype="float64")})
    return pd.DataFrame({"qid": np.concatenate(rows_q),
                         "vec_id": np.concatenate(rows_r),
                         "_raw": np.concatenate(rows_s)})


def _knn_broadcast(lt: DataFrame, rt: DataFrame, k: int,
                   exclude_self: bool) -> DataFrame:
    rows = rt.collect()
    if not rows:
        # empty right table: no neighbors for anyone — typed empty
        # result (np.array([]) is 1-D; norm(axis=1) would AxisError)
        spark = lt.sparkSession
        return spark.createDataFrame([], "qid long, vec_id long, score double")
    rids = np.array([r["rid"] for r in rows], dtype=np.int64)
    rmat = np.array([r["rv"] for r in rows], dtype=np.float64)
    rn = np.linalg.norm(rmat, axis=1)
    rn[rn == 0] = 1.0
    spark = lt.sparkSession
    b_ids = spark.sparkContext.broadcast(rids)
    b_mat = spark.sparkContext.broadcast((rmat / rn[:, None]).T.copy())

    def scorer(batches):
        ids, matT = b_ids.value, b_mat.value
        for pdf in batches:
            if pdf.empty:
                continue
            qids = pdf["qid"].to_numpy(dtype=np.int64)
            qm = np.array(pdf["qv"].tolist(), dtype=np.float64)
            qn = np.linalg.norm(qm, axis=1)
            qn[qn == 0] = 1.0
            sims = (qm / qn[:, None]) @ matT
            yield _knn_topk_rows(qids, sims, ids, k, exclude_self)

    out = lt.mapInPandas(scorer, schema="qid long, vec_id long, _raw double")
    return (out.select("qid", "vec_id", F.round("_raw", 6).alias("score"))
            .orderBy("qid", F.desc("score"), F.asc("vec_id")))


def _knn_block(lt: DataFrame, rt: DataFrame, k: int, exclude_self: bool,
               block_rows: int, max_blocks: int) -> DataFrame:
    from pyspark.sql import Window
    nl, nr = lt.count(), rt.count()
    bl = int(min(max_blocks, max(1, -(-nl // block_rows))))
    br = int(min(max_blocks, max(1, -(-nr // block_rows))))
    a = (lt.withColumn("i", F.pmod(F.xxhash64("qid"), F.lit(bl)).cast("int"))
         .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(br - 1))))
         .select(F.col("qid").alias("id"), F.col("qv").alias("v"),
                 "i", "j", F.lit(0).alias("role")))
    b = (rt.withColumn("j", F.pmod(F.xxhash64("rid"), F.lit(br)).cast("int"))
         .withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(bl - 1))))
         .select(F.col("rid").alias("id"), F.col("rv").alias("v"),
                 "i", "j", F.lit(1).alias("role")))

    def kernel(key, pdf):
        L = pdf[pdf["role"] == 0]
        R = pdf[pdf["role"] == 1]
        if L.empty or R.empty:
            return pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                                 "vec_id": pd.Series([], dtype="int64"),
                                 "_raw": pd.Series([], dtype="float64")})
        qids = L["id"].to_numpy(dtype=np.int64)
        qm = np.array(L["v"].tolist(), dtype=np.float64)
        qn = np.linalg.norm(qm, axis=1)
        qn[qn == 0] = 1.0
        rids = R["id"].to_numpy(dtype=np.int64)
        rm = np.array(R["v"].tolist(), dtype=np.float64)
        rn = np.linalg.norm(rm, axis=1)
        rn[rn == 0] = 1.0
        sims = (qm / qn[:, None]) @ (rm / rn[:, None]).T
        return _knn_topk_rows(qids, sims, rids, k, exclude_self)

    partial = (a.unionByName(b).groupBy("i", "j")
               .applyInPandas(kernel, schema="qid long, vec_id long, _raw double"))
    w = Window.partitionBy("qid").orderBy(F.desc("_raw"), F.asc("vec_id"))
    return (partial.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("qid", "vec_id", F.round("_raw", 6).alias("score"))
            .orderBy("qid", F.desc("score"), F.asc("vec_id")))


def ann_index_search_batch(spark: SparkSession, root: str,
                           queries: DataFrame,
                           k: int = 10, probe_hamming: int = 16,
                           n_flip_bits: int = 5,
                           bucket_bits: int = BUCKET_BITS,
                           shortlist: int | None = None,
                           qid_col: str = "qid",
                           vec_col: str = "embedding") -> DataFrame:
    """Batched approximate top-k over a persisted ANN index: one job for
    a whole (qid, vector) query table — (qid, vec_id, score), k rows per
    qid, same candidate semantics as ann_index_search per query (hamming
    cutoff survivors plus the lowest-hamming shortlist, exact rescoring;
    identity vs the single-query path is pytest-pinned).

    Scale shape: per-query signatures + probe buckets are computed
    DISTRIBUTED (one Arrow batch pass over the query table — the only
    per-query Python, Q·2^n_flip_bits tiny probe rows out); the index
    scan is pruned to the UNION of probed buckets (collected driver-side
    — bounded by 2^bucket_bits = {256} ints, never by Q); the probe
    table broadcast-joins the pruned scan on bucket, so index rows
    never shuffle. The per-qid shortlist window ranks each query's
    PROBED rows (the same per-query work the single-query path's
    TakeOrdered does — ∝ probed fraction, never the whole corpus); the
    final top-k window sees only cutoff-or-shortlist survivors."""
    from pyspark.sql import Window
    from pyspark.sql.types import (ArrayType, IntegerType, LongType as LT,
                                   StructField, StructType)
    cap = max(shortlist if shortlist is not None else 4 * k, k, 64)

    probe_schema = StructType([
        StructField("qid", LT()), StructField("qsig", LT()),
        StructField("bucket", ArrayType(IntegerType()))])

    def probes(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            qids = pdf[qid_col].to_numpy(dtype=np.int64)
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            sigs = _sig_batch(mat)
            bks = [probe_buckets(list(mat[i]), bucket_bits, n_flip_bits)
                   for i in range(len(qids))]
            yield pd.DataFrame({"qid": qids, "qsig": sigs, "bucket": bks})

    qv = queries.select(F.col(qid_col).alias("_qid"),
                        F.col(vec_col).alias("_qv"))
    probe = (queries.select(qid_col, vec_col)
             .mapInPandas(probes, schema=probe_schema)
             .select("qid", "qsig", F.explode("bucket").alias("bucket")))
    # one tiny job: the distinct probed-bucket list (≤ 2^bucket_bits
    # ints regardless of Q) drives static partition pruning of the scan;
    # the probe table itself recomputes in the main plan — one Arrow
    # batch pass over the query table, cheaper than managing a persist
    buckets = [r["bucket"] for r in
               probe.select("bucket").distinct().collect()]
    idx = spark.read.parquet(root).filter(F.col("bucket").isin(buckets))
    cand = (idx.join(F.broadcast(probe), "bucket")
            .withColumn("_ham", F.bit_count(
                F.col("sig").bitwiseXOR(F.col("qsig")))))
    wham = Window.partitionBy("qid").orderBy(F.asc("_ham"), F.asc("vec_id"))
    cand = (cand.withColumn("_hrn", F.row_number().over(wham))
            .filter((F.col("_ham") <= probe_hamming)
                    | (F.col("_hrn") <= cap)))
    scored = (cand.join(F.broadcast(qv), cand["qid"] == qv["_qid"])
              .select("qid", "vec_id",
                      F.round(cosine_expr(F.col("embedding"),
                                          F.col("_qv")), 6).alias("score")))
    wtop = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    return (scored.withColumn("_rn", F.row_number().over(wtop))
            .filter(F.col("_rn") <= k)
            .select("qid", "vec_id", "score")
            .orderBy("qid", F.desc("score"), F.asc("vec_id")))


# --------------------------------------------------------- IVF index

def _spherical_kmeans(mat: np.ndarray, n_centroids: int,
                      iters: int = 15) -> np.ndarray:
    """Deterministic spherical k-means (numpy, driver-side — the input
    is a BOUNDED sample, never the corpus). Rows are L2-normalized;
    assignment is argmax dot; centroids are renormalized means.
    Init: evenly spaced rows of the (id-ordered) sample — deterministic
    with no RNG. Empty cells re-seed from the currently worst-fit row,
    largest-residual first, so every cell stays populated."""
    n = len(mat)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    x = mat / norms[:, None]
    k = min(n_centroids, n)
    cent = x[np.linspace(0, n - 1, k).astype(np.int64)].copy()
    for _ in range(iters):
        sims = x @ cent.T                       # (n, k)
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(n), assign]
        newc = np.zeros_like(cent)
        counts = np.bincount(assign, minlength=k)
        np.add.at(newc, assign, x)
        empty = np.flatnonzero(counts == 0)
        if len(empty):
            worst = np.argsort(best)[:len(empty)]
            for e, w in zip(empty, worst):
                newc[e] = x[w]
                counts[e] = 1
        newc /= counts[:, None]
        cn = np.linalg.norm(newc, axis=1)
        cn[cn == 0] = 1.0
        newc /= cn[:, None]
        if np.allclose(newc, cent, atol=1e-9):
            cent = newc
            break
        cent = newc
    return cent


def build_ivf_index(df: DataFrame, root: str, n_centroids: int = 64,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    sample_rows: int = 100_000, sample_mod: int = 1,
                    iters: int = 15) -> None:
    """Persist an IVF (inverted-file) ANN index: spherical-k-means cells
    instead of hyperplane buckets — the cells ADAPT to the data's actual
    density where LSH planes are data-blind, the standard IVF trade
    (Jégou et al., PAMI'11 shape; reference parity target is the same
    semantic search surface as embed/search in semantic_functions.py).

    100-TB shape: training reads a BOUNDED deterministic sample
    (xxhash64(id) % sample_mod == 0, capped to sample_rows lowest ids —
    a per-task heap TakeOrdered, never a global sort; raise sample_mod
    so the hash filter, which parquet scans can evaluate cheaply, does
    the bulk of the thinning at corpus scale) and runs numpy k-means on
    the driver; assignment is one broadcast-centroid matmul per Arrow
    batch over the corpus; the layout is parquet partitioned by `cell`
    so probes prune partitions exactly like the LSH index. Centroids
    live under `<root>/_centroids` — underscore-prefixed, so corpus
    scans of <root> never pick them up as data."""
    vecs = df.select(F.col(id_col).alias("vec_id"),
                     F.col(vec_col).alias("embedding"))
    samp = vecs
    if sample_mod > 1:
        samp = samp.filter(F.pmod(F.xxhash64("vec_id"),
                                  F.lit(sample_mod)) == 0)
    # Arrow transfer (toPandas), not a row collect — same swap as the
    # dup-pair kernels; the sample is the fixed driver-side cost here
    pdf_s = (samp.orderBy("vec_id").limit(sample_rows)
             .select("embedding").toPandas())
    if pdf_s.empty:
        raise ValueError(
            "build_ivf_index: training sample is empty (input has no "
            "rows, or sample_mod filtered everything) — lower sample_mod "
            "or check the input table")
    mat = np.array(pdf_s["embedding"].tolist(), dtype=np.float64)
    cent = _spherical_kmeans(mat, n_centroids, iters)
    spark = df.sparkSession
    b_cent = spark.sparkContext.broadcast(cent.T.copy())

    def assigner(batches):
        ct = b_cent.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            nm = np.linalg.norm(m, axis=1)
            nm[nm == 0] = 1.0
            cell = np.argmax((m / nm[:, None]) @ ct, axis=1).astype(np.int32)
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                "embedding": pdf["embedding"],
                                "cell": cell})
    k = cent.shape[0]
    (vecs.mapInPandas(assigner,
                      schema="vec_id long, embedding array<double>, cell int")
     .repartition(k, "cell")
     .write.mode("overwrite").partitionBy("cell").parquet(root))
    # repartition(1), NOT coalesce(1): a rows-list createDataFrame is a
    # 32-slice pickled-Python relation, and coalesce makes ONE task
    # evaluate all slices SERIALLY through the Python runner (measured
    # 3.8-5.0 s for 32 rows); the shuffle evaluates them in parallel and
    # one task writes (0.4 s). Readers collect + index by cell id, so
    # file row order is immaterial.
    spark.createDataFrame(
        [(int(i), [float(v) for v in cent[i]]) for i in range(k)],
        "cell int, centroid array<double>") \
        .repartition(1).write.mode("overwrite").parquet(root + "/_centroids")


def ivf_search(spark: SparkSession, root: str, query_vec: list[float],
               k: int = 10, nprobe: int = 8) -> DataFrame:
    """Approximate top-k over a persisted IVF index: rank cells by
    query-centroid cosine (driver-side — n_centroids rows), scan only
    the nprobe best cells (partition-pruned), rescore candidates with
    EXACT cosine. Approximate in recall only; with nprobe >= n_centroids
    it degenerates to exhaustive brute force (pinned in tests). No
    shortlist cliff to manage: every probed row is scored, so k rows
    come back whenever the probed cells hold k vectors."""
    cent_rows = spark.read.parquet(root + "/_centroids").collect()
    cells = np.array([r["cell"] for r in cent_rows], dtype=np.int64)
    cmat = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    qv = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(qv)
    sims = cmat @ (qv / (qn if qn else 1.0))
    order = np.lexsort((cells, -sims))[:max(1, nprobe)]
    probed = [int(c) for c in cells[order]]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (spark.read.parquet(root)
            .filter(F.col("cell").isin(probed))
            .select("vec_id",
                    F.round(cosine_expr(F.col("embedding"), q), 6).alias("score"))
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(k))


def ivf_search_batch(spark: SparkSession, root: str, queries: DataFrame,
                     k: int = 10, nprobe: int = 8,
                     qid_col: str = "qid",
                     vec_col: str = "embedding") -> DataFrame:
    """Batched IVF search: one job for a whole (qid, vector) query
    table — (qid, vec_id, score), k rows per qid, per-query candidate
    semantics identical to ivf_search (identity pytest-pinned).

    Scale shape mirrors ann_index_search_batch: per-query cell ranking
    runs DISTRIBUTED (one Arrow pass over the query table against the
    broadcast centroid matrix — Q·nprobe tiny probe rows out); the
    index scan is pruned to the UNION of probed cells (collected
    driver-side — bounded by n_centroids ints, never by Q); the probe
    table broadcast-joins the pruned scan on cell, so index rows never
    shuffle; exact rescoring + per-qid top-k window over probed rows
    only."""
    from pyspark.sql import Window
    cent_rows = spark.read.parquet(root + "/_centroids").collect()
    cells = np.array([r["cell"] for r in cent_rows], dtype=np.int64)
    cmat = np.array([r["centroid"] for r in cent_rows], dtype=np.float64)
    b_cent = spark.sparkContext.broadcast((cells, cmat.T.copy()))
    npb = max(1, min(nprobe, len(cells)))

    def probes(batches):
        cs, ct = b_cent.value
        for pdf in batches:
            if pdf.empty:
                continue
            qids = pdf[qid_col].to_numpy(dtype=np.int64)
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            nm = np.linalg.norm(m, axis=1)
            nm[nm == 0] = 1.0
            sims = (m / nm[:, None]) @ ct            # (Q, n_centroids)
            # same (sim desc, cell asc) order as the single-query path
            order = np.lexsort((np.broadcast_to(cs, sims.shape),
                                -sims), axis=1)[:, :npb]
            yield pd.DataFrame({
                "qid": np.repeat(qids, npb),
                "cell": cs[order.ravel()].astype(np.int32)})

    probe = queries.select(qid_col, vec_col).mapInPandas(
        probes, schema="qid long, cell int")
    probed = [r["cell"] for r in probe.select("cell").distinct().collect()]
    qv = queries.select(F.col(qid_col).alias("_qid"),
                        F.col(vec_col).alias("_qv"))
    idx = spark.read.parquet(root).filter(F.col("cell").isin(probed))
    cand = idx.join(F.broadcast(probe), "cell")
    scored = (cand.join(F.broadcast(qv), cand["qid"] == qv["_qid"])
              .select("qid", "vec_id",
                      F.round(cosine_expr(F.col("embedding"),
                                          F.col("_qv")), 6).alias("score")))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("qid", "vec_id", "score")
            .orderBy("qid", F.desc("score"), F.asc("vec_id")))


# --------------------------------------------------- SemDeDup clusters

def semdedup_pairs(df: DataFrame, threshold: float = 0.9,
                   n_clusters: int = 64,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   sample_rows: int = 100_000, sample_mod: int = 1,
                   iters: int = 15,
                   cluster_cap: int = 100_000) -> DataFrame:
    """SemDeDup-shaped semantic near-duplicate pairs (Abbas et al.,
    arXiv:2303.09540): spherical-k-means clusters bound the pairwise
    comparison, then EXACT cosine within each cluster — (id_a, id_b,
    cosine) for intra-cluster pairs with cosine >= threshold, id_a <
    id_b. Feed the pairs to dedup.dup_clusters /
    dedup.dedup_keep_canonical to resolve keep/drop sets, exactly like
    the LSH and exact pair generators.

    Exact precision (every emitted pair is a true >= threshold pair —
    the per-round semdedup_cert anti-joins the output against the exact
    all-pairs set); approximate recall (a near-dup pair split across a
    cluster boundary is missed — the SemDeDup trade; planted-copy
    recall pinned in pytest). Centroid training reads the same BOUNDED
    deterministic sample as build_ivf_index; comparisons are one BLAS
    matmul per cluster with per-pass memory O((cluster size)²) — at
    corpus scale pick n_clusters so clusters stay ~sqrt-sized, and
    `cluster_cap` hard-bounds the quadratic term: an oversized cluster
    compares only its cluster_cap LOWEST ids (deterministic;
    recall-only effect, precision certificate unaffected)."""
    vecs = df.select(F.col(id_col).alias("vec_id"),
                     F.col(vec_col).alias("embedding"))
    samp = vecs
    if sample_mod > 1:
        samp = samp.filter(F.pmod(F.xxhash64("vec_id"),
                                  F.lit(sample_mod)) == 0)
    rows = (samp.orderBy("vec_id").limit(sample_rows)
            .select("embedding").collect())
    if not rows:
        raise ValueError(
            "semdedup_pairs: centroid training sample is empty — lower "
            "sample_mod or check the input table")
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cent = _spherical_kmeans(mat, n_clusters, iters)
    spark = df.sparkSession
    b_cent = spark.sparkContext.broadcast(cent.T.copy())
    th, cap = float(threshold), int(cluster_cap)

    def assigner(batches):
        ct = b_cent.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            nm = np.linalg.norm(m, axis=1)
            nm[nm == 0] = 1.0
            cell = np.argmax((m / nm[:, None]) @ ct, axis=1).astype(np.int32)
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                "embedding": pdf["embedding"],
                                "cell": cell})

    def pairs_kernel(key, pdf):
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "cosine": pd.Series([], dtype="float64")})
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("vec_id").head(cap)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        nm = np.linalg.norm(m, axis=1)
        nm[nm == 0] = 1.0
        # same arithmetic + rounding as cosine_dup_pairs' exact kernels,
        # so certificate anti-joins match bit-for-bit
        sims = np.round((m @ m.T) / nm[:, None] / nm[None, :], 6)
        li, gi = np.nonzero((sims >= th) & (ids[:, None] < ids[None, :]))
        if not len(li):
            return empty
        return pd.DataFrame({"id_a": ids[li], "id_b": ids[gi],
                             "cosine": sims[li, gi]})

    assigned = vecs.mapInPandas(
        assigner, schema="vec_id long, embedding array<double>, cell int")
    return (assigned.groupBy("cell")
            .applyInPandas(pairs_kernel,
                           schema="id_a long, id_b long, cosine double")
            .orderBy("id_a", "id_b"))
