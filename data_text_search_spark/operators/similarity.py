"""Similarity search over an embedding column (array<float>).

- cosine_topk: exact brute-force scorer — JVM-side dot product via
  zip_with/aggregate (no Python in the plan), TakeOrderedAndProject
  top-k. The baseline and the verification oracle.
- lsh_ann_topk: the scale path — random-hyperplane LSH buckets; the
  query probes buckets within `probe_hamming` of its own signature, so
  only a fraction of the corpus is scored. Approximate recall, exact
  scores; tested against the brute-force path.

The reference's semantic search (semantic_functions.py:239-368) is the
same shape: normalize, dot product, sort desc, head k (its model-based
embedder is stubbed here — no model in the sandbox; the driver's
embeddings table stands in).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMB_DIM = 64  # driver embeddings table dimension


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


def cosine_dup_pairs(df: DataFrame, threshold: float = 0.9,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) for all
    pairs with cosine >= threshold — exact.

    Physical shape: the vector matrix is broadcast (numpy float64) and
    each partition multiplies its block against it (BLAS matmul inside
    mapInPandas) — a row-pair SQL self-join re-evaluates the 64-dim dot
    per pair in interpreted HOF lambdas and is ~50x slower. This is the
    verification baseline; for corpora whose matrix can't broadcast,
    bucket with the hyperplane signature first (lsh_dup_pairs)."""
    import pandas as pd

    rows = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).alias("v")).collect()
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)
    th = float(threshold)

    def block(batches):
        all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            bid = pdf["id"].to_numpy(dtype=np.int64)
            bv = np.array(pdf["v"].tolist(), dtype=np.float64)
            bn = np.linalg.norm(bv, axis=1)
            bn[bn == 0] = 1.0
            sims = (bv @ all_mat.T) / bn[:, None] / all_norms[None, :]
            sims = np.round(sims, 6)
            li, gi = np.nonzero((sims >= th) & (bid[:, None] < all_ids[None, :]))
            yield pd.DataFrame({
                "id_a": bid[li], "id_b": all_ids[gi],
                "cosine": sims[li, gi]})

    return (df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .mapInPandas(block, schema="id_a long, id_b long, cosine double"))


def lsh_dup_pairs(df: DataFrame, threshold: float = 0.9,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  band_bits: int = 8) -> DataFrame:
    """Scale path for cosine near-dup pairs: candidates share one of two
    hyperplane-signature bands (8 bits each); verified with exact cosine.
    Approximate recall, exact precision (tested vs cosine_dup_pairs)."""
    sig = _sig_expr(vec_col)
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                     sig.alias("sig"))
    banded = base.select(
        "id", "v",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftrightunsigned("sig", i * band_bits)
                     .bitwiseAND(F.lit((1 << band_bits) - 1)).alias("bucket"))
            for i in range(16 // band_bits)
        ])).alias("bb"),
    ).select("id", "v", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.v").alias("va"), F.col("b.v").alias("vb"))
            .dropDuplicates(["id_a", "id_b"]))
    return (cand.withColumn(
        "cosine", F.round(cosine_expr(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine"))


# ------------------------------------------------------------- LSH ANN

_rs = np.random.RandomState(0x5EED)
_HYPERPLANES = _rs.standard_normal((16, EMB_DIM))  # 16-bit signatures


def _sig_expr(vec_col: str) -> Column:
    """16-bit hyperplane signature, computed JVM-side: bit i = sign of
    dot(vec, hyperplane_i)."""
    sig = F.lit(0).cast("int")
    for i, hp in enumerate(_HYPERPLANES):
        plane = F.array(*[F.lit(float(v)) for v in hp])
        bit = F.when(_dot(F.col(vec_col), plane) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = sig + bit
    return sig


def lsh_ann_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 probe_hamming: int = 2) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane signature is
    within `probe_hamming` bits of the query's. (vec_id, score)."""
    qsig = 0
    qv = np.asarray(query_vec, dtype=np.float64)
    for i, hp in enumerate(_HYPERPLANES):
        if float(qv @ hp) > 0:
            qsig |= 1 << i
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sig = _sig_expr(vec_col)
    ham = F.bit_count(sig.bitwiseXOR(F.lit(qsig)))
    return (
        df.withColumn("_ham", ham)
        .filter(F.col("_ham") <= probe_hamming)
        .select(F.col(id_col),
                F.round(cosine_expr(F.col(vec_col), q), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
