"""Semantic search path — the reference's dense-vector mode
(semantic_functions.py:239-368) over an embeddings table.

The reference embeds with MiniLM (no model in this sandbox); the
embedder is a pluggable interface with a deterministic stub, and the
operator contract — normalize, cosine, top-k, score cutoff, min-length
filter — is what's reproduced and tested. The driver's `embeddings`
table provides real vectors for the oracle-checked path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_text_search_spark.operators.similarity import cosine_expr

DEFAULT_CUTOFF = 0.2   # app.py:147
DEFAULT_K = 9999       # app.py:57
MIN_DOC_CHARS = 100    # semantic_functions.py:200-206


class StubEmbedder:
    """Deterministic hashing-projection embedder (seeded), standing in for
    sentence-transformers (semantic_functions.py:109-127). Batch API like
    the real encoder (batch_size mirrors the reference's 32)."""

    def __init__(self, dim: int = 64, seed: int = 1234):
        self.dim = dim
        self.seed = seed

    def encode(self, texts: list[str], batch_size: int = 32) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            h = hashlib.sha256(f"{self.seed}:{t}".encode()).digest()
            rs = np.random.RandomState(int.from_bytes(h[:4], "little"))
            v = rs.standard_normal(self.dim)
            out[i] = (v / np.linalg.norm(v)).astype(np.float32)
        return out


class LengthBucketEmbedder:
    """Minimal second implementation of the embedder protocol
    (`encode(list[str], batch_size) -> (n, dim) float array`) — used by
    tests to prove an arbitrary model object drops into embed_corpus
    unchanged. Must live in an importable module: sc.broadcast pickles by
    reference, and executors re-import the class."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def encode(self, texts: list[str], batch_size: int = 32) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            out[i, len(t) % self.dim] = 1.0
        return out


def embed_corpus(df: DataFrame, text_col: str, embedder=None,
                 out_col: str = "embedding",
                 batch_size: int = 32) -> DataFrame:
    """V1 — the broadcast-model embedding pass (the real-model path, not
    just a docstring promise): the embedder object is sc.broadcast once,
    each Python worker deserializes it ONCE (`bc.value` outside the batch
    loop — for a sentence-transformers model this is the weights load,
    semantic_functions.py:109-127), then encodes Arrow batches through
    mapInPandas. Any object with `.encode(list[str], batch_size) ->
    (n, dim) array` drops in — the deterministic StubEmbedder goes
    through this exact code path in tests, so swapping in a real model
    changes no engine code."""
    import numpy as np

    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    embedder = embedder if embedder is not None else StubEmbedder()
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(embedder)
    # fresh StructType — .add() would mutate the DataFrame's cached schema
    schema = StructType(list(df.schema.fields)
                        + [StructField(out_col, ArrayType(FloatType()))])

    def run(batches):
        model = bc.value  # one deserialize/weights-load per python worker
        for pdf in batches:
            out = pdf.copy()
            if len(pdf):
                vecs = np.asarray(
                    model.encode(pdf[text_col].astype(str).tolist(),
                                 batch_size=batch_size), dtype=np.float32)
                out[out_col] = list(vecs)
            else:
                out[out_col] = []
            yield out

    return df.mapInPandas(run, schema=schema)


def embed_column(df: DataFrame, text_col: str, dim: int = 64,
                 seed: int = 1234) -> DataFrame:
    """Adds `embedding array<float>` with the stub embedder, routed
    through the SAME broadcast-model pass a real model would use."""
    return embed_corpus(df, text_col, StubEmbedder(dim=dim, seed=seed))


def quantize_int8(df: DataFrame, vec_col: str = "embedding",
                  scale: float = 127.0) -> DataFrame:
    """V3 (semantic_functions.py:125-127): int8 embedding storage.
    Vectors are unit-normalized, so a fixed *scale* maps [-1,1] →
    [-127,127]; queries stay float (the reference notes int8 queries
    'don't actually seem to work', :294-297 — same posture here)."""
    return df.withColumn(
        vec_col + "_int8",
        F.transform(F.col(vec_col),
                    lambda x: F.round(x * scale).cast("tinyint")))


def dequantize_int8(df: DataFrame, col: str = "embedding_int8",
                    scale: float = 127.0) -> DataFrame:
    return df.withColumn(
        col.replace("_int8", ""),
        F.transform(F.col(col), lambda x: (x / scale).cast("float")))


def semantic_search(embedded: DataFrame, query_vec: list[float],
                    k: int = DEFAULT_K, cutoff: float = DEFAULT_CUTOFF,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    text_col: str | None = None) -> DataFrame:
    """Reference pipeline: cosine vs query → keep score > cutoff (P4) →
    [len(text) >= 100 filter when a text column exists (P5)] →
    sort desc → head k (T3); scores rounded like F8 (round 3)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = embedded.withColumn("score", cosine_expr(F.col(vec_col), q))
    scored = scored.filter(F.col("score") > cutoff)
    if text_col is not None:
        scored = scored.filter(F.length(F.col(text_col).cast("string")) >= MIN_DOC_CHARS)
    return (scored
            .withColumn("score", F.round("score", 3))
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k))
