"""Hybrid retrieval: reciprocal-rank fusion of the engine's search
modes (keyword BM25 + semantic cosine — the reference exposes them as
separate tabs, app.py:117-210; production stacks fuse them, and RRF is
the standard scale-free way: Cormack/Clarke/Buettcher, SIGIR'09).

RRF consumes only RANKS, so it is immune to the score-scale mismatch
between BM25 (unbounded, corpus-dependent) and cosine ([-1, 1]):
``rrf(doc) = Σ_lists 1 / (k0 + rank_list(doc))`` over the lists that
retrieved the doc.

Scale shape: fusion operates on per-query SHORTLISTS (each list is a
top-N from a distributed candidate stage — the block-max index scan,
the ANN probe), so the fused relation is Q·N·lists rows, never corpus
-sized. Ungrouped fusion sorts globally (one tiny shortlist); batch
fusion partitions the rank window by query id, so per-query work stays
independent and the shuffle carries only shortlist rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_RRF_K0 = 60  # the SIGIR'09 constant; softens top-rank dominance


def with_rank(df: DataFrame, order_cols: list, rank_col: str = "rank",
              partition_cols: list[str] | None = None) -> DataFrame:
    """Attach a deterministic 1-based rank. Give `order_cols` a total
    order (break score ties on the id) or ranks are nondeterministic.
    Without partition_cols the window is global — only use on a
    shortlist, not a corpus-sized relation."""
    w = Window.orderBy(*order_cols)
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w))


def rrf_fuse(rankings: list[DataFrame], id_col: str = "doc_id",
             k0: int = DEFAULT_RRF_K0, k: int = 10,
             partition_cols: list[str] | None = None) -> DataFrame:
    """Fuse ranked shortlists: each input needs (id_col, rank [, the
    partition cols for batch mode]). Returns (id_col, rrf_score,
    n_lists) — top k by (rrf_score desc, id asc), rrf_score rounded to
    6 so the value is engine-portable (each doc sums ≤ len(rankings)
    reciprocal terms; two-term float addition is order-independent)."""
    keys = list(partition_cols or [])
    contribs = [df.select(*keys, F.col(id_col).cast("long").alias(id_col),
                          (F.lit(1.0) / (F.lit(float(k0)) + F.col("rank")))
                          .alias("_c"))
                for df in rankings]
    u = reduce(lambda a, b: a.unionByName(b), contribs)
    agg = (u.groupBy(*keys, id_col)
           .agg(F.round(F.sum("_c"), 6).alias("rrf_score"),
                F.count("*").cast("int").alias("n_lists")))
    if keys:
        w = Window.partitionBy(*keys).orderBy(F.desc("rrf_score"),
                                              F.asc(id_col))
        return (agg.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= k).drop("_rn")
                .orderBy(*keys, F.desc("rrf_score"), F.asc(id_col)))
    return (agg.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k))
