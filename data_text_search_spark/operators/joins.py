"""Result joins — the reference's post-search join pipeline (J1/J2, F9).

- join_results_to_corpus (J1, bm25_functions.py:634): re-attach the
  original columns to the scored top-k. The top-k side is tiny →
  broadcast it so the corpus is never shuffled.
- join_user_table (J2, bm25_functions.py:656-666): left-join a
  user-supplied table onto results with the reference's exact key
  normalization (str-cast + strip trailing '.0', :660-661) and
  dedup-before-join (:664). Broadcast when small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_text_search_spark.functions.text import join_key_norm_expr


def join_results_to_corpus(results: DataFrame, corpus: DataFrame,
                           id_col: str = "doc_id") -> DataFrame:
    return F.broadcast(results).join(corpus, id_col, "left")


def join_user_table(results: DataFrame, join_df: DataFrame,
                    results_key: str, join_key: str,
                    broadcast: bool = True) -> DataFrame:
    """Reference semantics: both keys normalized (astype(str) + \\.0$ strip),
    right side deduplicated on the key, left join, right-side name
    collisions suffixed '_y' (pandas merge suffixes=('','_y'), :666)."""
    right = join_df.dropDuplicates([join_key])
    overlap = (set(results.columns) & set(right.columns)) - {join_key}
    for c in overlap:
        right = right.withColumnRenamed(c, f"{c}_y")
    lkey = join_key_norm_expr(results[results_key])
    rkey = join_key_norm_expr(right[join_key])
    if broadcast:
        right = F.broadcast(right)
    joined = results.join(right, lkey == rkey, "left")
    return joined.drop(right[join_key]) if join_key in results.columns else joined
