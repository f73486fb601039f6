"""Structured-Streaming query serving: answer a STREAM of queries
against a built physical index.

The ingest side of streaming already exists (incremental.py: documents
arrive → delta segments → tiered merges). This is the other half: a
readStream of (query_id, query_text) rows is answered micro-batch by
micro-batch through IndexSearcher.search_batch — the same batch executor
the offline path uses, so streamed answers are bit-identical to offline
ones (pytest-pinned) — and appended to a parquet sink.

Delivery semantics: foreachBatch may REPLAY a micro-batch after a crash,
so each epoch writes to its own `epoch=<id>` subdirectory with
mode=overwrite — a replayed epoch overwrites itself instead of
duplicating rows (idempotent sink; the standard non-transactional
foreachBatch recipe). Readers take `spark.read.parquet(sink)` and get
exactly-once rows.

Scale shape: the micro-batch of queries (small — thousands of strings,
never corpus-scale) is collected driver-side once per trigger and fanned
out through search_batch's dedup + term-affinity grid over the
doc-sharded index; the index side never reshuffles. Queries are answered
with snapshot semantics per micro-batch (the searcher's manifest pin —
concurrent index merges don't tear a batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESULT_COLS = ["query_id", "query_text", "doc_id", "score", "rank",
               "score_abs"]


def answer_batch(searcher, batch_df: DataFrame, n: int = 10,
                 id_col: str = "query_id",
                 text_col: str = "query_text") -> "object":
    """Answer one (already materialized) micro-batch of queries: returns
    a pandas DataFrame with RESULT_COLS, joining the caller's query ids
    back onto search_batch's positional ids. Exposed separately so tests
    and non-streaming callers can drive the exact foreachBatch body."""
    import pandas as pd

    rows = (batch_df.select(F.col(id_col).alias("qid"),
                            F.col(text_col).alias("qtext"))
            .toPandas())
    if rows.empty:
        return pd.DataFrame(columns=RESULT_COLS)
    res = searcher.search_batch_pandas(list(rows["qtext"]), n)
    if isinstance(res, DataFrame):  # distributed-merge fallback path
        res = res.toPandas()
    pos = rows.reset_index(drop=True).reset_index(names="_pos")
    out = res.merge(pos, left_on="query_id", right_on="_pos", how="left")
    out["query_id"] = out["qid"]
    out = out.rename(columns={"qtext": "query_text"})
    return out[RESULT_COLS]


def start_percolate_stream(spark, docs_stream: DataFrame,
                           queries: list[str], sink: str, checkpoint: str,
                           text_col: str = "text", id_col: str = "doc_id",
                           trigger_available_now: bool = False,
                           processing_time: str | None = None):
    """The percolator run as its natural streaming self: DOCUMENTS
    stream in, the registered queries are the stored side, and each
    micro-batch appends its (doc_id, query_id) alert pairs to the
    epoch-partitioned sink (same idempotent overwrite-per-epoch recipe
    as start_query_stream). Unlike query serving there is no driver
    collect at all — percolate is a pure DataFrame plan, so the batch
    flows source→join→sink entirely distributed."""
    from data_text_search_spark.operators.search_analytics import percolate

    def _for_each(batch_df: DataFrame, epoch_id: int) -> None:
        out = percolate(spark, batch_df, queries, text_col=text_col,
                        id_col=id_col)
        out.write.mode("overwrite").parquet(f"{sink}/epoch={epoch_id}")

    writer = (docs_stream.writeStream
              .foreachBatch(_for_each)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def start_query_stream(searcher, queries_stream: DataFrame, sink: str,
                       checkpoint: str, n: int = 10,
                       id_col: str = "query_id",
                       text_col: str = "query_text",
                       trigger_available_now: bool = False,
                       processing_time: str | None = None):
    """Start the serving stream: queries_stream must be a streaming
    DataFrame with (id_col, text_col). Returns the StreamingQuery.

    Sink layout: `{sink}/epoch=<batch_id>/part-*.parquet`, one overwrite
    per epoch (idempotent under foreachBatch replay)."""
    spark = searcher.spark

    def _for_each(batch_df: DataFrame, epoch_id: int) -> None:
        pdf = answer_batch(searcher, batch_df, n, id_col, text_col)
        if len(pdf) == 0:
            return
        (spark.createDataFrame(pdf)
         .write.mode("overwrite")
         .parquet(f"{sink}/epoch={epoch_id}"))

    writer = (queries_stream.writeStream
              .foreachBatch(_for_each)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
