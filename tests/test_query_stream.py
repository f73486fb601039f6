"""Structured-Streaming query serving (streaming/query_stream.py):
streamed answers must be bit-identical to the offline batch executor,
and the per-epoch overwrite sink must be idempotent under replay."""

from __future__ import annotations

import pandas as pd
import pytest

from data_text_search_spark.config import BM25Config
from data_text_search_spark.fixtures.corpus import QUERIES, corpus_pandas
from data_text_search_spark.operators.index_build import build_index
from data_text_search_spark.operators.index_query import IndexSearcher
from data_text_search_spark.streaming.query_stream import (
    answer_batch,
    start_query_stream,
)


@pytest.fixture(scope="module")
def qs_searcher(spark, tmp_path_factory):
    pdf = corpus_pandas(250).reset_index().rename(columns={"index": "doc_id"})
    root = str(tmp_path_factory.mktemp("qsidx") / "idx")
    build_index(spark, spark.createDataFrame(pdf), root, BM25Config(),
                id_col="doc_id", shards=4, groups=1)
    return IndexSearcher(spark, root)


def _qpdf():
    return pd.DataFrame({
        "query_id": [100 + q["query_id"] for q in QUERIES[:6]],
        "query_text": [q["query_text"] for q in QUERIES[:6]],
    })


def test_answer_batch_matches_offline(spark, qs_searcher):
    qpdf = _qpdf()
    got = answer_batch(qs_searcher, spark.createDataFrame(qpdf), n=5)
    assert list(got.columns) == ["query_id", "query_text", "doc_id",
                                 "score", "rank", "score_abs"]
    off = qs_searcher.search_batch_pandas(list(qpdf["query_text"]), 5)
    # positional ids map back to the caller's ids; rows otherwise equal
    remap = dict(enumerate(qpdf["query_id"]))
    off = off.assign(query_id=off["query_id"].map(remap))
    pd.testing.assert_frame_equal(
        got.drop(columns=["query_text"]).sort_values(
            ["query_id", "rank"]).reset_index(drop=True),
        off.sort_values(["query_id", "rank"]).reset_index(drop=True),
        check_dtype=False)
    # the streamed frame carries the original text for every row
    want_text = dict(zip(qpdf["query_id"], qpdf["query_text"]))
    assert all(want_text[r.query_id] == r.query_text
               for r in got.itertuples())


def test_answer_batch_empty(spark, qs_searcher):
    empty = spark.createDataFrame([], "query_id long, query_text string")
    assert len(answer_batch(qs_searcher, empty, n=5)) == 0


def test_query_stream_file_source_end_to_end(spark, qs_searcher, tmp_path):
    """File-source queries → availableNow stream → parquet epochs; the
    union of epochs equals the offline batch answer set."""
    qdir, sink, ckpt = (str(tmp_path / d) for d in ("q", "out", "ck"))
    qpdf = _qpdf()
    # two files so the source has >1 splittable unit of work
    spark.createDataFrame(qpdf.iloc[:3]).write.parquet(qdir)
    spark.createDataFrame(qpdf.iloc[3:]).write.mode("append").parquet(qdir)
    stream = (spark.readStream.schema("query_id long, query_text string")
              .parquet(qdir))
    q = start_query_stream(qs_searcher, stream, sink, ckpt, n=5,
                           trigger_available_now=True)
    q.awaitTermination(120)
    got = spark.read.parquet(sink).toPandas()
    off = qs_searcher.search_batch_pandas(list(qpdf["query_text"]), 5)
    remap = dict(enumerate(qpdf["query_id"]))
    off = off.assign(query_id=off["query_id"].map(remap))
    pd.testing.assert_frame_equal(
        got.drop(columns=["query_text", "epoch"], errors="ignore")
           .sort_values(["query_id", "rank"]).reset_index(drop=True)
           [["query_id", "doc_id", "score", "rank", "score_abs"]],
        off.sort_values(["query_id", "rank"]).reset_index(drop=True)
           [["query_id", "doc_id", "score", "rank", "score_abs"]],
        check_dtype=False)


def test_epoch_sink_replay_idempotent(spark, qs_searcher, tmp_path):
    """Replaying an epoch (foreachBatch crash-recovery contract)
    overwrites rather than duplicates."""
    from data_text_search_spark.streaming import query_stream as qs

    sink = str(tmp_path / "sink")
    batch = spark.createDataFrame(_qpdf().iloc[:2])

    def run_epoch(eid):
        pdf = qs.answer_batch(qs_searcher, batch, n=3)
        (spark.createDataFrame(pdf).write.mode("overwrite")
         .parquet(f"{sink}/epoch={eid}"))

    run_epoch(0)
    n1 = spark.read.parquet(sink).count()
    run_epoch(0)  # replay same epoch
    assert spark.read.parquet(sink).count() == n1
    run_epoch(1)  # a NEW epoch appends
    assert spark.read.parquet(sink).count() == 2 * n1


def test_stream_snapshot_while_index_grows(spark, tmp_path):
    """A serving searcher pins its manifest at construction: documents
    added (and merged) AFTER the searcher was opened don't appear in
    streamed answers until the serving layer reopens the index — the
    snapshot-per-searcher contract that makes concurrent maintenance
    safe."""
    import pandas as pd

    from data_text_search_spark.streaming.incremental import add_documents
    from data_text_search_spark.streaming.query_stream import answer_batch

    pdf = corpus_pandas(150).reset_index().rename(columns={"index": "doc_id"})
    root = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(pdf), root, BM25Config(),
                id_col="doc_id", shards=4, groups=1)
    serving = IndexSearcher(spark, root)

    batch = spark.createDataFrame(pd.DataFrame(
        {"query_id": [1], "query_text": ["zyzzyva quokka"]}))
    before = answer_batch(serving, batch, n=5)

    # a maximally-relevant doc arrives AFTER the serving searcher opened
    add_documents(spark, root, spark.createDataFrame(pd.DataFrame(
        {"doc_id": [10_000],
         "text": ["zyzzyva quokka zyzzyva quokka zyzzyva"]})),
        text_col="text", id_col="doc_id")
    during = answer_batch(serving, batch, n=5)
    pd.testing.assert_frame_equal(before, during)  # snapshot holds
    assert 10_000 not in set(during["doc_id"])

    reopened = IndexSearcher(spark, root)
    after = answer_batch(reopened, batch, n=5)
    assert 10_000 in set(after["doc_id"])  # visible on reopen


def test_percolate_stream_end_to_end(spark, tmp_path):
    """Streaming percolation: a file stream of documents against
    registered queries; union of epochs equals the batch percolation."""
    from data_text_search_spark.operators.search_analytics import percolate
    from data_text_search_spark.streaming.query_stream import (
        start_percolate_stream,
    )

    pdf = corpus_pandas(120).reset_index().rename(columns={"index": "doc_id"})
    ddir, sink, ckpt = (str(tmp_path / d) for d in ("docs", "hits", "ck"))
    docs = spark.createDataFrame(pdf[["doc_id", "content"]])
    docs.filter("doc_id < 60").write.parquet(ddir)
    docs.filter("doc_id >= 60").write.mode("append").parquet(ddir)

    queries = ["hash join", "zyzzyva", "quantum flux capacitor"]
    stream = (spark.readStream.schema("doc_id long, content string")
              .parquet(ddir))
    q = start_percolate_stream(spark, stream, queries, sink, ckpt,
                               text_col="content",
                               trigger_available_now=True)
    q.awaitTermination(120)
    got = {(r["doc_id"], r["query_id"])
           for r in spark.read.parquet(sink).collect()}
    want = {(r["doc_id"], r["query_id"])
            for r in percolate(spark, docs, queries,
                               text_col="content").collect()}
    assert got == want and got
