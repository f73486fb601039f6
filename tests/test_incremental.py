"""Incremental segments + Structured Streaming ingest."""

from __future__ import annotations

import pandas as pd
import pytest

from data_text_search_spark.config import BM25Config
from data_text_search_spark.fixtures.corpus import corpus_pandas
from data_text_search_spark.operators.index_build import build_index, load_manifest
from data_text_search_spark.operators.index_query import IndexSearcher
from data_text_search_spark.streaming.incremental import add_documents, stream_ingest


def _base(spark, tmp_path, n=200):
    pdf = corpus_pandas(n).reset_index().rename(columns={"index": "doc_id"})
    df = spark.createDataFrame(pdf)
    root = str(tmp_path / "idx")
    build_index(spark, df, root, BM25Config(), id_col="doc_id",
                shards=4, groups=1)
    return root


def test_add_documents_makes_delta_queryable(spark, tmp_path):
    root = _base(spark, tmp_path)
    delta = spark.createDataFrame(pd.DataFrame({
        "doc_id": [100000, 100001],
        "content": ["flibbertigibbet widget factory " * 3,
                    "return import def class"]}))
    m = add_documents(spark, root, delta, id_col="doc_id")
    assert m["n_docs"] == 202
    assert m["segments"][0]["n_docs"] == 2
    assert m["segments"][0]["new_terms"] >= 1      # flibbertigibbet
    s = IndexSearcher(spark, root)
    # brand-new term, only in the delta segment
    res = s.search("flibbertigibbet", 5).collect()
    assert [r["doc_id"] for r in res] == [100000]
    # old docs still found alongside delta docs for shared terms
    res2 = s.search("return import", 5).collect()
    assert len(res2) == 5


def test_drift_flags_rebuild(spark, tmp_path):
    root = _base(spark, tmp_path, n=100)
    delta = spark.createDataFrame(pd.DataFrame({
        "doc_id": list(range(200000, 200040)),
        "content": ["some fresh content here"] * 40}))
    m = add_documents(spark, root, delta, id_col="doc_id",
                      rebuild_threshold=0.2)
    assert m["needs_rebuild"] is True
    assert m["drift"] > 0.2


def test_stream_ingest_foreachbatch(spark, tmp_path):
    root = _base(spark, tmp_path)
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(pd.DataFrame({
        "doc_id": [300000], "content": ["streamedneedle appears here"]}),
    ).write.mode("overwrite").parquet(src)
    q = stream_ingest(spark, root, src, "doc_id long, content string", ckpt,
                      id_col="doc_id")
    q.awaitTermination(120)
    s = IndexSearcher(spark, root)
    assert [r["doc_id"] for r in s.search("streamedneedle", 3).collect()] == [300000]
    m = load_manifest(root)
    assert m["segments"] and m["n_docs"] == 201
