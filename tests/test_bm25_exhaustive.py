"""End-to-end rank-identity of the DataFrame BM25 vs the pure-Python oracle
on the deterministic fixture corpus, over the full bundled query set."""

from __future__ import annotations

import math

import pytest

from data_text_search_spark.config import BM25Config
from data_text_search_spark.fixtures.corpus import QUERIES
from data_text_search_spark.operators.bm25_exhaustive import (
    build_logical,
    ingest,
    search,
)
from tests.oracle_bm25 import oracle_search


@pytest.fixture(scope="module")
def logical_index(spark, corpus):
    prep = ingest(corpus, id_col="doc_id").cache()
    idx = build_logical(prep)
    idx.term_doc = idx.term_doc.cache()
    idx.term_stats = idx.term_stats.cache()
    return idx


def _assert_parity(engine_rows, oracle_topn):
    got = [(r["doc_id"], r["score"]) for r in engine_rows]
    assert [d for d, _ in got] == [d for d, _ in oracle_topn], (
        f"rank mismatch: engine={got} oracle={oracle_topn}")
    for (gd, gs), (od, os_) in zip(got, oracle_topn):
        assert math.isclose(gs, os_, rel_tol=0, abs_tol=1e-9), (gd, gs, os_)


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: f"q{q['query_id']}")
def test_query_parity(spark, corpus_pdf, logical_index, q):
    res = search(logical_index, spark, q["query_text"], 10).collect()
    want = oracle_search(corpus_pdf["content"].tolist(), q["query_text"], n=10)
    _assert_parity(res, want)
    # F7 formatting parity
    for r, (_, s) in zip(res, want):
        assert r["score_abs"] == abs(round(s, 2))


def test_absent_term_returns_empty(spark, logical_index):
    assert search(logical_index, spark, "notinthecorpusatall", 10).count() == 0


def test_alpha_cutoff_prunes_hot_terms(spark, corpus, corpus_pdf):
    # alpha=-5 is the app's live setting (app.py:171); hot terms with
    # idf <= alpha vanish from the index entirely (bm25_functions.py:92-102)
    cfg = BM25Config(alpha=1.0)
    prep = ingest(corpus, id_col="doc_id")
    idx = build_logical(prep, cfg)
    # 'return' is a hot Zipf-head term → idf below 1.0 on this corpus → pruned
    assert idx.term_stats.filter("term = 'return'").count() == 0
    res = search(idx, spark, "return zyzzyva", 10).collect()
    want = oracle_search(corpus_pdf["content"].tolist(), "return zyzzyva",
                         n=10, alpha=1.0)
    _assert_parity(res, want)


def test_clean_pipeline_parity(spark, corpus, corpus_pdf):
    prep = ingest(corpus, id_col="doc_id", clean=True)
    idx = build_logical(prep)
    res = search(idx, spark, "hello", 10).collect()
    want = oracle_search(corpus_pdf["content"].tolist(), "hello", n=10, clean=True)
    _assert_parity(res, want)
    # doc 3 carries HTML/email triggers; clean strips 'hello' via the
    # email_start greedy prefix — ensure it does NOT match post-clean
    assert 3 not in [r["doc_id"] for r in res]


def test_duplicate_query_tokens_double_count(spark, corpus_pdf, logical_index):
    # reference walks each query-token occurrence (bm25_functions.py:166-172)
    one = {r["doc_id"]: r["score"]
           for r in search(logical_index, spark, "select", 50).collect()}
    three = {r["doc_id"]: r["score"]
             for r in search(logical_index, spark, "select select select", 50).collect()}
    for d in set(one) & set(three):
        assert math.isclose(three[d], one[d] * 3, rel_tol=1e-12)


def test_ingest_sha256_invariant(spark, corpus, corpus_pdf):
    from data_text_search_spark.functions.text import sha256_py
    prep = ingest(corpus, id_col="doc_id", clean=True)
    rows = prep.select("doc_id", "content", "content_sha256").collect()
    for r in rows:
        # content column is untouched by clean/tokenize (derived cols only)
        assert r["content_sha256"] == sha256_py(r["content"])
    assert sorted(r["content"] for r in rows) == sorted(corpus_pdf["content"])


def test_empty_and_punct_docs_indexable(spark, logical_index):
    # doc 0 is empty, doc 2 punct-only — build must not fail and doc_len=0/6
    dl = {r["doc_id"]: r["doc_len"] for r in
          logical_index.term_doc.select("doc_id", "doc_len").distinct().collect()}
    assert 0 not in dl  # empty doc contributes no postings
    assert dl.get(2) == len(". . . ! ! ! ? ? ?".split())
