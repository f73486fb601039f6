"""Randomized end-to-end fuzzing: nasty corpora through the FULL physical
index (build → block-max query) vs the pure-Python oracle.

Spark sessions are too slow for per-example property testing, so the
corpora are generated up front (seeded, reproducible) and replayed
against one shared session.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from data_text_search_spark.config import BM25Config
from data_text_search_spark.operators.index_build import build_index
from data_text_search_spark.operators.index_query import IndexSearcher
from tests.oracle_bm25 import oracle_search

# hand-built nasty corpora: unicode, empty docs, exact duplicates,
# punctuation storms, one-char docs, html/email fragments, long repeats
NASTY_CORPORA = [
    (
        ["", "a", "...", "a a a a a", "<p>x</p> &amp; y", "ünïcode wörds hére",
         "dup text here", "dup text here", "tab\tsep\nlines", "x " * 500],
        ["a", "dup text", "x", "ünïcode", "...", "<p>"],
    ),
    (
        ["the quick brown fox", "THE QUICK BROWN FOX", "the the the",
         "quick! quick? quick.", "fox@den.example hi", "solo"],
        ["the quick", "FOX", "quick quick", "@", "solo", "absentterm"],
    ),
    (
        ["0 1 2 3 4 5", "00 11 22", "a0b1c2", "   ", "_under _score_",
         "mixed 0a 1b 2c mixed"],
        ["0", "a0b1c2", "_score_", "9", "mixed mixed"],
    ),
    # unicode: whole words in several scripts, NBSP (\xa0) and VT (\x0b)
    # per the explicit-whitespace-class contract, numerics beyond ASCII
    (
        ["straße großes wörterbuch", "STRASSE UND STRAẞE", "café au lait",
         "привет мир тест", "日本語 のテキスト", "nbsp\xa0joined words",
         "vt\x0bsplit words", "½ cup and ² power", "¿qué? ¡sí! ñandú",
         "mixed ascii and wörter"],
        ["straße", "wörter", "привет", "日本語", "nbsp\xa0joined", "vt split",
         "½ ²", "qué", "café lait", "ß"],
    ),
]


@pytest.mark.parametrize("ci", range(len(NASTY_CORPORA)))
def test_nasty_corpus_end_to_end(spark, tmp_path, ci):
    texts, queries = NASTY_CORPORA[ci]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "content": texts}))
    root = str(tmp_path / f"nasty{ci}")
    build_index(spark, df, root, BM25Config(), id_col="doc_id",
                shards=3, groups=1)
    s = IndexSearcher(spark, root)
    s.warm()
    for q in queries:
        got = [(r["doc_id"], r["score"]) for r in s.search(q, 10).collect()]
        want = oracle_search(texts, q, n=10)
        assert [d for d, _ in got] == [d for d, _ in want], (ci, q, got, want)
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=0, abs_tol=1e-9), (ci, q)
        # the driver fast path must agree on the same nasty inputs
        loc = s.search_local(q, 10)
        assert loc["doc_id"].tolist() == [d for d, _ in want], (ci, q)
    # the batch executor (dense bincount kernel + hash-agg merge) must
    # answer the whole nasty query set identically to the oracle
    batch = s.search_batch(queries, 10).collect()
    by_q: dict[int, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, q in enumerate(queries):
        want = oracle_search(texts, q, n=10)
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [d for d, _ in want], (ci, q)
        for r, (_, ws) in zip(got, want):
            assert math.isclose(r["score"], ws, rel_tol=0, abs_tol=1e-9), (ci, q)


def test_random_generated_corpora(spark, tmp_path):
    """Seeded random corpora: token soup with skew, random lengths,
    random queries — three corpora replayed against one session."""
    import random

    base = ["def", "x", "y1", "...", "é", "_", "longtokenword", "0",
            "ab", "c0._", "a" * 6, ".", "__"]
    examples = []
    for seed in range(3):
        rnd = random.Random(seed)
        n = rnd.randint(2, 30)
        examples.append([
            " ".join(rnd.choice(base) for _ in range(rnd.randint(0, 40)))
            for _ in range(n)])
    for ci, texts in enumerate(examples):
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": range(len(texts)),
                          "content": [t or "" for t in texts]}))
        root = str(tmp_path / f"hyp{ci}")
        build_index(spark, df, root, BM25Config(), id_col="doc_id",
                    shards=2, groups=1)
        s = IndexSearcher(spark, root)
        for q in ["def x", "é", "longtokenword 0", "...", "zz_absent"]:
            got = [(r["doc_id"], r["score"]) for r in s.search(q, 5).collect()]
            want = oracle_search(texts, q, n=5)
            assert [d for d, _ in got] == [d for d, _ in want], (ci, q)
