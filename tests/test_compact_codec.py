"""Compact posting codec: (delta, tf, doc_len) varints with exact
impact recomputation at decode must be BIT-IDENTICAL in results to the
f64 codec, at a fraction of the payload."""

from __future__ import annotations

import pandas as pd
import pytest

from data_text_search_spark.config import BM25Config
from data_text_search_spark.fixtures.corpus import QUERIES
from data_text_search_spark.operators.index_build import build_index
from data_text_search_spark.operators.index_query import IndexSearcher
from data_text_search_spark.streaming.incremental import (
    add_documents,
    merge_segments,
)


@pytest.fixture(scope="module")
def both_roots(spark, corpus, tmp_path_factory):
    base = tmp_path_factory.mktemp("codec")
    roots = {}
    for codec in ("f64", "compact"):
        root = str(base / codec)
        build_index(spark, corpus, root, BM25Config(impact_codec=codec),
                    id_col="doc_id", shards=4, groups=1)
        roots[codec] = root
    return roots


def _results(searcher, q, n=10):
    return [(r["doc_id"], r["score"]) for r in searcher.search(q, n).collect()]


def test_compact_results_bit_identical(spark, both_roots):
    s_f = IndexSearcher(spark, both_roots["f64"])
    s_c = IndexSearcher(spark, both_roots["compact"])
    s_f.warm(); s_c.warm()
    for q in [qq["query_text"] for qq in QUERIES]:
        a, b = _results(s_f, q), _results(s_c, q)
        assert a == b, (q, a, b)   # exact float equality, not approx
    # batch path too
    qtexts = [qq["query_text"] for qq in QUERIES]
    fa = sorted(tuple(r) for r in s_f.search_batch(qtexts, 10).collect())
    ca = sorted(tuple(r) for r in s_c.search_batch(qtexts, 10).collect())
    assert fa == ca


def test_compact_payload_smaller(both_roots):
    from data_text_search_spark.operators.index_build import load_manifest
    bpp = {}
    for codec, root in both_roots.items():
        g = load_manifest(root)["groups_state"]["0"]
        bpp[codec] = g["bytes_per_posting"]
    assert bpp["compact"] < 0.55 * bpp["f64"], bpp


def test_compact_incremental_and_merge_identical(spark, corpus, tmp_path):
    delta = spark.createDataFrame(pd.DataFrame({
        "doc_id": [910000, 910001],
        "content": ["compactneedle quantum flux widget",
                    "return import def compactneedle"]}))
    roots = {}
    for codec in ("f64", "compact"):
        root = str(tmp_path / f"inc_{codec}")
        build_index(spark, corpus, root, BM25Config(impact_codec=codec),
                    id_col="doc_id", shards=4, groups=1)
        add_documents(spark, root, delta, id_col="doc_id")
        roots[codec] = root
    for q in ["compactneedle", "return import", "quantum flux capacitor"]:
        a = _results(IndexSearcher(spark, roots["f64"]), q)
        b = _results(IndexSearcher(spark, roots["compact"]), q)
        assert a == b, (q, a, b)
    for root in roots.values():
        merge_segments(spark, root)
    for q in ["compactneedle", "return import"]:
        a = _results(IndexSearcher(spark, roots["f64"]), q)
        b = _results(IndexSearcher(spark, roots["compact"]), q)
        assert a == b, (q, a, b)


def test_compact_negative_idf_parity(spark, tmp_path):
    """Negative-IDF corpus through the compact codec vs the oracle —
    recompute must survive the pruning math too."""
    import numpy as np
    from tests.oracle_bm25 import oracle_search
    rs = np.random.RandomState(31)
    texts = []
    for i in range(100):
        toks = ["hotterm"] * rs.randint(1, 4) if i % 4 else []
        toks += [f"w{rs.randint(12)}" for _ in range(rs.randint(2, 20))]
        texts.append(" ".join(toks))
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": range(len(texts)), "content": texts}))
    root = str(tmp_path / "negc")
    build_index(spark, df, root, BM25Config(impact_codec="compact",
                                            block_size=4),
                id_col="doc_id", shards=2, groups=1)
    s = IndexSearcher(spark, root)
    import math
    for q in ["hotterm w0", "hotterm hotterm w1 w2", "w3 w4 w5"]:
        got = _results(s, q, 5)
        want = oracle_search(texts, q, n=5)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=0, abs_tol=1e-9)
