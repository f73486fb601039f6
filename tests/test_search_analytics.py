"""Facet counts + significant terms over the logical index: semantics
pinned against independently computed pure-Python truths on the fixture
corpus (the DuckDB hash gate runs separately in test_entry_contract)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from data_text_search_spark.config import BM25Config
from data_text_search_spark.functions.text import tokenize_py
from data_text_search_spark.operators import bm25_exhaustive as bx
from data_text_search_spark.operators.search_analytics import (
    search_facets,
    significant_terms,
)

QUERY = "hash join table scan"


@pytest.fixture(scope="module")
def lidx(spark, corpus):
    prep = bx.ingest(corpus, id_col="doc_id").persist()
    return bx.build_logical(prep, BM25Config(alpha=-5.0), persist=True)


def _py_match_set(corpus_pdf, query, alpha=-5.0):
    """Docs containing >= 1 live query term, plus per-doc BM25 score."""
    texts = corpus_pdf["content"].tolist()
    toks = [tokenize_py(str(t).lower()) for t in texts]
    n = len(toks)
    df = Counter()
    for t in toks:
        df.update(set(t))
    idf = {w: math.log(n - d + 0.5) - math.log(d + 0.5)
           for w, d in df.items()}
    live = {w for w, v in idf.items() if v > alpha}
    avgdl = sum(len(t) for t in toks) / n
    q = Counter(tokenize_py(query.lower()))
    scores = {}
    for i, t in enumerate(toks):
        tf = Counter(t)
        s = 0.0
        hit = False
        for w, qc in sorted(q.items()):
            if w in tf and w in live:
                hit = True
                d = tf[w] + 1.5 * (1 - 0.75 + 0.75 * len(t) / avgdl)
                s += idf[w] * tf[w] * 2.5 / d * qc
        if hit:
            scores[i] = s
    return scores, toks, live, df, n


def test_search_facets_counts_and_scores(spark, corpus, corpus_pdf, lidx):
    got = {r["facet"]: (r["n_docs"], r["top_score"])
           for r in search_facets(lidx, spark, QUERY, corpus, "lang").collect()}
    scores, *_ = _py_match_set(corpus_pdf, QUERY)
    langs = corpus_pdf["lang"].tolist()
    want = defaultdict(list)
    for i, s in scores.items():
        want[langs[i]].append(s)
    assert set(got) == set(want)
    for lang, ss in want.items():
        assert got[lang][0] == len(ss)
        assert math.isclose(got[lang][1], round(max(ss), 4), abs_tol=1e-4)
    # every matching doc is counted exactly once across facets
    assert sum(nd for nd, _ in got.values()) == len(scores)


def test_facet_ranges_buckets(spark, corpus, corpus_pdf, lidx):
    """ES range aggregation: bucket assignment replayed in python,
    empty buckets kept with count 0 / null score, every matching doc
    in exactly one bucket, bad boundaries rejected."""
    from data_text_search_spark.operators.search_analytics import (
        facet_ranges,
    )
    bounds = [120.0, 240.0, 1_000_000.0]  # last bucket forced empty
    meta = corpus.select("doc_id", F.length("content").alias("clen"))
    rows = facet_ranges(lidx, spark, QUERY, meta, "clen",
                        bounds).collect()
    assert [r["bucket_idx"] for r in rows] == [0, 1, 2, 3]
    assert [r["bucket"] for r in rows] == \
        ["*-120", "120-240", "240-1e+06", "1e+06-*"]
    scores, *_ = _py_match_set(corpus_pdf, QUERY)
    lens = [len(str(t)) for t in corpus_pdf["content"]]
    want = defaultdict(list)
    for i, s in scores.items():
        idx = sum(lens[i] >= b for b in bounds)
        want[idx].append(s)
    for r in rows:
        ss = want.get(r["bucket_idx"], [])
        assert r["n_docs"] == len(ss)
        if ss:
            assert math.isclose(r["top_score"], round(max(ss), 4),
                                abs_tol=1e-4)
        else:
            assert r["top_score"] is None
    assert sum(r["n_docs"] for r in rows) == len(scores)
    with pytest.raises(ValueError):
        facet_ranges(lidx, spark, QUERY, meta, "clen", [2.0, 1.0])


def test_search_collapse_semantics(spark, corpus, corpus_pdf, lidx):
    """Field collapsing: exactly one (the best) hit per collapse-key
    value, representatives ranked on the rounded deterministic order,
    replayed in python."""
    from data_text_search_spark.operators.search_analytics import (
        search_collapse,
    )
    rows = search_collapse(lidx, spark, QUERY, corpus, "lang",
                           10).collect()
    scores, *_ = _py_match_set(corpus_pdf, QUERY)
    langs = corpus_pdf["lang"].tolist()
    best = {}
    for d, s in scores.items():
        key = (round(s, 4), -d)
        if langs[d] not in best or key > best[langs[d]][0]:
            best[langs[d]] = (key, d, round(s, 4))
    want = sorted(((v[1], k, v[2]) for k, v in best.items()),
                  key=lambda t: (-t[2], t[0]))[:10]
    got = [(r["doc_id"], r["lang"], r["score"]) for r in rows]
    assert [(d, l) for d, l, _ in got] == [(d, l) for d, l, _ in want]
    assert all(math.isclose(g, w, abs_tol=1e-4)
               for (_, _, g), (_, _, w) in zip(got, want))
    # one hit per key, ranks contiguous from 1
    assert len({l for _, l, _ in got}) == len(got)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))


def test_significant_terms_lift(spark, corpus_pdf, lidx):
    rows = significant_terms(lidx, spark, QUERY, n=15, min_fg_df=2).collect()
    assert 0 < len(rows) <= 15
    scores, toks, live, df, n = _py_match_set(corpus_pdf, QUERY)
    fg = set(scores)
    fg_df = Counter()  # a term counts once per matching doc
    for i in fg:
        fg_df.update(set(toks[i]))
    qterms = set(tokenize_py(QUERY.lower()))
    lifts = {}
    for t, fd in fg_df.items():
        if t in qterms or t not in live or fd < 2:
            continue
        lifts[t] = (fd / len(fg)) / (df[t] / n)
    want = sorted(lifts.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = [(r["term"], r["lift"]) for r in rows]
    assert [t for t, _ in got] == [t for t, _ in want]
    for (_, gl), (_, wl) in zip(got, want):
        assert math.isclose(gl, round(wl, 4), abs_tol=1e-4)
    # query terms never appear, fg_df/bg_df sane
    for r in rows:
        assert r["term"] not in qterms
        assert 2 <= r["fg_df"] <= r["bg_df"]


def test_significant_terms_empty_match(spark, lidx):
    out = significant_terms(lidx, spark, "notinthecorpusatall zz", n=5)
    assert out.count() == 0


def test_search_facets_no_driver_collect_plan(spark, corpus, lidx):
    """The facet plan must aggregate distributed: a broadcast of the tiny
    query-term side, hash join to meta, hash aggregate — no Python UDFs,
    no window over the whole corpus."""
    plan = search_facets(lidx, spark, QUERY, corpus,
                         "lang")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "FlatMapGroupsInPandas" not in plan


def test_fielded_search_single_field_is_plain_bm25(spark, corpus, corpus_pdf):
    from data_text_search_spark.operators.search_analytics import (
        fielded_search,
    )
    from tests.oracle_bm25 import oracle_search

    got = fielded_search(spark, corpus, QUERY, {"content": 1.0},
                         config=BM25Config(alpha=-5.0), n=10).collect()
    want = oracle_search(corpus_pdf["content"].tolist(), QUERY, n=10,
                         alpha=-5.0)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert math.isclose(r["score"], round(s, 4), abs_tol=1e-4)


def test_fielded_search_weight_linearity_and_fusion(spark, corpus,
                                                    corpus_pdf):
    from tests.oracle_bm25 import oracle_search
    from data_text_search_spark.operators.search_analytics import (
        fielded_search,
    )

    one = fielded_search(spark, corpus, QUERY, {"content": 1.0},
                         config=BM25Config(alpha=-5.0), n=10).collect()
    two = fielded_search(spark, corpus, QUERY, {"content": 2.0},
                         config=BM25Config(alpha=-5.0), n=10).collect()
    assert [r["doc_id"] for r in one] == [r["doc_id"] for r in two]
    for a, b in zip(one, two):
        assert math.isclose(b["score"], round(2 * a["score"], 4),
                            abs_tol=2e-4)

    # two fields fuse by weighted sum: replay per-field python oracles
    # ('py' lives only in the path field, with useful idf — NOT 'src',
    # which is in EVERY path and therefore alpha-pruned)
    fused = fielded_search(spark, corpus, "py hash join",
                           {"content": 1.0, "path": 0.5},
                           config=BM25Config(alpha=-5.0), n=10).collect()
    per_field = {}
    for col, w in (("content", 1.0), ("path", 0.5)):
        full = oracle_search(corpus_pdf[col].tolist(), "py hash join",
                             n=10**9, alpha=-5.0)
        for d, s in full:
            per_field[d] = per_field.get(d, 0.0) + w * s
    want = sorted(per_field.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [r["doc_id"] for r in fused] == [d for d, _ in want]
    for r, (_, s) in zip(fused, want):
        assert math.isclose(r["score"], round(s, 4), abs_tol=1e-4)
    # a path-only query answers from the path corpus alone
    path_only = fielded_search(spark, corpus, "py", {"path": 1.0},
                               config=BM25Config(alpha=-5.0), n=5).collect()
    assert path_only and all(
        corpus_pdf["path"][r["doc_id"]].endswith(".py") for r in path_only)


def test_match_count(spark, corpus_pdf, lidx):
    from data_text_search_spark.operators.search_analytics import (
        match_count,
    )
    got = match_count(lidx, spark, QUERY).collect()[0]["n_matching"]
    scores, *_ = _py_match_set(corpus_pdf, QUERY)
    assert got == len(scores)
    assert match_count(lidx, spark, "notinthecorpusatall").collect()[0][
        "n_matching"] == 0


def test_percolate_term_and_semantics(spark, corpus, corpus_pdf):
    from data_text_search_spark.operators.search_analytics import percolate

    queries = ["hash join", "zyzzyva", "quantum flux capacitor",
               "absent-zz term"]
    got = {(r["doc_id"], r["query_id"]) for r in
           percolate(spark, corpus, queries, text_col="content").collect()}
    toksets = [set(tokenize_py(str(t).lower()))
               for t in corpus_pdf["content"]]
    want = set()
    for qid, q in enumerate(queries):
        terms = set(tokenize_py(q))
        if not terms:
            continue
        for i, ts in enumerate(toksets):
            if terms <= ts:
                want.add((i, qid))
    assert got == want
    assert all(qid != 3 for _, qid in got)  # absent term matches nothing
    # empty query list and empty-token queries -> typed empty
    assert percolate(spark, corpus, [], text_col="content").count() == 0
    assert percolate(spark, corpus, ["   "],
                     text_col="content").count() == 0


def test_percolate_plan_is_map_only(spark, corpus):
    """Round-6 shape: queries compile to literal membership conditions —
    no join, no token explosion, no aggregate; the only exchange is the
    presentation sort's range partitioning."""
    from data_text_search_spark.operators.search_analytics import percolate

    plan = percolate(spark, corpus, ["hash join"], text_col="content"
                     )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") <= 1  # the orderBy only


def test_top_hits_per_bucket(spark, corpus, corpus_pdf, lidx):
    """Every bucket keeps its best <=3 docs on the rounded order, and the
    members agree with the python match-set truth."""
    from data_text_search_spark.operators.search_analytics import top_hits
    meta = corpus.select("doc_id", "repo")
    res = top_hits(lidx, spark, QUERY, meta, "repo", per_bucket=3).collect()
    scores, *_ = _py_match_set(corpus_pdf, QUERY)
    repo_of = dict(zip(range(len(corpus_pdf)), corpus_pdf["repo"]))
    want = defaultdict(list)
    for d, s in scores.items():
        want[repo_of[d]].append((round(s, 4), d))
    expect = []
    for b in sorted(want):
        ordered = sorted(want[b], key=lambda x: (-x[0], x[1]))[:3]
        for rk, (s, d) in enumerate(ordered, start=1):
            expect.append((b, d, s, rk))
    got = [(r["repo"], r["doc_id"], r["score"], r["bucket_rank"])
           for r in res]
    assert sorted(got) == sorted(
        (b, d, s, rk) for (b, d, s, rk) in expect)


def test_histogram_moving_avg_trailing_window(spark):
    import pandas as pd
    from data_text_search_spark.operators.search_analytics import (
        histogram_moving_avg,
    )
    pdf = pd.DataFrame({
        "ts": pd.to_datetime(["2024-01-01", "2024-01-01", "2024-01-02",
                              "2024-01-03", "2024-01-05"]),
        "event_type": ["a"] * 5,
        "value": [1.0] * 5})
    got = [(r["bucket"][:10], r["n"], r["moving_avg"])
           for r in histogram_moving_avg(
               spark.createDataFrame(pdf), "ts", "day", "event_type",
               window=3).collect()]
    # counts: 2,1,1,1 — trailing-3 averages 2, 1.5, 4/3, 1 (bucket gaps
    # are row-based like ES moving_avg over the emitted buckets)
    assert got == [("2024-01-01", 2, 2.0), ("2024-01-02", 1, 1.5),
                   ("2024-01-03", 1, round(4 / 3, 4)),
                   ("2024-01-05", 1, 1.0)]
