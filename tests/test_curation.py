"""Curation operators: token-window chunking + PII scrub.

Cross-engine value parity runs in test_entry_contract (chunk_docs /
scrub_text rows vs the DuckDB oracle on sf0.01); these tests pin the
operator SEMANTICS on planted edge cases.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from data_text_search_spark.functions.text import tokenize_py
from data_text_search_spark.operators.curation import (
    SCRUB_STEPS,
    chunk_documents,
    scrub_text,
)

CHUNK, OVER = 16, 4
STRIDE = CHUNK - OVER


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


@pytest.fixture(scope="module")
def chunked(spark):
    texts = [
        "",                                     # empty -> 1 empty chunk
        "one",                                  # < chunk_size
        " ".join(f"t{i}" for i in range(CHUNK)),        # == chunk_size
        " ".join(f"t{i}" for i in range(CHUNK + 1)),    # barely over
        " ".join(f"t{i}" for i in range(137)),          # long, ragged tail
        "a-b c.d!",                             # punctuation tokens
    ]
    df = chunk_documents(_mkdocs(spark, texts), chunk_size=CHUNK,
                         overlap=OVER)
    rows = df.orderBy("doc_id", "chunk_id").collect()
    return texts, rows


def test_chunk_counts_and_windows(chunked):
    texts, rows = chunked
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in enumerate(texts):
        toks = tokenize_py(text)
        n = len(toks)
        want_chunks = (1 if n <= CHUNK
                       else -(-(n - CHUNK) // STRIDE) + 1)
        got = by_doc[doc_id]
        assert len(got) == want_chunks, (doc_id, n)
        for r in got:
            start = r.chunk_id * STRIDE
            want = toks[start:start + CHUNK]
            assert r.chunk_text == " ".join(want), (doc_id, r.chunk_id)
            assert r.n_chunk_tokens == len(want)


def test_chunk_full_coverage_and_overlap(chunked):
    """Every token position is covered; consecutive chunks share exactly
    `overlap` tokens except the final ragged one."""
    texts, rows = chunked
    for doc_id, text in enumerate(texts):
        toks = tokenize_py(text)
        covered = set()
        for r in rows:
            if r.doc_id == doc_id:
                start = r.chunk_id * STRIDE
                covered.update(range(start, min(start + CHUNK, len(toks))))
        assert covered == set(range(len(toks))), doc_id


def test_chunk_rejects_bad_overlap(spark):
    df = _mkdocs(spark, ["x"])
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=8, overlap=-1)


def test_chunk_plan_has_no_shuffle(spark):
    df = chunk_documents(_mkdocs(spark, ["a b c"]), chunk_size=4, overlap=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


PLANTED = [
    "contact bob.smith+x@ex-ample.co.uk today",
    "fetch https://api.example.com/v1?user=bob@leak.io&ip=1.2.3.4 now",
    "server at 10.0.0.1 and 192.168.300.7",   # 300 still matches 1-3 digits
    "order 123456789012 ref 12345678",        # only the 9+ digit run scrubbed
    "plain text, nothing to scrub",
    "",
]


def test_scrub_planted(spark):
    rows = (scrub_text(_mkdocs(spark, PLANTED))
            .orderBy("doc_id").collect())
    assert rows[0].scrubbed == "contact <EMAIL> today"
    assert (rows[0].n_url, rows[0].n_email) == (0, 1)
    # the email and IP live INSIDE the url -> consumed by <URL> alone
    assert rows[1].scrubbed == "fetch <URL> now"
    assert (rows[1].n_url, rows[1].n_email, rows[1].n_ip) == (1, 0, 0)
    assert rows[2].scrubbed == "server at <IP> and <IP>"
    assert rows[3].scrubbed == "order <NUM> ref 12345678"
    assert rows[3].n_num == 1
    assert rows[4].scrubbed == PLANTED[4]
    assert rows[5].scrubbed == ""


def test_scrub_matches_python_re(spark):
    """The pattern strings are dialect-portable: python re applying the
    same chain produces the same scrubbed text and counts."""
    rows = (scrub_text(_mkdocs(spark, PLANTED))
            .orderBy("doc_id").collect())
    for r, text in zip(rows, PLANTED):
        cur = text
        for name, pat, repl in SCRUB_STEPS:
            assert r[f"n_{name}"] == len(re.findall(pat, cur)), (text, name)
            cur = re.sub(pat, repl, cur)
        assert r.scrubbed == cur, text


def test_scrub_plan_is_jvm_only(spark):
    df = scrub_text(_mkdocs(spark, PLANTED))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- code_quality ---------------------------------------------------------

CQ_PLANTED = [
    "",                                       # empty -> keep False
    "def f(x):\n    return x + 1\n",          # normal code -> keep True
    "x" * 2000,                               # one huge line -> max_line_len
    "!!! ??? ...",                            # no alpha -> density fail
    "héllo wörld",                  # unicode: length=chars, alpha=ASCII
    "\n".join(["a" * 150] * 3),               # avg line len 150 -> fail
]


def test_code_quality_planted(spark):
    from data_text_search_spark.operators.curation import code_quality
    rows = (code_quality(_mkdocs(spark, CQ_PLANTED))
            .orderBy("doc_id").collect())
    for r, text in zip(rows, CQ_PLANTED):
        lines = text.split("\n")
        assert r.n_lines == len(lines)
        assert r.max_line_len == max(len(l) for l in lines)
        assert r.sum_line_len == sum(len(l) for l in lines)
        assert r.n_chars == len(text)
        assert r.n_alnum == len(re.findall("[A-Za-z0-9]", text))
        assert r.n_alpha == len(re.findall("[A-Za-z]", text))
        want_keep = (len(text) > 0
                     and 4 * r.n_alpha >= r.n_chars
                     and r.max_line_len <= 1000
                     and r.sum_line_len <= 100 * r.n_lines)
        assert r.keep == want_keep, text[:40]
    assert [r.keep for r in rows] == [False, True, False, False, True, False]


def test_code_quality_plan_has_no_shuffle(spark):
    from data_text_search_spark.operators.curation import code_quality
    df = code_quality(_mkdocs(spark, ["a b"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- repetition_stats -----------------------------------------------------

REP_PLANTED = [
    "a b a b a",          # bigram tie "a b"=2 "b a"=2 -> gram-asc tiebreak
    "x\ny\nx\n",          # dup line 'x' -> 1 repeated char
    "",                   # no grams
    "single",             # 1 token -> no grams
    "c c c c",            # "c c" x3
]


def test_repetition_stats_planted(spark):
    from collections import Counter
    from data_text_search_spark.operators.curation import repetition_stats
    rows = (repetition_stats(_mkdocs(spark, REP_PLANTED))
            .orderBy("doc_id").collect())
    for r, text in zip(rows, REP_PLANTED):
        lines = text.split("\n")
        assert r.n_lines == len(lines)
        assert r.line_chars == sum(len(l) for l in lines)
        seen, dup_chars = set(), 0
        for l in lines:
            if l in seen:
                dup_chars += len(l)
            seen.add(l)
        assert r.dup_line_chars == dup_chars, text
        toks = tokenize_py(text)
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        assert r.n_grams == len(grams)
        if grams:
            cnt = Counter(grams)
            want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            assert (r.top_gram, r.top_gram_count) == want, text
        else:
            assert (r.top_gram, r.top_gram_count) == ("", 0)
    assert rows[0].top_gram == "a b" and rows[0].top_gram_count == 2
    assert rows[4].top_gram_count == 3


# --- duplicate_spans ------------------------------------------------------

SPAN_PLANTED = [
    "one two three four",        # shares 'one two three' with doc1
    "zzz one two three",
    "p q r p q r p q r",         # within-doc repeats only -> 0 dups
    "a b",                       # shorter than span -> (0, 0)
]


def test_duplicate_spans_planted(spark):
    from data_text_search_spark.operators.curation import duplicate_spans
    rows = (duplicate_spans(_mkdocs(spark, SPAN_PLANTED), span=3)
            .orderBy("doc_id").collect())
    # python reference: position-level spans, dup iff span text in >=2 docs
    doc_spans = []
    for text in SPAN_PLANTED:
        toks = tokenize_py(text)
        doc_spans.append([" ".join(toks[i:i + 3])
                          for i in range(len(toks) - 2)])
    owners = {}
    for d, spans in enumerate(doc_spans):
        for s in set(spans):
            owners.setdefault(s, set()).add(d)
    for r, spans in zip(rows, doc_spans):
        assert r.n_spans == len(spans)
        want_dup = sum(1 for s in spans if len(owners[s]) >= 2)
        assert r.n_dup_spans == want_dup, r.doc_id
    assert [(r.n_spans, r.n_dup_spans) for r in rows] == [
        (2, 1), (2, 1), (7, 0), (0, 0)]


def test_duplicate_spans_rejects_tiny_span(spark):
    from data_text_search_spark.operators.curation import duplicate_spans
    with pytest.raises(ValueError):
        duplicate_spans(_mkdocs(spark, ["x"]), span=1)


def test_duplicate_spans_plan_is_single_pass_window(spark):
    """No pairwise document join, and ONE position explode: the dup
    flag comes from a window over the span-hash partition (min doc !=
    max doc), not from a second explode + aggregate + semi-join (the
    round-6-start shape)."""
    from data_text_search_spark.operators.curation import duplicate_spans
    df = duplicate_spans(_mkdocs(spark, SPAN_PLANTED), span=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert plan.count("Generate") == 1   # single position explode
    assert "LeftSemi" not in plan
    assert "Cartesian" not in plan


def test_chunk_null_text_yields_one_empty_chunk(spark):
    """A NULL text document must not vanish from the chunk output:
    tokenize(NULL) is NULL, NULL n_chunks would make sequence() NULL
    and explode() drop the row."""
    df = spark.createDataFrame([(1, "alpha beta"), (2, None)],
                               "doc_id long, text string")
    out = chunk_documents(df, chunk_size=4, overlap=1)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["chunk_id"] == 0
    assert rows[2]["chunk_text"] == ""
    assert rows[2]["n_chunk_tokens"] == 0


def test_repetition_stats_line_only_skips_bigram_aggregate(spark):
    """include_bigrams=False: identical line columns, constant gram
    columns, and NO shuffle in the plan (the dup-line gate's shape)."""
    from data_text_search_spark.operators.curation import repetition_stats
    df = spark.createDataFrame(
        [(1, "a b\na b\nc"), (2, "x\ny\nz")], "doc_id long, text string")
    full = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    lean_df = repetition_stats(df, include_bigrams=False)
    lean = {r["doc_id"]: r for r in lean_df.collect()}
    for d in (1, 2):
        for c in ("n_lines", "line_chars", "dup_line_chars", "n_grams"):
            assert lean[d][c] == full[d][c]
        assert lean[d]["top_gram"] == "" and lean[d]["top_gram_count"] == 0
    plan = lean_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_contamination_planted(spark):
    """A corpus doc sharing a 5-token window with the eval set is
    flagged with the exact overlap-position count; clean docs emit 0;
    docs shorter than span emit (0, 0)."""
    from data_text_search_spark.operators.curation import (
        contamination_stats,
        decontaminate,
    )
    leak = "alpha beta gamma delta epsilon"
    corpus = spark.createDataFrame(
        [(1, f"intro {leak} outro words here"),   # 1 leaked window + noise
         (2, f"{leak} {leak}"),                   # leak twice + bridging spans
         (3, "totally clean text with many safe words"),
         (4, "tiny")],                            # shorter than span
        "doc_id long, text string")
    ev = spark.createDataFrame([(100, f"prefix {leak} suffix")],
                               "eval_id long, text string")
    out = {r["doc_id"]: r for r in contamination_stats(
        corpus, ev, span=5, id_col="doc_id").collect()}
    assert out[1]["n_overlap_spans"] == 1
    # doc 2: positions 1 and 6 are the two full-leak windows; the eval
    # text also contains windows starting at 'prefix'/... no — eval
    # windows are 'prefix a b g d', 'a b g d e', 'b g d e suffix', so
    # only the exact leak window matches; bridging windows of doc 2
    # ('b g d e a' etc.) are not in the eval set
    assert out[2]["n_overlap_spans"] == 2
    assert out[3]["n_overlap_spans"] == 0
    assert out[4] ["n_spans"] == 0 and out[4]["n_overlap_spans"] == 0
    # strict decontamination drops exactly the flagged docs
    kept = sorted(r["doc_id"] for r in
                  decontaminate(corpus, ev, span=5).collect())
    assert kept == [3, 4]
    # a loose threshold keeps the single-window doc
    kept1 = sorted(r["doc_id"] for r in
                   decontaminate(corpus, ev, span=5,
                                 max_overlap_spans=1).collect())
    assert kept1 == [1, 3, 4]


def test_contamination_plan_shape(spark):
    """The eval hash set reaches the corpus side as a BROADCAST join
    (eval suites are tiny vs the corpus) marking positions in place —
    a row-preserving LEFT join against the distinct set, so totals ride
    the same pass — and no cartesian/pairwise document join exists
    anywhere in the plan."""
    from data_text_search_spark.operators.curation import contamination_stats
    corpus = spark.createDataFrame(
        [(i, "w%d x y z a b c d e f g h" % i) for i in range(30)],
        "doc_id long, text string")
    ev = spark.createDataFrame([(1, "x y z a b c d e f g")],
                               "eval_id long, text string")
    plan = (contamination_stats(corpus, ev, span=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan, plan
    assert "Cartesian" not in plan, plan


def test_remove_duplicate_spans_keep_canonical(spark):
    """Cross-doc duplicated passages survive ONLY in their min-doc_id
    owner; non-owners lose every covered token; unique content and
    sub-span docs are untouched; within-doc-only repeats are not
    duplicated."""
    from data_text_search_spark.operators.curation import (
        remove_duplicate_spans,
    )
    boiler = "one two three four"  # 4-token span shared by docs 1,2,5
    df = spark.createDataFrame(
        [(1, f"{boiler} unique tail here"),
         (2, f"other head {boiler}"),
         (5, f"{boiler} and {boiler}"),       # non-owner, two occurrences
         (3, "totally unrelated content words"),
         (4, "one two three")],               # shorter than the span
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(df, span=4).collect()}
    # owner (min doc_id = 1) keeps everything
    assert out[1]["text_clean"] == "one two three four unique tail here"
    assert out[1]["n_tokens_removed"] == 0
    # doc 2 loses exactly the boilerplate tokens
    assert out[2]["text_clean"] == "other head"
    assert out[2]["n_tokens_removed"] == 4
    # doc 5 loses both occurrences; 'and' between them survives only if
    # not covered — spans here: positions 1 and 6 flagged, plus the
    # bridging windows that also occur nowhere else; 'and' at position 5
    # is covered by no flagged span start <= 5 <= start+3 except ... the
    # flagged hashes are exactly the cross-doc ones (the two full-boiler
    # windows), so starts={1,6}: covered tokens 1-4 and 6-9, 'and' (5)
    # survives
    assert out[5]["text_clean"] == "and"
    assert out[5]["n_tokens_removed"] == 8
    # untouched docs
    assert out[3]["n_tokens_removed"] == 0
    assert out[4]["text_clean"] == "one two three"
    assert out[4]["n_tokens_removed"] == 0


def test_remove_duplicate_spans_overlap_merge(spark):
    """Overlapping flagged windows merge into one excised interval
    (no double counting, no stranded mid-window tokens)."""
    from data_text_search_spark.operators.curation import (
        remove_duplicate_spans,
    )
    shared = "a b c d e f"  # 6 tokens -> three 4-token windows, all shared
    df = spark.createDataFrame(
        [(1, f"{shared} owner keeps all"),
         (2, f"x {shared} y")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(df, span=4).collect()}
    assert out[1]["n_tokens_removed"] == 0
    assert out[2]["text_clean"] == "x y"
    assert out[2]["n_tokens_removed"] == 6


def test_remove_duplicate_spans_null_text(spark):
    """NULL text comes through as ('', 0, 0), not a NULL row."""
    from data_text_search_spark.operators.curation import (
        remove_duplicate_spans,
    )
    df = spark.createDataFrame([(1, "a b c d e"), (2, None)],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(df, span=4).collect()}
    assert out[2]["text_clean"] == ""
    assert out[2]["n_tokens"] == 0
    assert out[2]["n_tokens_removed"] == 0
