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
