"""Tokenizer + clean parity: Spark expression == pandas UDF == pure Python
== DuckDB SQL, and golden behavior cases from the reference."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_text_search_spark.functions.text import (
    clean_expr,
    clean_pandas_udf,
    clean_py,
    duckdb_tokenize_sql,
    join_key_norm_expr,
    score_abs_expr,
    sha256_py,
    tokenize_expr,
    tokenize_pandas_udf,
    tokenize_py,
)

SAMPLES = [
    "def get_row(x): return x + 1",
    "SELECT a, b FROM t WHERE a <= 3",
    "CamelCase MIXED_case lower_case",
    "",
    "... !!! ???",
    "a",
    "tabs\tand\nnewlines  and   spaces",
    "under_score __dunder__ x_1_y",
    "<p>Hello</p> &nbsp; bob@example.com kind regards bob",
    "number 123 mixed a1b2",
    # unicode: words stay whole in every engine; NBSP (\xa0) and VT (\x0b)
    # are NOT in the explicit whitespace class → one-char token / split
    "Straße wörterbuch ÉLAN café_au_lait",
    "привет мир ПРИВЕТ",
    "日本語のテキスト 漢字",
    "nbsp\xa0here vt\x0bthere",
    "½ cup ² power ① circled",
    "¿qué? ¡sí! ñandú ǅungla ẞ",
    # NB: no word-final Σ and no İ — lower() context rules differ between
    # Python/Java (final sigma, i+combining dot) and DuckDB (plain σ/i);
    # documented divergence in functions/text.py
    "Ψηφιακός ΣΟΦΙΑ ς σ",
]


def test_tokenize_py_golden():
    assert tokenize_py("def get_row(x): return x+1") == [
        "def", "get_row", "(", "x", ")", ":", "return", "x", "+", "1"]
    assert tokenize_py("") == []
    assert tokenize_py("UPPER Lower") == ["upper", "lower"]
    assert tokenize_py("... !!!") == [".", ".", ".", "!", "!", "!"]


def test_tokenize_spark_expr_matches_py(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": SAMPLES}))
    got = [r["tok"] for r in
           df.select(tokenize_expr("t").alias("tok")).collect()]
    assert got == [tokenize_py(s) for s in SAMPLES]


def test_tokenize_pandas_udf_matches_expr(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": SAMPLES}))
    rows = df.select(
        tokenize_expr("t").alias("a"), tokenize_pandas_udf("t").alias("b")
    ).collect()
    for r in rows:
        assert r["a"] == r["b"]


def test_tokenize_duckdb_matches_py():
    con = duckdb.connect()
    con.register("s", pd.DataFrame({"t": SAMPLES}))
    got = con.sql(f"select {duckdb_tokenize_sql('t')} as tok from s").fetchall()
    assert [list(g[0]) for g in got] == [tokenize_py(s) for s in SAMPLES]


def test_clean_golden():
    # exact reference pipeline behavior (clean_funcs.py:34-57); input is
    # lowercased first as on the live path (bm25_functions.py:309)
    s = "<p>hello</p> &nbsp; world subject: q3 update body bob@example.com kind regards bob".lower()
    out = clean_py(s)
    assert "<p>" not in out and "&nbsp;" not in out
    assert "@" not in out
    assert "kind regards" not in out
    # email_start strips everything up to and incl. 'subject:' (greedy .*)
    assert "hello" not in out
    # backslash → slash
    assert clean_py(r"a\b") == "a/b"
    # multi-space collapse
    assert clean_py("a    b") == "a b"


def test_clean_spark_matches_py(spark):
    low = [s.lower() for s in SAMPLES]
    df = spark.createDataFrame(pd.DataFrame({"t": low}))
    rows = df.select(clean_expr("t").alias("a"),
                     clean_pandas_udf("t").alias("b")).collect()
    for r, s in zip(rows, low):
        assert r["a"] == clean_py(s)
        assert r["b"] == clean_py(s)


def test_sha256_matches_spark(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": SAMPLES}))
    rows = df.select("t", F.sha2(F.col("t"), 256).alias("h")).collect()
    for r in rows:
        assert r["h"] == sha256_py(r["t"])


def test_score_abs_formatting(spark):
    # F7: abs(round(score,2)) — negative scores lose sign
    df = spark.createDataFrame(pd.DataFrame({"s": [-1.237, 2.344, -0.004]}))
    got = [r["a"] for r in df.select(score_abs_expr("s").alias("a")).collect()]
    assert got == [1.24, 2.34, 0.0]


def test_join_key_norm(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": ["42.0", "42", "4.20", "x.0"]}))
    got = [r["n"] for r in df.select(join_key_norm_expr("k").alias("n")).collect()]
    assert got == ["42", "42", "4.20", "x"]
