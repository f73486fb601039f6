"""F10-F14, P3, J3, T2, S1/S2 reference-parity operators."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_text_search_spark.operators import reference_extras as rx


def test_metadata_roundtrip(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "a": ['va"l', "x\ny"], "b": ["1", "2"]}))
    out = rx.parse_metadata(rx.combine_metadata_columns(df, ["a", "b"]))
    rows = out.collect()
    for r in rows:
        assert json.loads(r["metadata"]) == {"a": r["a"], "b": r["b"]}
        assert r["metadata_map"]["a"] == r["a"]


def test_highlight_spans_merge_and_minlen(spark):
    text = "a specific x example farther away specific again ee"
    df = spark.createDataFrame(pd.DataFrame({
        "q": ["specific example"], "t": [text]}))
    spans = df.select(rx.highlight_spans_udf("q", "t").alias("s")).first()["s"]
    # 'specific'(2..10) and 'example'(13..20) are within 10 chars → merged
    assert (spans[0]["start"], spans[0]["end"]) == (2, 20)
    assert text[2:10] == "specific"
    # the later isolated 'specific' is its own span
    assert any(text[s["start"]:s["end"]] == "specific" for s in spans[1:])


def test_dormant_normalizers_off_by_default(spark):
    # the engine must NOT apply stopwords/stemming on the live path (F14);
    # these helpers exist but are opt-in
    df = spark.createDataFrame(pd.DataFrame({"toks": [
        ["january", "report", "x", "hyphen-ated"]]}))
    out = df.select(
        rx.remove_stopwords("toks").alias("nostop"),
        rx.remove_short_tokens("toks").alias("long"),
        rx.alpha_lowercase_only("toks").alias("alpha"),
    ).first()
    assert out["nostop"] == ["report", "x", "hyphen-ated"]
    assert out["long"] == ["january", "report", "hyphen-ated"]
    assert out["alpha"] == ["january", "report", "x"]


def test_blank_copied_notes_and_join(spark):
    orig = spark.createDataFrame(pd.DataFrame({
        "note_id": [1, 2, 3],
        "copy_of_case_note_id": [None, 1.0, None],
        "text": ["original", "copy of 1", "other"]}))
    blanked = rx.blank_copied_notes(orig, "text")
    vals = {r["note_id"]: r["text"] for r in blanked.collect()}
    assert vals[2] == "" and vals[1] == "original"

    results = spark.createDataFrame(pd.DataFrame({"note_id": [1], "score": [2.0]}))
    joined = rx.case_note_join(results, orig)
    # note 1 is original_note_id for notes 1 AND 2 (the copy) → fan-out 2
    assert joined.count() == 2


def test_reference_output_sort(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "search_score_abs": [1.0, 2.0, 2.0],
        "search_text": ["a", "b", "c"]}))
    got = [(r["search_score_abs"], r["search_text"])
           for r in rx.reference_output_sort(df).collect()]
    assert got == [(2.0, "c"), (2.0, "b"), (1.0, "a")]


def test_read_table_csv(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    pd.DataFrame({"text": ["aa", "bb", "cc"]}).to_csv(p, index=False)
    df = rx.read_table(spark, p)
    assert [r["doc_id"] for r in df.orderBy("doc_id").collect()] == [0, 1, 2]
    assert rx.detect_file_type("x.parquet") == "parquet"
    with pytest.raises(ValueError):
        rx.detect_file_type("x.unknown")
    with pytest.raises(ValueError):
        rx.read_table(spark, "old_index.pkl.gz")


def test_clean_line_breaks(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["a\nb\rc"]}))
    assert df.select(rx.clean_line_breaks("t").alias("o")).first()["o"] == "a b c"


def test_highlight_positions_py_matches_udf(spark):
    import pandas as pd
    cases = [("table scan", "a table on the scanner does table scan daily"),
             ("and", "and and and"),
             ("xyz", "no match here"),
             ("", "anything")]
    df = spark.createDataFrame(pd.DataFrame(
        {"q": [c[0] for c in cases], "t": [c[1] for c in cases]}))
    got = [r["s"] for r in
           df.select(rx.highlight_spans_udf("q", "t").alias("s")).collect()]
    for (q, t), spans in zip(cases, got):
        want = rx.highlight_positions_py(q, t)
        assert [(s["start"], s["end"]) for s in spans] == want


def test_write_results_excel_gated_or_golden(tmp_path):
    """With openpyxl: write a workbook and read back the rich-text runs.
    Without it (this sandbox): a clean NotImplementedError with the
    install hint — same gating pattern as the S2 xlsx reader."""
    import pandas as pd
    pdf = pd.DataFrame({
        "doc_id": [1, 2],
        "search_text": ["the table scan runs a table scan", "no match"],
        "search_score_abs": [4.5, 1.0]})
    path = str(tmp_path / "out.xlsx")
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        import pytest
        with pytest.raises(NotImplementedError, match="openpyxl"):
            rx.write_results_excel(pdf, path, "table scan", "search_text")
        return
    rx.write_results_excel(pdf, path, "table scan", "search_text")
    from openpyxl import load_workbook
    wb = load_workbook(path, rich_text=True)
    sheet = wb.active
    assert [c.value for c in sheet[1]] == list(pdf.columns)
    from openpyxl.cell.rich_text import CellRichText, TextBlock
    cell = sheet.cell(row=2, column=2).value
    assert isinstance(cell, CellRichText)
    red_runs = [str(b) for b in cell if isinstance(b, TextBlock)]
    assert red_runs and all("table scan" in r for r in red_runs)


def test_expand_zips_recursive_and_invalid(tmp_path):
    """S3: zips expand in place (recursively — an inner zip extracted from
    an outer one is expanded too), invalid zips warn and drop, non-zip
    paths pass through, .zip names never survive."""
    import zipfile
    inner = tmp_path / "inner.zip"
    with zipfile.ZipFile(inner, "w") as z:
        z.writestr("deep.csv", "a,b\n1,2\n")
    outer = tmp_path / "outer.zip"
    with zipfile.ZipFile(outer, "w") as z:
        z.writestr("top.parquet", b"PAR1fake")
        z.write(inner, "inner.zip")
    inner.unlink()
    bad = tmp_path / "bad.zip"
    bad.write_bytes(b"not a zip at all")
    plain = tmp_path / "plain.csv"
    plain.write_text("x\n1\n")
    out = rx.expand_zips([str(outer), str(bad), str(plain)])
    names = sorted(os.path.basename(p) for p in out)
    assert names == ["deep.csv", "plain.csv", "top.parquet"]
    assert all(not p.endswith(".zip") for p in out)
    assert all(os.path.exists(p) for p in out)


def test_read_table_jsonl(spark, tmp_path):
    """jsonl (one JSON object per line — the LLM-corpus lingua franca)
    goes through the distributed spark.read.json scan."""
    p = str(tmp_path / "docs.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 7, "text": "hello spark"}\n'
                '{"doc_id": 8, "text": "hello duckdb"}\n')
    df = rx.read_table(spark, p)
    rows = {r["doc_id"]: r["text"] for r in df.collect()}
    assert rows == {7: "hello spark", 8: "hello duckdb"}
    assert rx.detect_file_type("a/b/c.JSONL") == "jsonl"
