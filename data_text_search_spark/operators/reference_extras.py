"""Remaining reference operators: metadata JSON (F10/F11), highlight spans
(F13), dormant optional normalizers (F14), conditional blanking (P3),
case-note self-join (J3), result re-sort (T2), and file sources (S1/S2).

These complete the SURVEY §2 inventory; each cites the reference span it
re-expresses.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

# --------------------------------------------------- F10/F11 metadata json


def combine_metadata_columns(df: DataFrame, cols: list[str],
                             out: str = "metadata") -> DataFrame:
    """F10 (semantic_ingest_functions.py:29-52): the reference hand-builds a
    '{"col": "val", ...}' string with manual quote/newline escaping;
    `to_json(struct(...))` is the engine equivalent (and actually valid
    JSON, which the reference's is not for all inputs — divergence
    documented: we emit correct escaping)."""
    return df.withColumn(out, F.to_json(F.struct(*[F.col(c) for c in cols])))


def parse_metadata(df: DataFrame, col: str = "metadata",
                   out: str = "metadata_map") -> DataFrame:
    """F11 (semantic_ingest_functions.py:58-80): ast.literal_eval →
    from_json into map<string,string>."""
    return df.withColumn(
        out, F.from_json(F.col(col), "map<string,string>"))


def clean_line_breaks(col) -> F.Column:
    """F12 (semantic_ingest_functions.py:54-56): newlines/CRs → spaces."""
    c = F.col(col) if isinstance(col, str) else col
    return F.translate(c, "\n\r", "  ")


# --------------------------------------------------------- F13 highlighting

_SPAN_TYPE = ArrayType(StructType([
    StructField("start", IntegerType()),
    StructField("end", IntegerType()),
]))


def highlight_positions_py(search: str, full: str, merge_gap: int = 10,
                           min_len: int = 2) -> list[tuple[int, int]]:
    """F13 span math (helper_functions.py:405-474), shared by the
    distributed UDF and the driver-side Excel writer: find every
    occurrence of each space-split search token in the full text, merge
    spans closer than `merge_gap` chars (:457), keep spans of length > 1
    (:468)."""
    tl = str(full).lower()
    pos: list[tuple[int, int]] = []
    for tok in {w for w in str(search).lower().split() if w}:
        start = 0
        while True:
            i = tl.find(tok, start)
            if i < 0:
                break
            pos.append((i, i + len(tok)))
            start = i + 1
    pos.sort()
    merged: list[list[int]] = []
    for a, b in pos:
        if merged and a - merged[-1][1] <= merge_gap:
            merged[-1][1] = max(merged[-1][1], b)
        else:
            merged.append([a, b])
    return [(a, b) for a, b in merged if b - a >= min_len]


def highlight_spans_udf(search_text_col, full_text_col,
                        merge_gap: int = 10, min_len: int = 2):
    """F13 distributed form: array<struct<start,end>> per row —
    presentation-layer only, never rank-affecting. Arrow-batched."""

    @F.pandas_udf(_SPAN_TYPE)
    def _spans(search: pd.Series, full: pd.Series) -> pd.Series:
        return pd.Series([
            highlight_positions_py(s, t, merge_gap, min_len)
            for s, t in zip(search.astype(str), full.astype(str))])

    return _spans(search_text_col, full_text_col)


# ------------------------------------------- S10 highlighted-Excel sink


def write_results_excel(results: pd.DataFrame, path: str, search_text: str,
                        column_to_highlight: str, merge_gap: int = 10,
                        min_len: int = 2) -> None:
    """S10 (helper_functions.py:504-548 + bm25_functions.py:675-682): the
    reference's visible product output — an xlsx of the top-k results
    with every matched span of the search text highlighted red in the
    results column (rich-text runs), bold headers, wrapped wide column.

    Driver-side by design: the input is the COLLECTED top-k (tens of
    rows), never a distributed table. openpyxl-optional — raises
    NotImplementedError with the install hint when absent (same gating
    as the xlsx reader, S2)."""
    try:
        from openpyxl import Workbook
        from openpyxl.cell.rich_text import CellRichText, TextBlock
        from openpyxl.cell.text import InlineFont
        from openpyxl.styles import Alignment, Font
    except ImportError as e:  # pragma: no cover - sandbox lacks openpyxl
        raise NotImplementedError(
            "highlighted-Excel sink needs openpyxl (pip install openpyxl); "
            "span math is available without it via highlight_spans_udf"
        ) from e

    wb = Workbook()
    sheet = wb.active
    sheet.append(list(results.columns))
    for cell in sheet[1]:
        cell.font = Font(bold=True)
    hi_no = list(results.columns).index(column_to_highlight) + 1
    # reference pins the highlighted column wide (helper_functions.py:531)
    sheet.column_dimensions[
        sheet.cell(row=1, column=hi_no).column_letter].width = 150
    red = InlineFont(color="00FF0000")
    for r_idx, row in enumerate(results.itertuples(index=False), start=2):
        for c_idx, val in enumerate(row, start=1):
            cell = sheet.cell(row=r_idx, column=c_idx, value=val)
            if c_idx == hi_no:
                full = str(val)
                rich = CellRichText()
                prev = 0
                for a, b in highlight_positions_py(search_text, full,
                                                   merge_gap, min_len):
                    rich.append(full[prev:a])
                    rich.append(TextBlock(red, full[a:b]))
                    prev = b
                rich.append(full[prev:])
                cell.value = rich
                cell.alignment = Alignment(wrap_text=True)
    wb.save(path)


# ------------------------------------------- F14 dormant normalizers (OFF)

MONTH_STOPWORDS = ["january", "february", "march", "april", "may", "june",
                   "july", "august", "september", "october", "november",
                   "december"]


def remove_stopwords(tokens_col, stopwords: list[str] | None = None):
    """F14 (clean_funcs.py:11-20): the reference BUILDS a month-name
    stopword list but never applies it on the live path — provided here as
    an optional, off-by-default normalizer, mirroring that posture."""
    sw = F.array(*[F.lit(w) for w in (stopwords or MONTH_STOPWORDS)])
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.filter(c, lambda x: ~F.array_contains(sw, x))


def remove_hyphens(col):
    """F14 (clean_funcs.py:86-87)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"-", " ")


def remove_short_tokens(tokens_col, min_len: int = 4):
    """F14 (clean_funcs.py:98-99): keep tokens longer than 3 chars."""
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.filter(c, lambda x: F.length(x) >= min_len)


def alpha_lowercase_only(tokens_col):
    """F14 (clean_funcs.py:95-96): keep alphabetic tokens, lowercased."""
    c = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    return F.transform(F.filter(c, lambda x: x.rlike("^[a-zA-Z]+$")),
                       lambda x: F.lower(x))


# ----------------------------------------------------- P3/J3 case-note ops


def blank_copied_notes(df: DataFrame, text_col: str,
                       copy_col: str = "copy_of_case_note_id") -> DataFrame:
    """P3 (bm25_functions.py:311-313): rows whose copy-id is set get their
    searchable text blanked (duplicate-note suppression). Optional,
    domain-specific ingest rule."""
    if copy_col not in df.columns:
        return df
    return df.withColumn(
        text_col,
        F.when(F.col(copy_col).isNotNull(), F.lit("")).otherwise(F.col(text_col)))


def case_note_join(results: DataFrame, original: DataFrame,
                   note_id: str = "note_id",
                   copy_col: str = "copy_of_case_note_id") -> DataFrame:
    """J3 (bm25_functions.py:638-651): original_note_id =
    coalesce(copy_of_case_note_id, note_id); left-join results on
    note_id == original_note_id."""
    orig = original.withColumn(
        "original_note_id", F.coalesce(F.col(copy_col), F.col(note_id)))
    return results.join(
        F.broadcast(orig),
        results[note_id] == orig["original_note_id"], "left")


# ------------------------------------------------------------- T2 re-sort


def reference_output_sort(results: DataFrame) -> DataFrame:
    """T2 (bm25_functions.py:669): the reference's final output ordering —
    by rounded-absolute score desc, then by search_text desc."""
    return results.orderBy(F.desc("search_score_abs"), F.desc("search_text"))


# ------------------------------------------------------------ S1/S2 sources


def expand_zips(file_list: list[str],
                max_archives: int = 1000,
                max_total_bytes: int = 10 << 30) -> list[str]:
    """S3 (helper_functions.py:242-273): expand any .zip in the input list
    into its member files, recursively — the reference's while-loop
    re-scans files appended by inner zips. Invalid zips warn and pass
    through; .zip entries are dropped from the result. Driver-side by
    design (interactive uploads); distributed corpora are directories/
    globs Spark reads natively.

    Guards (the reference has none): each archive extracts into its own
    fresh subdirectory (never beside the archive, where member names
    could overwrite sibling inputs), and expansion stops with an error
    past `max_archives` nested archives or `max_total_bytes` declared
    uncompressed output (zip bombs, self-containing zips)."""
    import zipfile

    files = list(file_list)
    i = 0
    n_archives = 0
    total = 0
    while i < len(files):
        path = files[i]
        if path.endswith(".zip"):
            n_archives += 1
            if n_archives > max_archives:
                raise ValueError(
                    f"zip expansion exceeded {max_archives} nested archives "
                    f"(possible zip bomb / self-containing zip): {path}")
            try:
                out_dir = f"{path}.d"
                with zipfile.ZipFile(path, "r") as zf:
                    total += sum(zi.file_size for zi in zf.infolist())
                    if total > max_total_bytes:
                        raise ValueError(
                            f"zip expansion exceeded {max_total_bytes} "
                            f"declared uncompressed bytes at {path}")
                    os.makedirs(out_dir, exist_ok=True)
                    zf.extractall(out_dir)
                    files.extend(os.path.join(out_dir, n)
                                 for n in zf.namelist())
            except zipfile.BadZipFile:
                print(f"Warning: '{path}' is not a valid zip file.")
        i += 1
    return [f for f in files if not f.endswith(".zip")]


def detect_file_type(path: str) -> str:
    """S1 (helper_functions.py:204-217). jsonl/json are a
    beyond-reference extension: the lingua franca of LLM training
    corpora (one JSON object per line)."""
    for ext in ("csv", "xlsx", "parquet", "jsonl", "json"):
        if path.lower().endswith(ext):
            return ext
    if path.lower().endswith("pkl.gz"):
        return "pkl.gz"
    raise ValueError(f"unsupported file type: {path}")


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """S2 (helper_functions.py:219-240): csv/xlsx/parquet → DataFrame with
    an explicit doc_id replacing the reference's positional .reset_index().
    xlsx goes through driver-side pandas (out of the hot path, like the
    reference); pkl.gz 'index files' are superseded by the index manifest."""
    kind = detect_file_type(path)
    if kind == "parquet":
        df = spark.read.parquet(path)
    elif kind == "csv":
        df = spark.read.csv(path, header=True, inferSchema=True,
                            multiLine=True, escape='"')
    elif kind in ("jsonl", "json"):
        # line-delimited JSON (Spark's native json layout) — distributed
        # scan with schema inference, splittable like csv/parquet
        df = spark.read.json(path)
    elif kind == "xlsx":
        try:
            pdf = pd.read_excel(path)  # first sheet, like the reference
        except ImportError:  # no openpyxl: stdlib-only fallback reader
            from data_text_search_spark.sources.xlsx_lite import read_xlsx
            pdf = read_xlsx(path)
        df = spark.createDataFrame(pdf)
    else:
        raise ValueError("pkl.gz index blobs are replaced by the parquet "
                         "index + manifest (see operators/index_build.py)")
    if "doc_id" not in df.columns:
        # positional id like the reference's .reset_index(); file-read order
        # is stable, and these are small interactive files (the reference
        # caps them at 500 MB) — large corpora carry their own stable ids.
        # The unpartitioned row_number window serializes through ONE task,
        # so refuse clearly beyond interactive scale instead of degrading.
        POSITIONAL_ID_MAX_ROWS = 5_000_000
        n = df.count()
        if n > POSITIONAL_ID_MAX_ROWS:
            raise ValueError(
                f"{path} has {n} rows and no doc_id column: positional ids "
                "are assigned through a single-task window and are only "
                "supported for interactive-scale files "
                f"(≤{POSITIONAL_ID_MAX_ROWS} rows). Add an explicit stable "
                "doc_id column to the source instead.")
        from pyspark.sql import Window
        mid = F.monotonically_increasing_id()
        df = (df.withColumn("_mid", mid)
              .withColumn("doc_id",
                          F.row_number().over(Window.orderBy("_mid")) - 1)
              .drop("_mid"))
    return df
