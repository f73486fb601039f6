"""S2 xlsx fallback: the stdlib-only reader over a spec-conformant
workbook (built from raw ECMA-376 parts; openable by Excel/openpyxl)."""

from __future__ import annotations

import zipfile

from data_text_search_spark.operators import reference_extras as rx
from data_text_search_spark.sources.xlsx_lite import read_xlsx

_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
_R = ('xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
      'relationships"')


def _make_xlsx(path: str) -> None:
    content_types = f"""<?xml version="1.0"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
 <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
 <Default Extension="xml" ContentType="application/xml"/>
 <Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
 <Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
 <Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""
    root_rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""
    workbook = f"""<?xml version="1.0"?>
<workbook {_NS} {_R}><sheets>
 <sheet name="Data" sheetId="1" r:id="rId1"/>
</sheets></workbook>"""
    wb_rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""
    shared = f"""<?xml version="1.0"?>
<sst {_NS} count="3" uniqueCount="3">
 <si><t>text</t></si>
 <si><t>first doc body</t></si>
 <si><r><t>rich </t></r><r><t>run</t></r></si>
</sst>"""
    sheet = f"""<?xml version="1.0"?>
<worksheet {_NS}><sheetData>
 <row r="1">
  <c r="A1" t="inlineStr"><is><t>id</t></is></c>
  <c r="B1" t="s"><v>0</v></c>
  <c r="C1" t="inlineStr"><is><t>score</t></is></c>
  <c r="D1" t="inlineStr"><is><t>flag</t></is></c>
 </row>
 <row r="2">
  <c r="A2"><v>1</v></c>
  <c r="B2" t="s"><v>1</v></c>
  <c r="C2"><v>3.5</v></c>
  <c r="D2" t="b"><v>1</v></c>
 </row>
 <row r="3">
  <c r="A3"><v>2</v></c>
  <c r="B3" t="s"><v>2</v></c>
  <c r="D3" t="b"><v>0</v></c>
 </row>
</sheetData></worksheet>"""
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", shared)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


def test_read_xlsx_values_and_types(tmp_path):
    p = str(tmp_path / "t.xlsx")
    _make_xlsx(p)
    pdf = read_xlsx(p)
    assert list(pdf.columns) == ["id", "text", "score", "flag"]
    assert pdf["id"].tolist() == [1, 2]            # integral floats → int64
    assert str(pdf["id"].dtype) == "int64"
    assert pdf["text"].tolist() == ["first doc body", "rich run"]
    assert pdf["score"][0] == 3.5
    import math
    assert math.isnan(pdf["score"][1]) or pdf["score"][1] is None
    assert pdf["flag"].tolist() == [True, False]


def test_read_table_xlsx_dispatch(spark, tmp_path):
    p = str(tmp_path / "t.xlsx")
    _make_xlsx(p)
    df = rx.read_table(spark, p)
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["text"] == "first doc body" and rows[1]["score"] == 3.5
    assert "doc_id" in df.columns


def test_read_xlsx_duplicate_headers_deduped(tmp_path):
    """Two columns named 'name' must come back as name / name.1 (pandas
    convention), not collapse into one ragged column."""
    p = str(tmp_path / "dup.xlsx")
    _make_xlsx(p)
    import zipfile as _zf

    with _zf.ZipFile(p) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    sheet = parts["xl/worksheets/sheet1.xml"].decode()
    # rename headers: id -> name, score -> name (two duplicates of 'name')
    sheet = sheet.replace("<is><t>id</t></is>", "<is><t>name</t></is>")
    sheet = sheet.replace("<is><t>score</t></is>", "<is><t>name</t></is>")
    parts["xl/worksheets/sheet1.xml"] = sheet.encode()
    with _zf.ZipFile(p, "w") as zf:
        for n, data in parts.items():
            zf.writestr(n, data)
    pdf = read_xlsx(p)
    assert list(pdf.columns) == ["name", "text", "name.1", "flag"]
    assert pdf["name"].tolist() == [1, 2]
    assert pdf["name.1"][0] == 3.5


def test_expand_zips_guards(tmp_path):
    """Nested zips extract into fresh subdirs; runaway nesting trips the
    archive cap instead of looping forever."""
    import os
    import zipfile as _zf

    inner_txt = tmp_path / "a.txt"
    inner_txt.write_text("hello")
    outer = str(tmp_path / "outer.zip")
    with _zf.ZipFile(outer, "w") as z:
        z.write(inner_txt, "member.txt")
    out = rx.expand_zips([outer])
    assert out == [os.path.join(f"{outer}.d", "member.txt")]
    assert os.path.exists(out[0])

    # deep nesting chain: bounded by max_archives, clear error
    level = str(tmp_path / "z0.zip")
    with _zf.ZipFile(level, "w") as z:
        z.write(inner_txt, "x.txt")
    for i in range(1, 6):
        nxt = str(tmp_path / f"z{i}.zip")
        with _zf.ZipFile(nxt, "w") as z:
            z.writestr("inner.zip", open(level, "rb").read())
        level = nxt
    import pytest as _pytest
    with _pytest.raises(ValueError, match="nested archives"):
        rx.expand_zips([level], max_archives=3)
