"""Minimal dependency-free .xlsx reader (S2 fallback).

An .xlsx file is a zip of XML parts (ECMA-376 / ISO 29500, public
spec). This reads the FIRST worksheet — the same behavior as the
reference's pd.read_excel default (helper_functions.py:228) — using
only the stdlib (zipfile + xml.etree), so the S2 source works in
environments without openpyxl. pandas/openpyxl remains the preferred
path when installed (read_table tries it first).

Supported cell types: shared strings (t="s"), inline strings
(t="inlineStr"), literal strings (t="str"), booleans (t="b"), numbers
(default). Row 1 is the header. Formulas yield their cached value.
Deliberately not supported (raises): no sheets, encrypted workbooks.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

import pandas as pd

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships}")
_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 (base-26 bijective)."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _first_sheet_part(zf: zipfile.ZipFile) -> str:
    """Resolve the first sheet in workbook order via its relationship."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = wb.find(f"{_NS}sheets")
    if sheets is None or len(sheets) == 0:
        raise ValueError("xlsx has no sheets")
    rid = sheets[0].get(f"{_REL_NS}id")
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    for rel in rels:
        if rel.get("Id") == rid:
            target = rel.get("Target").lstrip("/")
            return target if target.startswith("xl/") else f"xl/{target}"
    raise ValueError(f"sheet relationship {rid} not found")


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root:
        # plain <t> or rich-text runs (<r><t>…) — concatenate all text
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _cell_value(cell, shared: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return "".join(t.text or "" for t in cell.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "str":
        return v.text
    if ctype == "b":
        return v.text == "1"
    return float(v.text)


def read_xlsx(path: str) -> pd.DataFrame:
    """First worksheet → DataFrame; row 1 is the header. Numeric columns
    whose values are all integral come back as int64 (matching the common
    pd.read_excel outcome for id-like columns)."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        sheet = ET.fromstring(zf.read(_first_sheet_part(zf)))
        rows: dict[int, dict[int, object]] = {}
        ncols = 0
        for row in sheet.iter(f"{_NS}row"):
            for cell in row.findall(f"{_NS}c"):
                m = _CELL_REF.match(cell.get("r", ""))
                if not m:
                    continue
                ci, ri = _col_index(m.group(1)), int(m.group(2)) - 1
                rows.setdefault(ri, {})[ci] = _cell_value(cell, shared)
                ncols = max(ncols, ci + 1)
    if not rows or 0 not in rows:
        return pd.DataFrame()
    header = [rows[0].get(i) if rows[0].get(i) is not None else f"col{i}"
              for i in range(ncols)]
    # de-duplicate header names like pandas ('name', 'name.1', 'name.2'):
    # a dict-keyed column store silently collapses duplicates otherwise
    seen: dict[object, int] = {}
    for i, h in enumerate(header):
        k = seen.get(h, 0)
        seen[h] = k + 1
        if k:
            header[i] = f"{h}.{k}"
    data = {h: [] for h in header}
    for ri in range(1, (max(rows) + 1) if len(rows) > 1 else 1):
        r = rows.get(ri, {})
        for ci, h in enumerate(header):
            data[h].append(r.get(ci))
    pdf = pd.DataFrame(data)
    for col in pdf.columns:
        s = pdf[col]
        vals = s.dropna()
        if len(vals) and all(isinstance(v, float) for v in vals) \
                and all(float(v).is_integer() for v in vals) \
                and not s.isna().any():
            pdf[col] = s.astype("int64")
    return pdf
