"""Dependency-free XLSX reading (reference ROADMAP.md:39 "Excel files").

An .xlsx file is a ZIP of ECMA-376 SpreadsheetML XML parts; the subset a
data pipeline needs — worksheet cell values, shared strings, sheet
naming — parses fine with stdlib ``zipfile`` + ``ElementTree``.  No
openpyxl/spark-excel required, which matters on locked-down clusters
(and in this image, where neither is installed).

Value semantics (the engine's all-string contract):

* shared strings (``t="s"``), inline strings (``t="inlineStr"``), and
  formula-cached strings (``t="str"``) → the text as-is;
* numbers → the stored lexical form (``"185.5"``, ``"10"``);
* booleans (``t="b"``) → ``"TRUE"`` / ``"FALSE"``;
* missing/empty cells → None (Excel has no empty-string-vs-absent
  distinction the way CSV does).

Dates are numbers in XLSX (serial days) unless the producing app wrote
them as strings; serial-date decoding is number-format-dependent and out
of scope — the mapping language's date transforms handle string dates.
"""

from __future__ import annotations

import re
import zipfile
from io import BytesIO
from xml.etree import ElementTree as ET

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {"r": "http://schemas.openxmlformats.org/package/2006/relationships"}
_RID_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A' → 0, 'B' → 1, … 'AA' → 26 (cell ref column letters)."""
    m = _CELL_REF.match(ref)
    letters = m.group(1) if m else "A"
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _sheet_part(zf: zipfile.ZipFile, sheet: str | int) -> str:
    """Resolve a sheet name/index to its zip part path via workbook rels."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    targets = {
        rel.get("Id"): rel.get("Target") for rel in rels.findall("r:Relationship", _REL_NS)
    }
    sheets = wb.findall("m:sheets/m:sheet", _NS)
    if isinstance(sheet, int):
        if not (0 <= sheet < len(sheets)):
            raise ValueError(f"sheet index {sheet} out of range ({len(sheets)} sheets)")
        chosen = sheets[sheet]
    else:
        by_name = {s.get("name"): s for s in sheets}
        if sheet not in by_name:
            raise ValueError(f"no sheet named {sheet!r}; have {sorted(by_name)}")
        chosen = by_name[sheet]
    target = targets[chosen.get(_RID_ATTR)]
    return target if target.startswith("xl/") else f"xl/{target}"


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall("m:si", _NS):
        # plain <t> or rich-text runs <r><t>…
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    return out


def _cell_value(cell: ET.Element, shared: list[str]) -> str | None:
    t = cell.get("t", "n")
    if t == "inlineStr":
        is_el = cell.find("m:is", _NS)
        if is_el is None:
            return None
        return "".join(tt.text or "" for tt in is_el.iter(f"{{{_NS['m']}}}t"))
    v = cell.find("m:v", _NS)
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return "TRUE" if v.text.strip() == "1" else "FALSE"
    return v.text


def xlsx_rows(blob: bytes, sheet: str | int = 0) -> list[list[str | None]]:
    """All rows of one sheet as lists of (string | None), column-gapped to
    the max referenced column so positional access is stable."""
    with zipfile.ZipFile(BytesIO(blob)) as zf:
        part = _sheet_part(zf, sheet)
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(part))
        rows: list[list[str | None]] = []
        width = 0
        for row_el in root.findall("m:sheetData/m:row", _NS):
            row: list[str | None] = []
            last_ci = -1
            for cell in row_el.findall("m:c", _NS):
                ref = cell.get("r")
                if ref is None:
                    # `r` is optional per ECMA-376 §18.3.1.4 and some
                    # streaming writers omit it: a ref-less cell follows the
                    # previous cell positionally (NOT column A, which would
                    # clobber earlier cells in the row)
                    ci = last_ci + 1
                else:
                    ci = _col_index(ref)
                while len(row) <= ci:
                    row.append(None)
                row[ci] = _cell_value(cell, shared)
                last_ci = ci
            width = max(width, len(row))
            rows.append(row)
        for row in rows:
            while len(row) < width:
                row.append(None)
        return rows


def xlsx_dicts(
    blob: bytes, sheet: str | int = 0, has_header: bool = True
) -> list[dict[str, str | None]]:
    """Header-keyed rows (csv.DictReader semantics — the reference's data
    model): the first row names the columns; rows are {name: value}."""
    rows = xlsx_rows(blob, sheet)
    if not rows:
        return []
    if has_header:
        header = [("" if h is None else str(h)) for h in rows[0]]
        data = rows[1:]
    else:
        header = [f"col{i}" for i in range(len(rows[0]))]
        data = rows
    return [dict(zip(header, r)) for r in data]


def xlsx_header(blob: bytes, sheet: str | int = 0) -> list[str]:
    rows = xlsx_rows(blob, sheet)
    return [("" if h is None else str(h)) for h in (rows[0] if rows else [])]
