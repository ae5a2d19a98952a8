"""Minimal stdlib .xlsx reader (zip + XML) — enough to load the reference's
config workbooks without openpyxl (not available in this container).

Supports shared strings, inline strings, and numeric/boolean cells; ignores
styles/formats. Returns rows as lists of Python values (str/float/bool/None).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
       "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships"}

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'→0, 'B'→1, ..., 'AA'→26."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def read_workbook(path: str) -> dict[str, list[list]]:
    """Load every sheet: {sheet_name: rows}, each row a list of cell values
    (None for blanks), width-normalized to the widest row."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_map = {
            rel.get("Id"): rel.get("Target").lstrip("/")
            for rel in rels
        }
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss.findall("m:si", _NS):
                shared.append("".join(t.text or "" for t in si.iter(
                    "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t")))
        out: dict[str, list[list]] = {}
        for sheet in wb.find("m:sheets", _NS):
            name = sheet.get("name")
            rid = sheet.get(f"{{{_NS['r']}}}id")
            target = rel_map[rid]
            if not target.startswith("xl/"):
                target = "xl/" + target
            root = ET.fromstring(z.read(target))
            rows: list[list] = []
            for row_el in root.iter(
                    "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}row"):
                cells: dict[int, object] = {}
                for c in row_el:
                    ref = c.get("r") or ""
                    m = _CELL_REF.match(ref)
                    idx = _col_index(m.group(1)) if m else len(cells)
                    ctype = c.get("t", "n")
                    v_el = c.find("m:v", _NS)
                    is_el = c.find("m:is", _NS)
                    if is_el is not None:  # inline string
                        val: object = "".join(t.text or "" for t in is_el.iter(
                            "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}t"))
                    elif v_el is None or v_el.text is None:
                        val = None
                    elif ctype == "s":
                        val = shared[int(v_el.text)]
                    elif ctype == "b":
                        val = v_el.text == "1"
                    elif ctype == "str":
                        val = v_el.text
                    else:
                        f = float(v_el.text)
                        val = int(f) if f.is_integer() else f
                    cells[idx] = val
                width = max(cells) + 1 if cells else 0
                rows.append([cells.get(i) for i in range(width)])
            width = max((len(r) for r in rows), default=0)
            out[name] = [r + [None] * (width - len(r)) for r in rows]
    return out


def sheet_records(rows: list[list]) -> list[dict]:
    """First row = header; later rows → dicts keyed by header (None-named
    columns dropped), fully-blank rows skipped."""
    if not rows:
        return []
    header = [str(h).strip() if h is not None else None for h in rows[0]]
    recs = []
    for row in rows[1:]:
        if all(v is None or (isinstance(v, str) and not v.strip()) for v in row):
            continue
        recs.append({h: row[i] if i < len(row) else None
                     for i, h in enumerate(header) if h})
    return recs
