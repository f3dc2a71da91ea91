"""Minimal pure-stdlib .xlsx writer (SpreadsheetML / ECMA-376).

Closes O-24 (`etl_weekly_trades.py:214-217`, artifact
``output/top_clients.xlsx``) without openpyxl: an .xlsx file is a ZIP of
XML parts, and the reference's own artifact stores every cell as either a
number (``<c t="n"><v>…</v></c>``) or an inline string
(``<c t="inlineStr"><is><t>…</t></is></c>``) — the exact two shapes this
writer emits, so a reader sees the same cell values it would from the
pandas/openpyxl output.

Scope: one sheet, header row + data rows, numbers/strings/None (blank).
Driver-side by design — the export tail writes the tiny post-aggregation
report (≤ top_n × metrics rows), never distributed data.
"""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _col_letter(i: int) -> str:
    """0-based column index → A, B, …, Z, AA, AB, …"""
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell(col: int, row: int, value) -> str:
    ref = f"{_col_letter(col)}{row}"
    if value is None:
        return f'<c r="{ref}"/>'
    if isinstance(value, bool):  # before int: bool is an int subclass
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        if isinstance(value, float) and value != value:  # NaN → blank
            return f'<c r="{ref}"/>'
        return f'<c r="{ref}" t="n"><v>{value!r}</v></c>'
    # xml:space keeps leading/trailing whitespace through strict readers
    return (
        f'<c r="{ref}" t="inlineStr"><is>'
        f'<t xml:space="preserve">{escape(str(value))}</t></is></c>'
    )


def write_xlsx(path: str, header: list[str], rows: list[list]) -> None:
    """Write ``header`` + ``rows`` as sheet1 of a new .xlsx at ``path``."""
    body: list[str] = []
    body.append(
        "<row r=\"1\">" + "".join(_cell(c, 1, h) for c, h in enumerate(header)) + "</row>"
    )
    for ri, row in enumerate(rows, start=2):
        body.append(
            f'<row r="{ri}">' + "".join(_cell(c, ri, v) for c, v in enumerate(row)) + "</row>"
        )
    n_rows = len(rows) + 1
    n_cols = max(1, len(header))
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<dimension ref="A1:{_col_letter(n_cols - 1)}{n_rows}"/>'
        "<sheetData>" + "".join(body) + "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def read_xlsx_values(path: str) -> tuple[list[str], list[list]]:
    """Read back (header, rows) from sheet1 — the test/verification twin.
    Parses both this writer's output and openpyxl-style artifacts (the
    reference's ``top_clients.xlsx``): numbers, inline strings, blanks."""
    import re
    import xml.etree.ElementTree as ET

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    grid: dict[int, dict[int, object]] = {}
    for row in root.findall(".//m:sheetData/m:row", ns):
        for c in row.findall("m:c", ns):
            ref = c.attrib.get("r", "")
            m = re.match(r"([A-Z]+)(\d+)", ref)
            if not m:
                continue
            col = 0
            for ch in m.group(1):
                col = col * 26 + (ord(ch) - ord("A") + 1)
            col -= 1
            r = int(m.group(2))
            t = c.attrib.get("t", "n")
            if t == "inlineStr":
                tnode = c.find("m:is/m:t", ns)
                # empty <t/> parses with text=None: an inline string cell
                # is still a string — normalize to ""
                val: object = (tnode.text or "") if tnode is not None else ""
            else:
                v = c.find("m:v", ns)
                if v is None or v.text is None:
                    val = None
                else:
                    f = float(v.text)
                    val = int(f) if f.is_integer() else f
            grid.setdefault(r, {})[col] = val
    if not grid:
        return [], []
    n_cols = max(max(cols) for cols in grid.values()) + 1
    ordered = sorted(grid)
    header = [str(grid[ordered[0]].get(c, "")) for c in range(n_cols)]
    rows = [
        [grid[r].get(c) for c in range(n_cols)] for r in ordered[1:]
    ]
    return header, rows
