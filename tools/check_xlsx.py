#!/usr/bin/env python3
"""Independent xlsx cross-check (driver-side dev tool, stdlib only).

Two entry points, each a SEPARATE implementation of SpreadsheetML from the
Scala codec (`src/main/scala/graft/sources/Xlsx.scala`) so the pair can
cross-validate each other in a zero-egress sandbox with no Excel library:

  read  <file.xlsx>           dump every sheet as CSV to stdout
  write <file.xlsx>           write a fixture workbook exercising the parts
                              the Scala WRITER never emits (sharedStrings,
                              t="s" cells, sparse rows with r= gaps, a
                              formula cell with a cached <v>) — committed as
                              src/test/resources/interop_fixture.xlsx and
                              pinned by XlsxSpec as the independent-producer
                              contract.

No openpyxl/pandas-excel exists in this sandbox; zipfile + ElementTree are
the stdlib parts every Python ships.
"""
import sys
import zipfile
import xml.etree.ElementTree as ET

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def ref_col(ref):
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def read(path):
    z = zipfile.ZipFile(path)
    shared = []
    if "xl/sharedStrings.xml" in z.namelist():
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in root.findall(f"{NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{NS}t")))
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = {}
    if "xl/_rels/workbook.xml.rels" in z.namelist():
        rroot = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        for rel in rroot:
            t = rel.get("Target")
            rels[rel.get("Id")] = t.lstrip("/") if t.startswith("/") else "xl/" + t
    for i, sh in enumerate(wb.iter(f"{NS}sheet")):
        name = sh.get("name")
        part = rels.get(sh.get(f"{RNS}id"), f"xl/worksheets/sheet{i+1}.xml")
        print(f"== sheet: {name}")
        root = ET.fromstring(z.read(part))
        for row in root.iter(f"{NS}row"):
            cells, nxt = {}, 0
            for c in row.findall(f"{NS}c"):
                col = ref_col(c.get("r")) if c.get("r") else nxt
                nxt = col + 1
                t = c.get("t", "")
                if t == "inlineStr":
                    v = "".join(x.text or "" for x in c.iter(f"{NS}t"))
                elif t == "s":
                    v = shared[int(c.findtext(f"{NS}v"))]
                else:
                    v = c.findtext(f"{NS}v")
                cells[col] = "" if v is None else v
            width = max(cells) + 1 if cells else 0
            print(",".join(str(cells.get(i, "")) for i in range(width)))


def write(path):
    def part(z, name, body):
        z.writestr(name, '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>' + body)

    z = zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED)
    ct = (
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/worksheets/sheet3.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        "</Types>"
    )
    part(z, "[Content_Types].xml", ct)
    part(
        z, "_rels/.rels",
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>",
    )
    part(
        z, "xl/workbook.xml",
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>'
        '<sheet name="metrics" sheetId="1" r:id="rId1"/>'
        '<sheet name="notes &amp; caveats" sheetId="2" r:id="rId2"/>'
        '<sheet name="dates" sheetId="3" r:id="rId3"/>'
        "</sheets></workbook>",
    )
    part(
        z, "xl/_rels/workbook.xml.rels",
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>'
        '<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet3.xml"/>'
        "</Relationships>",
    )
    # styles: xf 0 = general, xf 1 = builtin date (14), xf 2 = custom datetime
    part(
        z, "xl/styles.xml",
        '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd hh:mm:ss"/></numFmts>'
        '<cellXfs count="3">'
        '<xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>'
        '<xf numFmtId="14" fontId="0" fillId="0" borderId="0" applyNumberFormat="1"/>'
        '<xf numFmtId="164" fontId="0" fillId="0" borderId="0" applyNumberFormat="1"/>'
        "</cellXfs></styleSheet>",
    )
    # shared strings: the indirection the Scala writer never emits
    part(
        z, "xl/sharedStrings.xml",
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">'
        "<si><t>region</t></si><si><t>revenue</t></si><si><t>ok</t></si>"
        "<si><r><t>eu-</t></r><r><t>west</t></r></si>"  # rich-text runs
        "</sst>",
    )
    # sheet1: shared-string header, numeric body, a sparse row (B missing),
    # a boolean, and a formula cell with cached value
    part(
        z, "xl/worksheets/sheet1.xml",
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c><c r="E1" t="inlineStr"><is><t>extra</t></is></c></row>'
        '<row r="2"><c r="A2" t="s"><v>3</v></c><c r="B2"><v>12.5</v></c><c r="C2" t="b"><v>1</v></c></row>'
        '<row r="3"><c r="A3" t="inlineStr"><is><t>ap-south</t></is></c><c r="C3" t="b"><v>0</v></c></row>'
        '<row r="4"><c r="A4" t="str"><v>computed</v></c><c r="B4"><f>SUM(B2:B3)</f><v>12.5</v></c><c r="C4" t="b"><v>1</v></c></row>'
        '<row r="5"><c r="A5" t="inlineStr"><is><t>errored</t></is></c><c r="B5" t="e"><v>#DIV/0!</v></c><c r="C5" t="b"><v>0</v></c></row>'
        "</sheetData></worksheet>",
    )
    # sheet3: Excel-native date serials — styled numeric cells (builtin
    # date format 14 and a custom datetime format), plus an UNstyled
    # numeric that must stay a number. Serials computed for the 1900
    # system: 46249 = 2026-08-15, 36525 = 1999-12-31, .4375 = 10:30:00.
    part(
        z, "xl/worksheets/sheet3.xml",
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>day</t></is></c><c r="B1" t="inlineStr"><is><t>at</t></is></c><c r="C1" t="inlineStr"><is><t>serial</t></is></c></row>'
        '<row r="2"><c r="A2" s="1"><v>46249</v></c><c r="B2" s="2"><v>46249.4375</v></c><c r="C2"><v>46249</v></c></row>'
        '<row r="3"><c r="A3" s="1"><v>36525</v></c><c r="B3" s="2"><v>36525</v></c><c r="C3"><v>36525</v></c></row>'
        "</sheetData></worksheet>",
    )
    # sheet2: minimal inline sheet, no r= attributes at all
    part(
        z, "xl/worksheets/sheet2.xml",
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        "<row><c t=\"inlineStr\"><is><t>note</t></is></c></row>"
        "<row><c t=\"inlineStr\"><is><t>7 &lt; 9 &amp; &quot;q&quot;</t></is></c></row>"
        "</sheetData></worksheet>",
    )
    z.close()
    print(f"wrote {path}")


if __name__ == "__main__":
    if len(sys.argv) != 3 or sys.argv[1] not in ("read", "write"):
        sys.exit(__doc__)
    (read if sys.argv[1] == "read" else write)(sys.argv[2])
