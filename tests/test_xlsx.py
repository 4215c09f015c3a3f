"""Dependency-free xlsx artifact writer: structural validation (no xlsx
reader wheel exists in this env; the format is zip+XML, so validate parts
and cell contents directly)."""

import xml.etree.ElementTree as ET
import zipfile


def test_write_xlsx_roundtrip(tmp_path):
    from vlrlhf_tpu.eval.xlsx import write_xlsx

    rows = [
        {"index": 0, "question": "is there a dog?", "response": "yes & <b>",
         "score": 0.85, "hit": True},
        {"index": 1, "question": "cat?", "response": None, "score": 0},
    ]
    path = tmp_path / "results.xlsx"
    write_xlsx(str(path), rows)
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert {"[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
                "xl/worksheets/sheet1.xml"} <= names
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    root = ET.fromstring(sheet)
    rows_xml = root.findall(".//m:row", ns)
    assert len(rows_xml) == 3  # header + 2 data rows
    header = [c.findtext(".//m:t", namespaces=ns)
              for c in rows_xml[0].findall("m:c", ns)]
    assert header == ["index", "question", "response", "score", "hit"]
    # escaped inline string survives
    r0 = rows_xml[1].findall("m:c", ns)
    assert r0[2].findtext(".//m:t", namespaces=ns) == "yes & <b>"
    assert r0[3].findtext("m:v", namespaces=ns) == "0.85"
    assert r0[4].get("t") == "b"
    # missing value -> empty cell
    r1 = rows_xml[2].findall("m:c", ns)
    assert r1[2].get("t") != "inlineStr" or not list(r1[2])
