"""S2/S5/S7 format readers — stdlib zip+XML decodes, no engine deps
(reference paths: pd.read_excel @ llm_processing/routes.py:1202-1215,
python-docx paragraphs @ input_processing/routes.py:504-510,
read_preprocessed_csv_from_zip @ llm_processing/utils.py:247-263)."""

from __future__ import annotations

import zipfile

SST = (
    '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    "<si><t>id</t></si><si><t>report</t></si>"
    "<si><t>r1</t></si><si><t>hello world</t></si></sst>"
)
SHEET = (
    '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    "<sheetData>"
    '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
    '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" t="s"><v>3</v></c></row>'
    '<row r="3"><c r="A3"><v>7</v></c>'
    '<c r="B3" t="inlineStr"><is><t>inline text</t></is></c></row>'
    "</sheetData></worksheet>"
)
DOCX_XML = (
    '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
    "<w:body>"
    "<w:p><w:r><w:t>First paragraph </w:t></w:r><w:r><w:t>with two runs.</w:t></w:r></w:p>"
    "<w:p><w:r><w:t>Second paragraph.</w:t></w:r></w:p>"
    "</w:body></w:document>"
)


def _write_xlsx(path):
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/sharedStrings.xml", SST)
        zf.writestr("xl/worksheets/sheet1.xml", SHEET)


def test_read_reports_excel_stdlib_path(spark, tmp_path):
    from llmaix_spark.sources.readers import read_reports_excel

    p = tmp_path / "reports.xlsx"
    _write_xlsx(p)
    rows = {r["report"]: r["id"] for r in read_reports_excel(spark, str(p)).collect()}
    assert set(rows) == {"hello world", "inline text"}
    assert rows["hello world"].startswith("r1$")
    assert rows["inline text"].startswith("7$")  # numeric cell → string


def test_parse_xlsx_sparse_row_alignment(tmp_path):
    """A row whose first cell is missing must still place values by their
    A1 reference, not by position."""
    from llmaix_spark.sources.readers import _parse_xlsx_rows

    sheet = (
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<sheetData><row r="1"><c r="B1" t="inlineStr"><is><t>only-b</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    p = tmp_path / "sparse.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    assert _parse_xlsx_rows(p.read_bytes()) == [["", "only-b"]]


def test_read_reports_zip(spark, tmp_path):
    from llmaix_spark.sources.readers import read_reports_zip

    z = tmp_path / "job1.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("decoy.csv", "id,report\nX,should not be read\n")
        zf.writestr(
            "preprocessed_job1.csv", "id,report\na1,first report\na2,second\n"
        )
    # a malformed archive in the same directory must not kill the job
    (tmp_path / "bad.zip").write_bytes(b"not a zip at all")
    df = read_reports_zip(spark, str(tmp_path))
    rows = sorted(r["report"] for r in df.collect())
    assert rows == ["first report", "second"]
    ids = [r["id"] for r in df.collect()]
    assert all("$" in i for i in ids)


def test_read_reports_zip_empty_cells_stay_strings(spark, tmp_path):
    """Missing CSV cells arrive as pandas NaN even under dtype=str; they
    must surface as empty strings, not 'nan' or a broken Arrow batch."""
    from llmaix_spark.sources.readers import read_reports_zip

    z = tmp_path / "holes.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("preprocessed_h.csv", "id,report\n,orphan report\nb1,\n")
    rows = read_reports_zip(spark, str(tmp_path)).collect()
    assert len(rows) == 2
    by_report = {r["report"]: r for r in rows}
    assert set(by_report) == {"orphan report", ""}
    assert "nan" not in {r["id"].split("$")[0] for r in rows}


def test_read_reports_zip_skips_zip_without_member(spark, tmp_path):
    from llmaix_spark.sources.readers import read_reports_zip

    z = tmp_path / "no_csv.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("readme.txt", "nothing here")
    assert read_reports_zip(spark, str(tmp_path)).count() == 0


def test_read_reports_docx(spark, tmp_path):
    from llmaix_spark.sources.readers import read_reports_docx

    d = tmp_path / "doc1.docx"
    with zipfile.ZipFile(d, "w") as zf:
        zf.writestr("word/document.xml", DOCX_XML)
    rows = read_reports_docx(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    # paragraphs joined with \n, runs concatenated (reference semantics)
    assert rows[0]["report"] == "First paragraph with two runs.\nSecond paragraph."
    assert rows[0]["id"].startswith("doc1.docx$")
    assert '"source":"docx"' in rows[0]["metadata"].replace('": "', '":"')


def test_read_reports_excel_many(spark, tmp_path):
    """Distributed many-workbook variant: executor-side decode, bad
    workbooks skipped."""
    from llmaix_spark.sources.readers import read_reports_excel_many

    _write_xlsx(tmp_path / "a.xlsx")
    _write_xlsx(tmp_path / "b.xlsx")
    (tmp_path / "bad.xlsx").write_bytes(b"nope")
    df = read_reports_excel_many(spark, str(tmp_path))
    rows = sorted(r["report"] for r in df.collect())
    assert rows == ["hello world", "hello world", "inline text", "inline text"]


def test_read_reports_csv_multiline_quoted_field(spark, tmp_path):
    """Quoted report values with embedded newlines (the reason
    whitespace_scrub_expr exists) must parse as ONE row."""
    from llmaix_spark.sources.readers import read_reports_csv

    p = tmp_path / "r.csv"
    p.write_text('id,report\nr1,"line one\nline two"\nr2,plain\n')
    rows = {r["report"] for r in read_reports_csv(spark, str(p)).collect()}
    # ONE row, newline then REMOVED by the P7 scrub (reference deletes
    # \t\n\r outright, input_processing/routes.py:678-679)
    assert rows == {"line oneline two", "plain"}


def test_read_reports_zip_bad_member_survives(spark, tmp_path):
    """A structurally valid zip whose preprocessed_*.csv member is empty
    must yield zero rows, not a pandas parse error that kills the job."""
    from llmaix_spark.sources.readers import read_reports_zip

    z = tmp_path / "empty_member.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("preprocessed_e.csv", "")
    ok = tmp_path / "good.zip"
    with zipfile.ZipFile(ok, "w") as zf:
        zf.writestr("preprocessed_g.csv", "id,report\na,fine\n")
    rows = read_reports_zip(spark, str(tmp_path)).collect()
    assert [r["report"] for r in rows] == ["fine"]


def test_parse_xlsx_cells_without_ref_attribute(tmp_path):
    """Cells lacking the optional r= attribute are positioned
    sequentially, not collapsed onto column 0."""
    from llmaix_spark.sources.readers import _parse_xlsx_rows

    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        "<row><c t=\"inlineStr\"><is><t>id</t></is></c>"
        "<c t=\"inlineStr\"><is><t>report</t></is></c></row>"
        "<row><c t=\"inlineStr\"><is><t>a1</t></is></c>"
        "<c t=\"inlineStr\"><is><t>hello</t></is></c></row>"
        "</sheetData></worksheet>"
    )
    p = tmp_path / "noref.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    assert _parse_xlsx_rows(p.read_bytes()) == [["id", "report"], ["a1", "hello"]]
