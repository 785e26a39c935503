"""Input connectors (SURVEY §2.1 S1/S2/S4/S5/S6/S7/S8/S10).

The reference ingests CSV/XLSX/PDF/TXT/DOCX/zip through per-file pandas
reads inside a thread pool (webapp/input_processing/routes.py:380-591).
Here every source is a Spark reader returning the canonical envelope
`(id, report, metadata)` — splittable text formats parallelize by file
block; whole-file formats (xlsx/docx/zip) go through the binaryFile
source + Arrow-batched mapInPandas, one file per row, decoded
executor-side with stdlib zipfile+ElementTree (no engine deps).

PDF-OCR (S3) needs codec libraries this container lacks; its Spark-side
shape is the same binaryFile + mapInPandas pattern —
operators/multimodal.decode_media carries it with a stubbed codec.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from llmaix_spark.functions.text import gen_id_expr, whitespace_scrub_expr

ENVELOPE = ("id", "report", "metadata")


def _stamp(df: DataFrame, source: str, file_expr=None) -> DataFrame:
    """Attach the preprocessing-metadata column (reference
    webapp/input_processing/routes.py:656-658, deterministic here)."""
    meta = F.to_json(
        F.struct(
            F.struct(
                F.lit(source).alias("source"),
                (file_expr if file_expr is not None else F.input_file_name()).alias("file"),
            ).alias("preprocessing")
        )
    )
    return df.withColumn("metadata", meta)


def read_reports_csv(
    spark: SparkSession, path: str, id_col: str = "id", report_col: str = "report"
) -> DataFrame:
    """S1: CSV with (id, report) columns → envelope. Header required,
    values kept as strings (the reference reads dtype=str,
    webapp/labelannotation/routes.py:747). multiLine=True because report
    values routinely contain embedded newlines inside quotes (that is why
    whitespace_scrub_expr exists) — pandas handles those, Spark's default
    line-split mode would shear such rows into garbage. Cost: a multiLine
    CSV file is not block-splittable; parallelism comes from the file
    count, same as the reference's per-file reads."""
    raw = spark.read.csv(
        path, header=True, inferSchema=False, multiLine=True, escape='"'
    )
    out = raw.select(
        F.col(id_col).cast("string").alias("orig_id"),
        whitespace_scrub_expr(F.col(report_col)).alias("report"),
    ).withColumn("id", gen_id_expr(F.col("orig_id"), F.col("report")))
    return _stamp(out.select("id", "report"), "csv")


def read_reports_txt(spark: SparkSession, path: str) -> DataFrame:
    """S4: whole text file = one report
    (reference webapp/input_processing/routes.py:497-502)."""
    raw = spark.read.text(path, wholetext=True)
    named = raw.select(
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("orig_id"),
        F.col("value").alias("report"),
    )
    out = named.withColumn("id", gen_id_expr(F.col("orig_id"), F.col("report")))
    return _stamp(out.select("id", "report"), "txt")


def read_malformed_csv(spark: SparkSession, path: str) -> DataFrame:
    """S6: 'strange CSV' repair — one physical line = one record, the
    FIRST line of each file dropped (header), no quoting honored
    (reference webapp/llm_processing/read_strange_csv.py:4-30).

    Reads wholetext per file + posexplode over the line split: header
    semantics are file-scoped (one header per file, not one global
    first line), and dropping by line *content* would also drop body
    lines that happen to equal the header text. Whole-file reads give up
    intra-file split parallelism — correct here: strange CSVs are small
    uploads and parallelism comes from the file count. Ids are salted
    with (file, line_idx) so duplicate body lines stay distinct rows."""
    raw = spark.read.text(path, wholetext=True)
    arr = F.split("value", "\r?\n")
    # a trailing newline yields a final "" element that Python's line
    # iteration (the reference) never produces — drop it; keep interior
    # empty lines (the reference keeps them as empty records)
    arr = F.when(
        (F.size(arr) > 0) & (F.element_at(arr, -1) == ""),
        F.slice(arr, F.lit(1), F.size(arr) - 1),
    ).otherwise(arr)
    lines = raw.select(
        F.element_at(F.split(F.input_file_name(), "/"), -1).alias("_file"),
        F.posexplode(arr).alias("_idx", "line"),
    )
    body = lines.filter(F.col("_idx") > 0)
    out = body.select(
        "_file",
        whitespace_scrub_expr(F.trim(F.col("line"))).alias("report"),
        F.col("_idx"),
    ).withColumn(
        "id",
        gen_id_expr(
            F.lit("row"),
            F.concat_ws(
                "\x00", "_file", F.col("_idx").cast("string"), "report"
            ),
        ),
    )
    stamped = _stamp(out, "malformed_csv", F.col("_file"))
    return stamped.select("id", "report", "metadata")


def _parse_xlsx_rows(payload: bytes) -> list[list[str]]:
    """Minimal stdlib XLSX decode (zip + SpreadsheetML): first worksheet,
    shared strings + inline strings + raw values, cells placed by their
    A1-style reference so sparse rows stay aligned. Enough for the
    reference's (id, report) sheets; swap in openpyxl for exotic files."""
    import io
    import re
    import zipfile
    import xml.etree.ElementTree as ET

    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{NS}t")))
        sheet_name = next(
            n for n in sorted(zf.namelist())
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        root = ET.fromstring(zf.read(sheet_name))
        rows: list[list[str]] = []
        for row in root.iter(f"{NS}row"):
            cells: dict[int, str] = {}
            next_col = 0  # cells without r= are positioned sequentially
            for c in row.findall(f"{NS}c"):
                ref = c.get("r", "")
                col = 0
                has_ref = any(ch.isalpha() for ch in ref)
                for ch in ref:
                    if ch.isalpha():
                        col = col * 26 + (ord(ch.upper()) - 64)
                # the r= attribute is optional in SpreadsheetML — without
                # it the cell follows its predecessor (collapsing all
                # unreferenced cells onto column 0 would shear the row)
                col = col - 1 if has_ref else next_col
                next_col = col + 1
                ctype = c.get("t", "n")
                if ctype == "s":
                    v = c.find(f"{NS}v")
                    text = shared[int(v.text)] if v is not None else ""
                elif ctype == "inlineStr":
                    text = "".join(
                        t.text or "" for t in c.iter(f"{NS}t")
                    )
                else:
                    v = c.find(f"{NS}v")
                    text = v.text if v is not None and v.text else ""
                cells[col] = text
            width = max(cells) + 1 if cells else 0
            rows.append([cells.get(i, "") for i in range(width)])
    return rows


def read_reports_excel(
    spark: SparkSession, path: str, id_col: str = "id", report_col: str = "report"
) -> DataFrame:
    """S2: XLSX with (id, report) columns → envelope. Excel is a
    driver-side decode (never splittable anyway): pandas/openpyxl when
    available, else the stdlib zip+XML parser above — this container has
    no engine, so the stdlib path is the tested one. The Spark-side
    envelope/id/metadata path is identical to the CSV source
    (reference reads pd.read_excel(dtype=str),
    webapp/llm_processing/routes.py:1202-1215)."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path, dtype=str)
        header = list(pdf.columns)
        data = pdf.fillna("").astype(str).values.tolist()
    except Exception:  # no engine (openpyxl/xlrd) in this container
        with open(path, "rb") as f:
            rows = _parse_xlsx_rows(f.read())
        if not rows:
            raise ValueError(f"empty or unreadable xlsx: {path}")
        header, data = rows[0], rows[1:]
    i_id, i_rep = header.index(id_col), header.index(report_col)
    raw = spark.createDataFrame(
        [(r[i_id] if i_id < len(r) else "",
          r[i_rep] if i_rep < len(r) else "") for r in data],
        f"{id_col} string, {report_col} string",
    )
    out = raw.select(
        F.col(id_col).cast("string").alias("orig_id"),
        whitespace_scrub_expr(F.col(report_col)).alias("report"),
    ).withColumn("id", gen_id_expr(F.col("orig_id"), F.col("report")))
    return _stamp(out.select("id", "report"), "excel", F.lit(path))


def read_reports_zip(spark: SparkSession, path: str) -> DataFrame:
    """S7: zip-embedded preprocessed CSV — each zip's first member
    matching `preprocessed_*.csv` is the table (reference
    read_preprocessed_csv_from_zip, webapp/llm_processing/utils.py:247-263).

    Distributed: binaryFile source (one row per zip, whole archives are
    not splittable) → Arrow-batched mapInPandas unzips and parses member
    CSVs executor-side — a directory of thousands of zips fans out one
    per task, no driver involvement."""
    import io
    import zipfile
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("zip_path", T.StringType()),
            T.StructField("orig_id", T.StringType()),
            T.StructField("report", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"zip_path": [], "orig_id": [], "report": []}
            for zpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    zf = zipfile.ZipFile(io.BytesIO(content))
                except zipfile.BadZipFile:
                    continue  # malformed archive → zero rows, job survives
                member = next(
                    (
                        fi.filename
                        for fi in zf.infolist()
                        if fi.filename.startswith("preprocessed_")
                        and fi.filename.endswith(".csv")
                    ),
                    None,
                )
                if member is None:
                    continue
                try:
                    with zf.open(member) as f:
                        # dtype=str still yields float NaN for empty cells —
                        # fillna before they can poison the Arrow string batch
                        mdf = pd.read_csv(f, dtype=str).fillna("")
                except Exception:
                    # empty/truncated/encrypted member → zero rows, job
                    # survives (same policy as the BadZipFile branch)
                    continue
                n = len(mdf)
                rows["zip_path"].extend([zpath] * n)
                rows["orig_id"].extend(
                    mdf["id"].tolist() if "id" in mdf.columns else [""] * n
                )
                rows["report"].extend(
                    mdf["report"].tolist() if "report" in mdf.columns else [""] * n
                )
            yield pd.DataFrame(rows)

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .load(path)
        .select("path", "content")
    )
    parsed = raw.mapInPandas(run, out_schema)
    out = parsed.select(
        F.col("zip_path"),
        F.col("orig_id"),
        whitespace_scrub_expr(F.col("report")).alias("report"),
    ).withColumn("id", gen_id_expr(F.col("orig_id"), F.col("report")))
    return _stamp(out, "zip", F.col("zip_path")).select(
        "id", "report", "metadata"
    )


def read_reports_docx(spark: SparkSession, path: str) -> DataFrame:
    """S5: DOCX → one report per file, paragraphs joined with newlines
    (reference `'\\n'.join(p.text for p in Document(file).paragraphs)`,
    webapp/input_processing/routes.py:504-510). DOCX is a zip of
    WordprocessingML — decoded with stdlib zipfile+ElementTree inside an
    Arrow-batched mapInPandas over the binaryFile source, so a corpus of
    documents decodes executor-side, one file per row."""
    import io
    import zipfile
    import xml.etree.ElementTree as ET
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
    out_schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("report", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            files, reports = [], []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    with zipfile.ZipFile(io.BytesIO(content)) as zf:
                        root = ET.fromstring(zf.read("word/document.xml"))
                except (zipfile.BadZipFile, KeyError, ET.ParseError):
                    continue
                paragraphs = [
                    "".join(t.text or "" for t in p.iter(f"{W}t"))
                    for p in root.iter(f"{W}p")
                ]
                files.append(fpath.rsplit("/", 1)[-1])
                reports.append("\n".join(paragraphs))
            yield pd.DataFrame({"file": files, "report": reports})

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.docx")
        .load(path)
        .select("path", "content")
    )
    parsed = raw.mapInPandas(run, out_schema)
    out = parsed.withColumn(
        "id", gen_id_expr(F.col("file"), F.col("report"))
    )
    return _stamp(out, "docx", F.col("file")).select("id", "report", "metadata")


def read_annotations(
    spark: SparkSession, path: str
) -> DataFrame:
    """S8-adjacent: ground-truth annotation CSV, all columns as strings
    (reference webapp/labelannotation/routes.py:747-753), column names
    normalized spaces→underscores (P10, :631-632)."""
    raw = spark.read.csv(path, header=True, inferSchema=False)
    cleaned = [c.strip().replace(" ", "_") for c in raw.columns]
    return raw.toDF(*cleaned)


def load_job_config(path: str) -> dict:
    """S10: job config — YAML in the reference (app.py:47-54); JSON here
    to stay inside the stdlib. Shipped to executors via --py-files /
    broadcast, never read per-task."""
    with open(path) as f:
        return json.load(f)


def read_reports_excel_many(
    spark: SparkSession,
    path: str,
    id_col: str = "id",
    report_col: str = "report",
) -> DataFrame:
    """S2 at scale: a DIRECTORY of xlsx files, decoded executor-side.

    The single-file reader above decodes on the driver (one workbook is
    never splittable); a 100 TB ingest arrives as MANY workbooks, so this
    variant reads them through the binaryFile source and runs the same
    stdlib SpreadsheetML parser inside an Arrow-batched mapInPandas — one
    file per row, parallel across executors, no driver involvement and no
    engine dependency. Unreadable workbooks yield zero rows (job
    survives); ids are the sheet's id column salted with the report."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("orig_id", T.StringType()),
            T.StructField("report", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"file": [], "orig_id": [], "report": []}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    rows = _parse_xlsx_rows(bytes(content))
                except Exception:  # bad zip / missing sheet / bad xml
                    continue
                if not rows:
                    continue
                header, data = rows[0], rows[1:]
                if id_col not in header or report_col not in header:
                    continue
                i_id, i_rep = header.index(id_col), header.index(report_col)
                for r in data:
                    out["file"].append(fpath.rsplit("/", 1)[-1])
                    out["orig_id"].append(r[i_id] if i_id < len(r) else "")
                    out["report"].append(r[i_rep] if i_rep < len(r) else "")
            yield pd.DataFrame(out)

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xlsx")
        .load(path)
        .select("path", "content")
    )
    parsed = raw.mapInPandas(run, out_schema)
    out = parsed.select(
        "file",
        "orig_id",
        whitespace_scrub_expr(F.col("report")).alias("report"),
    ).withColumn("id", gen_id_expr(F.col("orig_id"), F.col("report")))
    return _stamp(out, "excel", F.col("file")).select("id", "report", "metadata")
