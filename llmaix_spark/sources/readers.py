"""Input connectors (SURVEY §2.1 S1/S4/S6/S8/S10).

The reference ingests CSV/XLSX/PDF/TXT/DOCX through per-file pandas reads
inside a thread pool (webapp/input_processing/routes.py:380-591). Here
every source is a Spark reader returning the canonical envelope
`(id, report, metadata)` — schema-on-read, splittable, parallel by file
block rather than by file.

PDF-OCR (S3) and DOCX (S5) need codec libraries this container lacks;
their Spark-side shape is the binaryFile source + a mapInPandas decode —
exactly operators/multimodal.decode_media, which stands in for both.
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
    webapp/labelannotation/routes.py:747)."""
    raw = spark.read.csv(path, header=True, inferSchema=False)
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


def read_reports_excel(
    spark: SparkSession, path: str, id_col: str = "id", report_col: str = "report"
) -> DataFrame:
    """S2: XLSX with (id, report) columns → envelope. Excel is a
    driver-side decode (never splittable anyway) via pandas; the engine
    (openpyxl) is absent in this container, so the read is gated — the
    Spark-side envelope/id/metadata path is identical to the CSV source.
    """
    import pandas as pd

    try:
        pdf = pd.read_excel(path, dtype=str)
    except ImportError as e:  # no openpyxl/xlrd in this environment
        raise NotImplementedError(
            "Excel decode requires openpyxl (not installed); "
            "convert to CSV or install the engine"
        ) from e
    raw = spark.createDataFrame(pdf[[id_col, report_col]])
    out = raw.select(
        F.col(id_col).cast("string").alias("orig_id"),
        whitespace_scrub_expr(F.col(report_col)).alias("report"),
    ).withColumn("id", gen_id_expr(F.col("orig_id"), F.col("report")))
    return _stamp(out.select("id", "report"), "excel", F.lit(path))


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
