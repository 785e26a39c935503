"""Inception/UIMA CAS annotation source (reference
InceptionAnnotationParser, webapp/report_redaction/utils.py:33-134).

The reference walks a dkpro CAS object on the driver: every `custom.Span`
with a non-null label becomes an annotation; for each PdfChunk that
overlaps the span it computes a bounding box from the chunk's per-char
x-positions (`g.elements`), and the page number from the PdfPage whose
char range overlaps the chunk (the LAST matching page wins — the
reference loop overwrites).

Spark recast: one CAS document = one JSON value in a column (exported by
Inception's JSON serializer or a thin driver-side cassis→JSON shim —
cassis itself is not in this container). Parsing is from_json + higher-
order functions, so a million CAS docs parse as one narrow pass:

    parse_cas_json   cas_json → span rows (label, begin, end) with one
                     row per overlapping chunk carrying the bbox
                     (page_number, x0, y0, x1, y1); spans without any
                     overlapping chunk keep one row with NULL bbox.

The span rows feed the existing span data model: classwise_dollartext →
per-label redaction scores (operators/redaction.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CAS_JSON_SCHEMA = (
    "struct<"
    "sofa_string: string,"
    " spans: array<struct<label: string, begin: int, end: int>>,"
    " chunks: array<struct<begin: int, end: int, y: double, h: double,"
    " g: array<double>>>,"
    " pages: array<struct<begin: int, end: int, pageNumber: int,"
    " width: double, height: double>>"
    ">"
)


def parse_cas_json(
    df: DataFrame, json_col: str = "cas_json", id_col: str = "doc_id"
) -> DataFrame:
    """(id, cas_json) → span/bbox rows:
    (id, label, begin, end, page_number, x0, y0, x1, y1).

    Index math mirrors the reference exactly
    (webapp/report_redaction/utils.py:95-128):
      start_index = max(span.begin - chunk.begin, 0)
      end_index   = min(span.end - chunk.begin, len(chunk.g) - 1)
      bbox        = (page, (g[start_index], y, g[end_index], y + h))
    Unlabeled spans are skipped (reference :74-78); the page is the LAST
    PdfPage overlapping the chunk (reference :113-116 overwrites).
    """
    cas = F.from_json(F.col(json_col), CAS_JSON_SCHEMA)
    base = df.select(
        F.col(id_col),
        cas["spans"].alias("_spans"),
        cas["chunks"].alias("_chunks"),
        cas["pages"].alias("_pages"),
    )
    spans = base.select(
        id_col,
        F.explode("_spans").alias("span"),
        "_chunks",
        "_pages",
    ).filter(F.col("span.label").isNotNull())

    # keep only chunks overlapping the span, BEFORE exploding — a span
    # with no overlap keeps one NULL-chunk row (explode_outer)
    overlapping = F.filter(
        "_chunks",
        lambda c: (F.col("span.begin") <= c["end"])
        & (F.col("span.end") >= c["begin"]),
    )
    rows = spans.select(
        id_col,
        F.col("span.label").alias("label"),
        F.col("span.begin").alias("begin"),
        F.col("span.end").alias("end"),
        "_pages",
        F.explode_outer(overlapping).alias("chunk"),
    )

    # indices clamped into [0, size-1] (the reference clamps begin to 0
    # and end to len(g)-1, utils.py:118-121); a malformed chunk with an
    # EMPTY g array yields NULL x0/x1 instead of element_at(..., 0),
    # which throws and would kill the whole job on one bad document
    g_size = F.size("chunk.g")
    start_idx = F.least(
        F.greatest(F.col("begin") - F.col("chunk.begin"), F.lit(0)),
        g_size - 1,
    )
    end_idx = F.least(
        F.greatest(F.col("end") - F.col("chunk.begin"), F.lit(0)),
        g_size - 1,
    )
    page_matches = F.filter(
        "_pages",
        lambda p: (p["begin"] <= F.col("chunk.end"))
        & (p["end"] >= F.col("chunk.begin")),
    )
    # try_element_at: a chunk overlapping NO page (malformed/missing page
    # table) yields NULL page_number — plain element_at(-1) on an empty
    # array throws under ANSI mode and would kill the job
    last_page = F.try_element_at(page_matches, F.lit(-1))["pageNumber"]
    has_g = F.col("chunk").isNotNull() & (g_size > 0)

    return rows.select(
        id_col,
        "label",
        "begin",
        "end",
        F.when(F.col("chunk").isNotNull(), last_page).alias("page_number"),
        F.when(has_g, F.element_at(F.col("chunk.g"), start_idx + 1)).alias("x0"),
        F.col("chunk.y").alias("y0"),
        F.when(has_g, F.element_at(F.col("chunk.g"), end_idx + 1)).alias("x1"),
        (F.col("chunk.y") + F.col("chunk.h")).alias("y1"),
    )


def cas_sofa_strings(
    df: DataFrame, json_col: str = "cas_json", id_col: str = "doc_id"
) -> DataFrame:
    """(id, cas_json) → (id, sofa_string): the annotated document text
    (reference get_sofastring, utils.py:43-51) — the `docs` side of
    classwise_dollartext."""
    cas = F.from_json(F.col(json_col), CAS_JSON_SCHEMA)
    return df.select(F.col(id_col), cas["sofa_string"].alias("text"))
