"""Anonymizer mode — the reference's second flagship flow.

Reference (webapp/llm_processing/routes.py:1060-1092): per-chunk LLM
outputs are grouped by base_id, every extracted column becomes a list,
all lists concat into `personal_info_list` (A2), and the reassembled
report is masked with its own list (F4) — each document masked with ITS
OWN PII, the historical regression the tests pin
(webapp/llm_processing/tests/test_anonymizer_postprocess.py:18-48).

Spark recast: one narrow detection pass (pandas UDF or expr), one
groupBy(conv_id) producing conv_text + flattened PII list in the same
aggregation, one masking UDF. No second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from llmaix_spark.functions.masking import masked_col

# PII detector mirroring the stub extraction grammar: capitalized
# multi-word surfaces (the entity mentions the extractor sees).
# NB: Java regex \w is ASCII-only (unlike Python's) — umlauts must be
# in the class explicitly or surfaces truncate at the first 'ü'.
_WCH = r"A-Za-z0-9_äöüßÄÖÜ\-"
_PII_PATTERN = rf"[A-ZÄÖÜ][{_WCH}]*(?: [A-ZÄÖÜ][{_WCH}]*)+"


def detect_pii_expr(col):
    """Per-turn PII surface detection (JVM regexp — the stub analog of
    the reference's per-chunk LLM anonymizer fields)."""
    return F.regexp_extract_all(col, F.lit(_PII_PATTERN), 0)


def anonymize_conversations(
    transcripts: DataFrame,
    sep: str = " ",
    replacement_char: str = "■",
    ignore_short_sequences: int = 0,
) -> DataFrame:
    """transcripts → (conv_id, conv_text, personal_info_list,
    masked_report).

    A1 (ordered reassembly) and A2 (PII flatten) happen in ONE
    aggregation: collect_list(struct(turn_idx, text, pii)) sorted once,
    then conv_text and the flattened, order-preserving-deduped PII list
    are both derived from the sorted array. F4 masking runs as a single
    Arrow-batched UDF over the result — row-local, no further shuffle.
    """
    turns = transcripts.select(
        "conv_id",
        "turn_idx",
        "text",
        detect_pii_expr(F.col("text")).alias("pii"),
    )
    agg = turns.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", "text", "pii"))
        ).alias("turns")
    )
    conv_text = F.concat_ws(sep, F.transform("turns", lambda t: t["text"]))
    # flatten in turn order; dedupe preserving first occurrence
    # (reference OrderedDict.fromkeys, webapp/llm_processing/utils.py:61)
    pii_flat = F.array_distinct(
        F.flatten(F.transform("turns", lambda t: t["pii"]))
    )
    out = agg.select(
        "conv_id",
        conv_text.alias("conv_text"),
        pii_flat.alias("personal_info_list"),
    )
    return out.withColumn(
        "masked_report",
        masked_col(
            F.col("conv_text"),
            F.col("personal_info_list"),
            replacement_char,
            ignore_short_sequences,
        ),
    )


def anonymizer_postprocess(
    chunks: DataFrame,
    field_cols: list[str],
    sep: str = " ",
    replacement_char: str = "■",
) -> DataFrame:
    """Reference-signature anonymizer postprocess: chunk-level rows
    (id with `$hash_<i>` suffix, report, metadata, one PII value per
    field column) → one row per base document with the chunks rejoined,
    all field values flattened into personal_info_list (first-occurrence
    dedup, umlaut variants appended by the masking UDF) and the report
    masked with its OWN list.

    Mirrors webapp/llm_processing/routes.py:1044-1092 exactly, but as one
    aggregation: chunk order is explicit (the reference relied on
    implicit row order), metadata is first-chunk's (reference :1090).
    """
    from llmaix_spark.functions.text import base_id_expr

    chunk_idx = F.coalesce(
        F.regexp_extract(F.col("id"), r"_(\d+)$", 1).cast("int"), F.lit(0)
    )
    fields = F.array(*[F.col(c) for c in field_cols])
    rows = chunks.select(
        base_id_expr(F.col("id")).alias("id"),
        F.struct(
            chunk_idx.alias("i"),
            F.col("report").alias("report"),
            F.col("metadata").alias("metadata"),
            fields.alias("pii"),
        ).alias("chunk"),
    )
    agg = rows.groupBy("id").agg(
        F.array_sort(F.collect_list("chunk")).alias("chunks")
    )
    report = F.concat_ws(sep, F.transform("chunks", lambda c: c["report"]))
    pii = F.array_distinct(
        F.filter(
            F.flatten(F.transform("chunks", lambda c: c["pii"])),
            lambda x: x.isNotNull(),
        )
    )
    out = agg.select(
        "id",
        report.alias("report"),
        F.col("chunks")[0]["metadata"].alias("metadata"),
        pii.alias("personal_info_list"),
    )
    return out.withColumn(
        "masked_report",
        masked_col(F.col("report"), F.col("personal_info_list"), replacement_char),
    )
