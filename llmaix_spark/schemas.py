"""Canonical schemas for the transcript→triples pipeline.

The input contract is fixed by BASELINE.json `input_hint`:
transcripts(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp). Downstream schemas are explicit StructTypes so
Spark enforces what the reference's GBNF/JSON-schema grammar enforced
(reference webapp/llm_processing/forms.py:19-33, 120-130).
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# conversation after stable-order assembly (reference A1 groupby,
# webapp/llm_processing/routes.py:1060-1065)
CONVERSATIONS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.IntegerType(), False),
        T.StructField("conv_text", T.StringType(), True),
    ]
)

# raw output of the extraction UDF: one row per conversation; `content` is
# the (possibly messy) JSON string the backend produced, `error` flags an
# unparseable row (reference error_count semantics,
# webapp/llm_processing/routes.py:980-993 — row survives, error counted).
EXTRACTION_RAW = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("parsed", T.StringType(), True),  # repaired JSON
        T.StructField("error", T.BooleanType(), False),
        T.StructField("truncated", T.BooleanType(), False),
    ]
)

TRIPLES_RAW = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("subj_surface", T.StringType(), True),
        T.StructField("pred", T.StringType(), True),
        T.StructField("obj_surface", T.StringType(), True),
    ]
)

MENTIONS = T.StructType(
    [
        T.StructField("mention_id", T.LongType(), False),
        T.StructField("surface", T.StringType(), False),
        T.StructField("norm", T.StringType(), False),
        T.StructField("n_convs", T.LongType(), False),
    ]
)

NODES = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("canonical_name", T.StringType(), False),
        T.StructField("aliases", T.ArrayType(T.StringType()), False),
        T.StructField("kind", T.StringType(), True),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("subj_id", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj_id", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("evidence", T.StringType(), True),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("input_rows", T.LongType(), False),
        T.StructField("output_rows", T.LongType(), False),
        T.StructField("checkpoint", T.StringType(), True),
    ]
)
