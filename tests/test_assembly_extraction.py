"""Assembly (A1/W1) + extraction harness (L*/J*) end-to-end on the
deterministic transcripts fixture."""

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from llmaix_spark.operators.assembly import (
    assemble_conversations,
    per_turn_equality_violations,
    skip_empty,
)
from llmaix_spark.operators.extraction import (
    ExtractionConfig,
    StubBackend,
    extract_triples,
)


@pytest.fixture(scope="module")
def transcripts(spark, transcripts_dir):
    return spark.read.parquet(os.path.join(transcripts_dir, "transcripts.parquet"))


def test_assembly_order_is_stable(spark):
    df = spark.createDataFrame(
        [("c1", 2, "gamma"), ("c1", 0, "alpha"), ("c1", 1, "beta"),
         ("c2", 0, "solo")],
        "conv_id string, turn_idx int, text string",
    ).repartition(4)  # scramble physical order on purpose
    got = {
        r["conv_id"]: (r["conv_text"], r["n_turns"])
        for r in assemble_conversations(df).collect()
    }
    assert got["c1"] == ("alpha beta gamma", 3)
    assert got["c2"] == ("solo", 1)


def test_per_turn_equality_invariant(transcripts):
    """North-rule invariant: per-turn text equality under stable ordering."""
    assert per_turn_equality_violations(transcripts).count() == 0


def test_skip_empty_counts(spark):
    df = spark.createDataFrame(
        [("c", 0, "ok"), ("c", 1, ""), ("c", 2, "?"), ("c", 3, "  ")],
        "conv_id string, turn_idx int, text string",
    )
    kept, skipped = skip_empty(df)
    assert kept.count() == 1
    assert skipped.collect()[0]["skipped"] == 3


def test_stub_backend_rules():
    text = "noted Anna Müller works at Acme Corporation. ok"
    got = StubBackend.extract_triples(text)
    assert got == [
        {"subj": "Anna Müller", "pred": "works_at", "obj": "Acme Corporation"}
    ]
    # lowercase surfaces are not extracted (by design, mirrored in oracle)
    assert StubBackend.extract_triples("anna müller works at Acme Corporation.") == []


def test_extract_triples_end_to_end(transcripts):
    triples, raw = extract_triples(transcripts, ExtractionConfig(), num_partitions=4)
    n = triples.count()
    assert n > 100
    cols = set(triples.columns)
    assert cols == {"conv_id", "subj_surface", "pred", "obj_surface"}
    # error rows exist but are rare, and every conversation row survived
    raw_rows = raw.count()
    assert raw_rows == transcripts.select("conv_id").distinct().count()
    errs = raw.filter("error").count()
    assert errs / raw_rows < 0.02


def test_extraction_matches_pandas_oracle(transcripts, transcripts_dir):
    """Spark triples == a pure-pandas replay of the same stub + repair
    kernels over the assembled conversations (exact set equality — the
    narrow pipeline must be deterministic)."""
    from llmaix_spark.functions.json_repair import repair_and_parse

    tdf = pd.read_parquet(os.path.join(transcripts_dir, "transcripts.parquet"))
    tdf = tdf.sort_values(["conv_id", "turn_idx"])
    conv = tdf.groupby("conv_id")["text"].apply(lambda s: " ".join(s.fillna("")))
    be = StubBackend(ExtractionConfig())
    expected = set()
    from llmaix_spark.operators.extraction import DEFAULT_PROMPT

    for conv_id, text in conv.items():
        prompt = DEFAULT_PROMPT.format(report=text)
        content, _trunc = be.complete([prompt])[0]
        d, _, err = repair_and_parse(content)
        for t in d.get("triples", []) or []:
            if t.get("subj") and t.get("obj"):
                expected.add((conv_id, t["subj"], t["pred"], t["obj"]))

    spark_triples, _ = extract_triples(
        transcripts.sparkSession.read.parquet(
            os.path.join(transcripts_dir, "transcripts.parquet")
        ),
        ExtractionConfig(),
        num_partitions=4,
    )
    got = {
        (r["conv_id"], r["subj_surface"], r["pred"], r["obj_surface"])
        for r in spark_triples.collect()
    }
    assert got == expected


def test_extract_with_variables_fanout(spark):
    """L7: each conversation is prompted once per variable (reference
    symptom loop, webapp/llm_processing/routes.py:480-496); the variable
    reaches the prompt via {symptom} and the output table."""
    from llmaix_spark.operators.extraction import (
        ExtractionConfig,
        extract_with_variables,
        pivot_variable_field,
        triples_from_raw,
    )

    t = spark.createDataFrame(
        [("c1", 0, "user", "hello there", None, None),
         ("c2", 0, "user", "general kenobi", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    cfg = ExtractionConfig(
        prompt_template="{symptom} works at MegaCorp. {report}",
        quirk_rate=0.0, malformed_rate=0.0,
    )
    raw = extract_with_variables(t, ["Alice", "Bob"], cfg)
    rows = raw.collect()
    assert len(rows) == 4  # 2 convs × 2 variables
    assert {r["variable"] for r in rows} == {"Alice", "Bob"}
    # the variable reached the prompt: the stub extracted it as a subject
    trips = triples_from_raw(raw.drop("variable")).collect()
    assert {(r["subj_surface"], r["obj_surface"]) for r in trips} == {
        ("Alice", "MegaCorp"), ("Bob", "MegaCorp")
    }
    # wide pivot: one column per variable (n = triple count per prompt)
    wide = pivot_variable_field(raw, ["Alice", "Bob"], "n").collect()
    assert len(wide) == 2
    for r in wide:
        assert r["Alice"] == "1" and r["Bob"] == "1"


def test_backend_singleton_keyed_on_full_config():
    """Two jobs with different output-shaping knobs (incl. the `extra`
    dict) in one long-lived worker must not share a backend instance;
    identical configs must reuse one (reference keeps one llama-server
    keyed on current_model, routes.py:806-863)."""
    from llmaix_spark.operators.extraction import _get_backend

    base = ExtractionConfig()
    assert _get_backend(base) is _get_backend(ExtractionConfig())
    assert _get_backend(base) is not _get_backend(
        ExtractionConfig(truncate_rate=0.5)
    )
    assert _get_backend(base) is not _get_backend(
        ExtractionConfig(seed=7)
    )
    assert _get_backend(base) is not _get_backend(
        ExtractionConfig(json_schema={"type": "object"})
    )
    assert _get_backend(base) is not _get_backend(
        ExtractionConfig(extra={"endpoint_type": "chat"})
    )
