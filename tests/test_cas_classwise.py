"""CAS annotation parsing (S-side of report_redaction) + classwise
dollartext (F5 variant) — semantics pinned against a literal python twin
of the reference loops (webapp/report_redaction/utils.py:33-134 bbox
math, :186-217 per-label masking)."""

from __future__ import annotations

import json

import pytest

from llmaix_spark.functions.masking import (
    generate_classwise_dollartext,
    generate_dollartext,
)

R = "■"


# --- kernel: classwise dollartext -------------------------------------------


def test_classwise_dollartext_per_label_masks():
    text = "Anna saw Bob in Ulm"
    anns = [
        {"label": "person", "begin": 0, "end": 4},
        {"label": "person", "begin": 9, "end": 12},
        {"label": "location", "begin": 16, "end": 19},
    ]
    out = generate_classwise_dollartext(text, anns)
    assert out == {
        "person": "■■■■ saw ■■■ in Ulm",
        "location": "Anna saw Bob in ■■■",
    }


def test_classwise_matches_reference_semantics():
    """Literal twin of the reference's label-outer/annotation-inner loop
    (utils.py:186-217) — must agree even with overlapping spans."""
    text = "abcdefghij"
    anns = [
        {"label": "x", "begin": 1, "end": 4},
        {"label": "y", "begin": 3, "end": 6},
        {"label": "x", "begin": 3, "end": 5},  # overlaps the first x span
    ]

    def reference_twin(t, annotations, rc="■"):
        out = {}
        labels = {a["label"] for a in annotations}
        for label in labels:
            out[label] = t
            for a in annotations:
                if a["label"] == label:
                    b, e = a["begin"], a["end"]
                    out[label] = out[label][:b] + rc * (e - b) + out[label][e:]
        return out

    assert generate_classwise_dollartext(text, anns) == reference_twin(text, anns)


def test_classwise_empty_annotations():
    assert generate_classwise_dollartext("abc", []) == {}


def test_dollartext_clamps_out_of_range():
    assert generate_dollartext("abc", [(-2, 2), (2, 99)]) == "■■■"


# --- Spark exposure: classwise_dollartext -----------------------------------


def test_classwise_dollartext_spark(spark):
    from llmaix_spark.operators.redaction import classwise_dollartext

    docs = spark.createDataFrame(
        [("d1", "Anna saw Bob in Ulm")], ["doc_id", "text"]
    )
    spans = spark.createDataFrame(
        [
            ("d1", "person", 0, 4),
            ("d1", "person", 9, 12),
            ("d1", "location", 16, 19),
        ],
        ["doc_id", "label", "begin", "end"],
    )
    got = {
        (r["doc_id"], r["label"]): r["dollartext"]
        for r in classwise_dollartext(docs, spans).collect()
    }
    assert got == {
        ("d1", "person"): "■■■■ saw ■■■ in Ulm",
        ("d1", "location"): "Anna saw Bob in ■■■",
    }


def test_classwise_feeds_per_label_redaction_scores(spark):
    """End-to-end F5→A3: per-label ground-truth vs automatic masks scored
    per label through the existing accumulator."""
    from llmaix_spark.operators.redaction import (
        accumulate_redaction_metrics,
        classwise_dollartext,
        score_redactions,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([("d1", "AB CD")], ["doc_id", "text"])
    gt_spans = spark.createDataFrame(
        [("d1", "person", 0, 2), ("d1", "location", 3, 5)],
        ["doc_id", "label", "begin", "end"],
    )
    # automatic: person over-redacts one extra char (pos 3), location exact
    auto_spans = spark.createDataFrame(
        [("d1", "person", 0, 2), ("d1", "person", 3, 4),
         ("d1", "location", 3, 5)],
        ["doc_id", "label", "begin", "end"],
    )
    gt = classwise_dollartext(docs, gt_spans).withColumnRenamed(
        "dollartext", "gt_text"
    )
    auto = classwise_dollartext(docs, auto_spans).withColumnRenamed(
        "dollartext", "auto_text"
    )
    rows = (
        gt.join(auto, ["doc_id", "label"])
        .join(docs, "doc_id")
        .select("label", "gt_text", "auto_text", F.col("text").alias("orig_text"))
    )
    acc = {
        r["label"]: (r["tp"], r["fp"], r["tn"], r["fn"])
        for r in accumulate_redaction_metrics(
            score_redactions(rows), "label"
        ).collect()
    }
    # 4 non-special positions (space ignored)
    assert acc["location"] == (2, 0, 2, 0)
    assert acc["person"] == (2, 1, 1, 0)


# --- CAS JSON parsing ---------------------------------------------------------


def _reference_bboxes(cas: dict) -> list[tuple]:
    """Literal python twin of InceptionAnnotationParser.get_annotations
    (webapp/report_redaction/utils.py:66-134)."""
    out = []
    for span in cas["spans"]:
        if span["label"] is None:
            continue
        for chunk in cas["chunks"]:
            if span["begin"] <= chunk["end"] and span["end"] >= chunk["begin"]:
                start_index = max(span["begin"] - chunk["begin"], 0)
                end_index = min(
                    span["end"] - chunk["begin"], len(chunk["g"]) - 1
                )
                x_start = chunk["g"][start_index]
                x_end = chunk["g"][end_index]
                page_number = None
                for page in cas["pages"]:
                    if page["begin"] <= chunk["end"] and page["end"] >= chunk["begin"]:
                        page_number = page["pageNumber"]
                out.append(
                    (span["label"], span["begin"], span["end"], page_number,
                     x_start, chunk["y"], x_end, chunk["y"] + chunk["h"])
                )
    return out


@pytest.fixture()
def cas_doc():
    return {
        "sofa_string": "Anna Meier was admitted to Ward 7 yesterday.",
        "spans": [
            {"label": "person", "begin": 0, "end": 10},
            {"label": None, "begin": 11, "end": 14},       # skipped
            {"label": "ward", "begin": 27, "end": 33},
            {"label": "orphan", "begin": 100, "end": 104},  # no chunk
        ],
        "chunks": [
            {"begin": 0, "end": 20, "y": 10.0, "h": 12.0,
             "g": [float(5 * i) for i in range(21)]},
            {"begin": 21, "end": 43, "y": 30.0, "h": 12.0,
             "g": [float(100 + 4 * i) for i in range(23)]},
        ],
        "pages": [
            {"begin": 0, "end": 20, "pageNumber": 0, "width": 600.0,
             "height": 800.0},
            {"begin": 21, "end": 43, "pageNumber": 1, "width": 600.0,
             "height": 800.0},
        ],
    }


def test_parse_cas_json_matches_reference_loop(spark, cas_doc):
    from llmaix_spark.sources.cas import parse_cas_json

    df = spark.createDataFrame(
        [("d1", json.dumps(cas_doc))], ["doc_id", "cas_json"]
    )
    rows = parse_cas_json(df).collect()
    got = {
        (r["label"], r["begin"], r["end"], r["page_number"],
         r["x0"], r["y0"], r["x1"], r["y1"])
        for r in rows
        if r["page_number"] is not None
    }
    assert got == set(_reference_bboxes(cas_doc))
    # unlabeled span skipped entirely
    assert all(r["label"] is not None for r in rows)
    # the chunk-less span survives with a NULL bbox
    orphan = [r for r in rows if r["label"] == "orphan"]
    assert len(orphan) == 1 and orphan[0]["page_number"] is None


def test_cas_spans_feed_classwise_dollartext(spark, cas_doc):
    from llmaix_spark.operators.redaction import classwise_dollartext
    from llmaix_spark.sources.cas import cas_sofa_strings, parse_cas_json

    df = spark.createDataFrame(
        [("d1", json.dumps(cas_doc))], ["doc_id", "cas_json"]
    )
    spans = parse_cas_json(df).select("doc_id", "label", "begin", "end").distinct()
    docs = cas_sofa_strings(df)
    got = {
        r["label"]: r["dollartext"]
        for r in classwise_dollartext(docs, spans).collect()
    }
    assert got["person"] == "■■■■■■■■■■ was admitted to Ward 7 yesterday."
    assert got["ward"] == "Anna Meier was admitted to ■■■■■■ yesterday."


def test_parse_cas_json_empty_g_yields_null_bbox(spark):
    """A malformed chunk with g=[] must yield NULL x0/x1, not an
    element_at(..., 0) error that kills the job."""
    import json as _json

    from llmaix_spark.sources.cas import parse_cas_json

    doc = {
        "sofa_string": "short text",
        "spans": [{"label": "person", "begin": 0, "end": 5}],
        "chunks": [{"begin": 0, "end": 9, "y": 1.0, "h": 2.0, "g": []}],
        "pages": [{"begin": 0, "end": 9, "pageNumber": 0,
                   "width": 600.0, "height": 800.0}],
    }
    df = spark.createDataFrame([("d1", _json.dumps(doc))], ["doc_id", "cas_json"])
    rows = parse_cas_json(df).collect()
    assert len(rows) == 1
    assert rows[0]["x0"] is None and rows[0]["x1"] is None
    assert rows[0]["page_number"] == 0  # chunk overlap itself still holds


def test_parse_cas_json_no_page_overlap_yields_null_page(spark):
    """A chunk overlapping NO page (empty/malformed page table) yields
    NULL page_number — element_at(-1) on the empty match array throws
    under ANSI mode and must not be reachable."""
    import json as _json

    from llmaix_spark.sources.cas import parse_cas_json

    doc = {
        "sofa_string": "short text",
        "spans": [{"label": "person", "begin": 0, "end": 5}],
        "chunks": [{"begin": 0, "end": 9, "y": 1.0, "h": 2.0,
                    "g": [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]}],
        "pages": [],
    }
    df = spark.createDataFrame([("d1", _json.dumps(doc))], ["doc_id", "cas_json"])
    rows = parse_cas_json(df).collect()
    assert len(rows) == 1
    assert rows[0]["page_number"] is None
    assert rows[0]["x0"] == 0.0 and rows[0]["x1"] == 5.0
