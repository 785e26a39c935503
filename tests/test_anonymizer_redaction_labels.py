"""Anonymizer mode (A1/A2/F4), redaction metrics (M1/M2/A3), label
evaluation dataflow (JN1/JN2/A6/A7), sources (S1/S4/S6)."""

import os

import pytest
from pyspark.sql import functions as F

from llmaix_spark.operators.anonymizer import anonymize_conversations
from llmaix_spark.operators.labels import (
    expect_exactly_one,
    infer_label_types,
    join_annotations,
    export_pivot,
)
from llmaix_spark.operators.redaction import (
    accumulate_redaction_metrics,
    redaction_counts,
    score_redactions,
)


# --- anonymizer ---------------------------------------------------------------


def test_anonymizer_rowwise_isolation(spark):
    """Each conversation masked with ITS OWN PII list (reference
    test_anonymizer_postprocess.py:18-48)."""
    df = spark.createDataFrame(
        [
            ("c1", 0, "Anna Müller visited Berlin yesterday"),
            ("c1", 1, "she met Hans Gruber there"),
            ("c2", 0, "Anna Müller was not here"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    got = {r["conv_id"]: r for r in anonymize_conversations(df).collect()}
    assert got["c1"]["personal_info_list"] == ["Anna Müller", "Hans Gruber"]
    assert got["c1"]["masked_report"] == (
        "■■■■■■■■■■■ visited Berlin yesterday she met ■■■■■■■■■■■ there"
    )
    # c2's mask only covers its own PII
    assert got["c2"]["masked_report"] == "■■■■■■■■■■■ was not here"


def test_anonymizer_turn_order_stable(spark):
    df = spark.createDataFrame(
        [("c", 1, "Bob Smith second"), ("c", 0, "first")],
        "conv_id string, turn_idx int, text string",
    ).repartition(4)
    r = anonymize_conversations(df).collect()[0]
    assert r["conv_text"] == "first Bob Smith second"


# --- redaction metrics ---------------------------------------------------------


def test_redaction_counts_one_of_each(spark):
    """Reference test_metrics.py:23-41 — one tp, fp, tn, fn."""
    # positions: a=tp(■,■), b=fp(x,■), c=tn(x,x), d=fn(■,x)
    gt = "■xx■"
    auto = "■■xx"
    orig = "abcd"
    assert redaction_counts(gt, auto, orig) == (1, 1, 1, 1)


def test_redaction_counts_special_chars_excluded(spark):
    """Positions whose ORIGINAL char is special don't count
    (reference test_metrics.py:43-52)."""
    gt = "■.■"
    auto = "■.x"
    orig = "a.b"
    # middle '.' skipped → tp=1, fn=1
    assert redaction_counts(gt, auto, orig) == (1, 0, 0, 1)


def test_redaction_counts_perfect(spark):
    assert redaction_counts("■■■", "■■■", "abc") == (3, 0, 0, 0)


def test_redaction_counts_length_mismatch_raises():
    with pytest.raises(AssertionError):
        redaction_counts("ab", "abc", "abc")


def test_score_and_accumulate(spark):
    rows = [
        ("r1", "name", "■■■■x", "■■■■■", "abcde"),
        ("r2", "name", "x■■xx", "xx■xx", "abcde"),
        ("r1", "date", "■■xxx", "■■xxx", "abcde"),
    ]
    df = spark.createDataFrame(
        rows, "id string, label string, gt_text string, auto_text string, orig_text string"
    )
    scored = score_redactions(df)
    by = {(r["id"], r["label"]): r for r in scored.collect()}
    assert by[("r1", "name")]["tp"] == 4 and by[("r1", "name")]["fp"] == 1
    acc = accumulate_redaction_metrics(scored, "label").collect()
    accd = {r["label"]: r for r in acc}
    # micro recomputed from summed counts
    name = accd["name"]
    assert name["tp"] == 5 and name["fn"] == 1
    assert 0 <= name["micro_precision"] <= 1
    assert name["macro_precision"] == round(
        (by[("r1", "name")]["precision"] + by[("r2", "name")]["precision"]) / 2, 4
    )


# --- labels --------------------------------------------------------------------


def test_join_annotations_indicator(spark):
    llm = spark.createDataFrame(
        [("case1.pdf$ab_0", "x"), ("case2.pdf$cd_0", "y"), ("orphan$ef_0", "z")],
        "id string, field string",
    )
    ann = spark.createDataFrame(
        [("case1", "true"), ("case2", "false")], "id string, lbl string"
    )
    joined, unmatched = join_annotations(llm, ann)
    assert joined.filter("matched").count() == 2
    assert [r["report_id_short"] for r in unmatched.collect()] == ["orphan"]


def test_expect_exactly_one(spark):
    ann = spark.createDataFrame(
        [("a",), ("b",), ("b",)], "id string"
    )
    bad = expect_exactly_one(ann)
    assert [(r["id"], r["n"]) for r in bad.collect()] == [("b", 2)]


def _types(spec):
    return {k: v["label_type"] for k, v in spec.items()}


def test_infer_label_types_reference_truth_table(spark):
    """Pins labelannotation/routes.py:679-693 exactly:
    boolean ⇔ annotation set is a 2-value T/F pair;
    multiclass ⇔ set(llm) == set(annotation); else stringmatch."""
    ann = spark.createDataFrame(
        [("True", "red", "yes", "txt a"), ("False", "blue", "yes", "txt b"),
         ("True", "red", "yes", "txt c"), ("False", "green", "yes", "txt d")],
        "flag string, color string, only_yes string, note string",
    )
    llm = spark.createDataFrame(
        [("True", "green", "yes", "out a"), ("True", "blue", "no", "out b"),
         ("False", "red", "yes", "out c"), ("False", "red", "yes", "out d")],
        "flag string, color string, only_yes string, note string",
    )
    got = infer_label_types(llm, ann, ["flag", "color", "only_yes", "note", "absent"])
    assert _types(got) == {
        "flag": "boolean",        # ann set == {"True","False"}
        "color": "multiclass",    # set(llm) == set(ann) == {red,blue,green}
        # the case the old subset-of-boolish rule got wrong: a single
        # 'yes' is NOT a 2-value pair, and llm {yes,no} != ann {yes}
        "only_yes": "stringmatch",
        "note": "stringmatch",
        "absent": "ignore",       # label missing from the annotation table
    }
    assert got["color"]["label_classes"] == ["blue", "green", "red"]
    assert got["absent"]["label_classes"] == []


def test_infer_label_types_case_sensitive_pairs(spark):
    """The reference pair check is case-sensitive: {'True','false'} is
    not a pair; {'TRUE','FALSE'} is not a pair; sets of 1 or 3 boolish
    values are not boolean."""
    ann = spark.createDataFrame(
        [("True", "TRUE", "yes", "1"), ("false", "FALSE", "no", "0"),
         ("True", "TRUE", "maybe", "1")],
        "mixed string, upper string, triple string, one_zero string",
    )
    llm = ann  # set(llm)==set(ann) everywhere → multiclass unless boolean
    got = _types(infer_label_types(llm, ann, list(ann.columns)))
    assert got == {
        "mixed": "multiclass", "upper": "multiclass",
        "triple": "multiclass", "one_zero": "boolean",
    }


def test_infer_label_types_bracket_extraction_and_preset(spark):
    """List-valued LLM cells go through extract_first_non_empty_string
    (routes.py:670-671, :581-594) before the set comparison; a preset
    type survives when neither rule fires (routes.py:689)."""
    ann = spark.createDataFrame([("red",), ("blue",)], "color string")
    llm = spark.createDataFrame(
        [("['red']",), ("['', 'blue']",), ("",)], "color string"
    )
    # extraction: {'red', 'blue'} (the "" llm cell is dropped) == ann set
    got = infer_label_types(llm, ann, ["color"])
    assert got["color"]["label_type"] == "multiclass"
    # malformed list cell → the reference raises mid-request
    bad = spark.createDataFrame([("['red'",), ("[1,",)], "color string")
    with pytest.raises(ValueError, match="malformed"):
        infer_label_types(bad, ann, ["color"])
    # preset survives only the else-branch
    llm2 = spark.createDataFrame([("purple",)], "color string")
    got2 = infer_label_types(llm2, ann, ["color"], preset={"color": "stringmatch"})
    assert got2["color"]["label_type"] == "stringmatch"


def test_infer_label_types_llm_nulls_block_multiclass(spark):
    """A NaN on the LLM side makes the reference's set comparison fail
    (nan ∉ annotation strings) → stringmatch, not multiclass."""
    ann = spark.createDataFrame([("a",), ("b",)], "cls string")
    llm = spark.createDataFrame([("a",), ("b",), (None,)], "cls string")
    assert _types(infer_label_types(llm, ann, ["cls"])) == {"cls": "stringmatch"}


def test_infer_label_types_driver_bounded(spark):
    """A high-cardinality column never ships its value set to the driver:
    > max_classes distinct ⇒ stringmatch with empty label_classes."""
    ann = spark.range(500).select(
        F.concat(F.lit("v"), F.col("id")).alias("free"),
        (F.col("id") % 2 == 0).cast("string").alias("flag"),
    )
    got = infer_label_types(ann, ann, ["free", "flag"], max_classes=50)
    assert got["free"] == {"label_type": "stringmatch", "label_classes": []}
    assert got["flag"]["label_type"] == "boolean"  # cast bool → true/false


def test_check_labels_reference_warning_table(spark):
    """Mirrors the reference's flash-warning cases
    (labelannotation/routes.py:699-736)."""
    from llmaix_spark.operators.labels import check_labels

    ann = spark.createDataFrame(
        [("True", "red", ""), ("False", "blue", "x"), ("maybe", "red", "y")],
        "flag string, color string, note string",
    )
    llm = spark.createDataFrame(
        [("True", "red", "x"), ("False", "green", "y"), ("1", "blue", "z")],
        "flag string, color string, note string",
    )
    mapping = {
        "flag": {"label_type": "boolean", "label_classes": ["False", "True"]},
        "color": {"label_type": "multiclass", "label_classes": ["blue", "red"]},
        "note": {"label_type": "stringmatch", "label_classes": []},
    }
    got = check_labels(llm, ann, mapping)
    by_label = {(i["label"], i["issue"]): i for i in got}
    # boolean: 3 distinct values on both sides + invalid tokens
    assert ("flag", "too_many_values") in by_label
    assert by_label[("flag", "invalid_annotation_values")]["detail"] == ["maybe"]
    assert ("flag", "invalid_llm_values") not in by_label  # '1' is valid
    # multiclass: llm {red,green,blue} != ann {red,blue}; ann != selected?
    assert ("color", "classes_differ_llm_vs_annotation") in by_label
    assert ("color", "classes_differ_annotation_vs_selected") not in by_label
    # stringmatch: empty annotation value, no empty llm values
    assert ("note", "annotation_empty_values") in by_label
    assert ("note", "llm_empty_values") not in by_label


def test_check_labels_surfaces_null_in_list_valued_column(spark):
    """The bracket-column-with-NULLs state aborts infer_label_types (the
    reference's literal_eval crash) — the sanity pass must REPORT it,
    not sail past what inference then crashes on (review finding)."""
    from llmaix_spark.operators.labels import check_labels

    ann = spark.createDataFrame([("red",), ("blue",)], "color string")
    llm = spark.createDataFrame([("['red']",), (None,)], "color string")
    mapping = {
        "color": {"label_type": "multiclass", "label_classes": ["blue", "red"]}
    }
    got = check_labels(llm, ann, mapping)
    assert ("color", "null_in_list_valued_column") in {
        (i["label"], i["issue"]) for i in got
    }


def test_check_labels_clean_pass(spark):
    from llmaix_spark.operators.labels import check_labels

    ann = spark.createDataFrame([("yes", "a"), ("no", "b")],
                                "flag string, cls string")
    mapping = {
        "flag": {"label_type": "boolean", "label_classes": ["no", "yes"]},
        "cls": {"label_type": "multiclass", "label_classes": ["a", "b"]},
    }
    assert check_labels(ann, ann, mapping) == []


def test_export_pivot(spark):
    df = spark.createDataFrame(
        [("r1", "name", 0.5), ("r1", "date", 1.0), ("r2", "name", 0.25)],
        "id string, label string, accuracy double",
    )
    wide = export_pivot(df)
    rows = {r["id"]: r for r in wide.collect()}
    assert rows["r1"]["name"] == 0.5 and rows["r1"]["date"] == 1.0
    assert rows["r2"]["date"] is None


def test_reannotate_vs_reference_loop_twin(spark):
    """reannotate() vs a LITERAL port of the reference's record-list
    flow (AnnotationHelperJob.__init__ value_annotator init at
    routes.py:50-67, update_record_labels_by_id at :114-122,
    get_reannotated_df at :131-163): bracketed-cell [0] init,
    sequential last-correction-wins, case-sensitive boolean coercion
    with warn-and-keep, the id double-strip, unmatched corrections
    ignored."""
    import ast

    from llmaix_spark.operators.labels import reannotate

    rows = [
        {"id": "r1.pdf$ab12cd34_0", "report": "alpha", "metadata": "{}",
         "flag": "True", "status": "['good', '']", "score": "0.5"},
        {"id": "r2.pdf$ef56ab78_0", "report": "beta", "metadata": "{}",
         "flag": "nope", "status": "['bad']", "score": "0.7"},
        {"id": "nodollar", "report": "gamma", "metadata": "{}",
         "flag": "JA", "status": "plain", "score": "x"},
    ]
    corrections = [
        ("r2.pdf$ef56ab78_0", "flag", "yes", 1),
        ("r2.pdf$ef56ab78_0", "flag", "Nein", 2),  # last wins → '0'
        ("r1.pdf$ab12cd34_0", "score", "0.9", 1),
        ("missing$x", "flag", "True", 1),  # matches nothing → ignored
    ]
    label_types = {"flag": "boolean", "status": "stringmatch",
                   "score": "stringmatch"}
    label_cols = ["flag", "status", "score"]

    # ---- literal reference loops
    record_list = []
    for row in rows:
        entry = {"record_id": row["id"], "labels": []}
        for col in label_cols:
            v = row[col]
            iv = ast.literal_eval(v)[0] if str(v).startswith("[") else v
            entry["labels"].append({"label": col, "value_annotator": iv})
        record_list.append(entry)
    for rid, label, value, _seq in corrections:  # request order
        for record in record_list:
            if record["record_id"] == rid:
                for rl in record["labels"]:
                    if rl["label"] == label:
                        rl["value_annotator"] = value
    true_eq = ["True", "true", "Ja", "ja", "Yes", "yes", "correct",
               "wahr", "1", "TRUE", True]
    false_eq = ["False", "false", "Nein", "nein", "No", "no", "falsch",
                "0", "FALSE", False]
    expected = {}
    for row, record in zip(rows, record_list):
        out = {}
        for rl in record["labels"]:
            v = rl["value_annotator"]
            if label_types[rl["label"]] == "boolean":
                if v in true_eq:
                    v = "1"
                elif v in false_eq:
                    v = "0"
            out[rl["label"]] = v
        out["id"] = ".".join(
            "$".join(row["id"].split("$")[:-1]).split(".")[:-1]
        )
        expected[row["report"]] = out

    llm = spark.createDataFrame(
        [tuple(r[c] for c in
               ("id", "report", "metadata", "flag", "status", "score"))
         for r in rows],
        "id string, report string, metadata string, flag string, "
        "status string, score string",
    )
    cor = spark.createDataFrame(
        corrections, "record_id string, label string, value string, seq int"
    )
    got = {
        r["report"]: r.asDict()
        for r in reannotate(llm, cor, label_types, seq_col="seq").collect()
    }
    assert set(got) == set(expected)
    for rep, exp in expected.items():
        for k, v in exp.items():
            assert got[rep][k] == v, (rep, k, got[rep][k], v)
    # spot-pin the interesting cells explicitly
    assert got["alpha"] == {"id": "r1", "report": "alpha", "flag": "1",
                            "status": "good", "score": "0.9"}
    assert got["beta"]["flag"] == "0"  # last correction (Nein) wins
    assert got["gamma"]["flag"] == "JA"  # case-sensitive: warn-and-keep
    assert got["gamma"]["id"] == ""  # no '$' → reference collapses to ''

    # empty-list and unparseable cells must NOT kill the stage (the
    # reference's [0] / literal_eval would raise — documented
    # divergence: fall back to the raw cell). element_at(…, 1) threw
    # INVALID_ARRAY_INDEX_IN_ELEMENT_AT here under ANSI mode.
    bad = spark.createDataFrame(
        [("x.pdf$aa_0", "rep", "{}", "True", "[]", "['unterminated"),],
        "id string, report string, metadata string, flag string, "
        "status string, score string",
    )
    row = reannotate(
        bad, cor.limit(0), label_types, seq_col="seq"
    ).collect()[0]
    assert row["status"] == "[]" and row["score"] == "['unterminated"


def test_reannotate_randomized_stress_vs_reference_loop(spark):
    """Seeded randomized stress (200 records, one Spark job — a
    hypothesis-per-example loop would spawn a job per draw): random
    label values across every arm (valid/invalid booleans, bracketed
    lists incl. leading-empty elements, plain strings), random
    correction logs (0-3 per cell, unmatched ids mixed in) — the
    distributed merge must equal the literal reference loops on every
    cell."""
    import ast
    import random

    from llmaix_spark.operators.labels import reannotate

    rng = random.Random(42)
    bool_pool = ["True", "false", "Ja", "no", "wahr", "JA", "maybe",
                 "1", "0", "TRUE", "Falsch"]
    str_pool = ["alpha", "", "x y", "['a', 'b']", "['', 'kept']",
                "plain", "['solo']"]
    label_types = {"flag": "boolean", "note": "stringmatch"}
    rows = []
    for i in range(200):
        rid = (
            f"r{i}.pdf$h{i:04d}_0" if i % 7 else f"weird{i}"  # some no-$
        )
        rows.append(
            {"id": rid, "report": f"rep{i}",
             "flag": rng.choice(bool_pool), "note": rng.choice(str_pool)}
        )
    corrections = []
    seq = 0
    for r in rows:
        for label in ("flag", "note"):
            for _ in range(rng.randrange(0, 3)):
                seq += 1
                pool = bool_pool if label == "flag" else str_pool
                corrections.append((r["id"], label, rng.choice(pool), seq))
    corrections.append(("nope$missing", "flag", "True", seq + 1))

    # literal reference loops (init → sequential updates → coercion)
    record_list = []
    for row in rows:
        entry = {"record_id": row["id"], "labels": []}
        for col in ("flag", "note"):
            v = row[col]
            iv = ast.literal_eval(v)[0] if str(v).startswith("[") else v
            entry["labels"].append({"label": col, "value_annotator": iv})
        record_list.append(entry)
    for rid, label, value, _s in corrections:
        for record in record_list:
            if record["record_id"] == rid:
                for rl in record["labels"]:
                    if rl["label"] == label:
                        rl["value_annotator"] = value
    true_eq = ["True", "true", "Ja", "ja", "Yes", "yes", "correct",
               "wahr", "1", "TRUE", True]
    false_eq = ["False", "false", "Nein", "nein", "No", "no", "falsch",
                "0", "FALSE", False]
    expected = {}
    for row, record in zip(rows, record_list):
        out = {}
        for rl in record["labels"]:
            v = rl["value_annotator"]
            if label_types[rl["label"]] == "boolean":
                if v in true_eq:
                    v = "1"
                elif v in false_eq:
                    v = "0"
            out[rl["label"]] = v
        out["id"] = ".".join(
            "$".join(row["id"].split("$")[:-1]).split(".")[:-1]
        )
        expected[row["report"]] = out

    llm = spark.createDataFrame(
        [(r["id"], r["report"], r["flag"], r["note"]) for r in rows],
        "id string, report string, flag string, note string",
    )
    cor = spark.createDataFrame(
        corrections, "record_id string, label string, value string, seq int"
    )
    got = {
        r["report"]: r.asDict()
        for r in reannotate(llm, cor, label_types, seq_col="seq").collect()
    }
    assert set(got) == set(expected)
    mism = [
        (rep, k, got[rep][k], v)
        for rep, exp in expected.items()
        for k, v in exp.items()
        if got[rep][k] != v
    ]
    assert not mism, mism[:5]


# --- sources -------------------------------------------------------------------


def test_read_reports_csv(spark, tmp_path):
    from llmaix_spark.sources.readers import read_reports_csv

    p = tmp_path / "in.csv"
    p.write_text("id,report\nr1,hello world\nr2,\"with, comma\"\n")
    df = read_reports_csv(spark, str(p))
    rows = sorted((r["report"] for r in df.collect()))
    assert rows == ["hello world", "with, comma"]
    ids = [r["id"] for r in df.collect()]
    assert all("$" in i and len(i.split("$")[1]) == 8 for i in ids)
    assert "metadata" in df.columns


def test_read_reports_txt(spark, tmp_path):
    from llmaix_spark.sources.readers import read_reports_txt

    (tmp_path / "a.txt").write_text("line one\nline two")
    df = read_reports_txt(spark, str(tmp_path / "a.txt"))
    r = df.collect()[0]
    assert r["report"] == "line one\nline two"
    assert r["id"].startswith("a.txt$")


def test_read_malformed_csv(spark, tmp_path):
    from llmaix_spark.sources.readers import read_malformed_csv

    p = tmp_path / "strange.csv"
    p.write_text('header\nrow "with quotes, and, commas\nrow2\n')
    df = read_malformed_csv(spark, str(p))
    rows = sorted(r["report"] for r in df.collect())
    assert rows == ['row "with quotes, and, commas', "row2"]


def test_read_malformed_csv_header_dropped_per_file_not_by_content(
    spark, tmp_path
):
    """Only the first PHYSICAL line of each file is the header: a body
    line textually equal to the header survives, duplicate body lines
    each get a distinct (line-index-salted) id, and with multiple files
    one header per file is dropped."""
    from llmaix_spark.sources.readers import read_malformed_csv

    (tmp_path / "a.csv").write_text("header\nheader\ndup\ndup\n")
    (tmp_path / "b.csv").write_text("header\nother\n")
    df = read_malformed_csv(spark, str(tmp_path))
    rows = df.collect()
    reports = sorted(r["report"] for r in rows)
    assert reports == ["dup", "dup", "header", "other"]
    assert len({r["id"] for r in rows}) == 4  # dup lines stay distinct


def test_anonymizer_postprocess_reference_signature(spark):
    """The reference's anonymizer-mode postprocess scenario
    (webapp/llm_processing/routes.py:1044-1092 + the PII-isolation
    regression): chunked rows regrouped by base_id, per-chunk PII flattened,
    report rejoined in chunk order, masked with its own list."""
    from llmaix_spark.operators.anonymizer import anonymizer_postprocess

    chunks = spark.createDataFrame(
        [
            ("docA$ab12cd34_1", "met Hans Gruber", "{'k':'v'}", "Hans Gruber", None),
            ("docA$ab12cd34_0", "Anna Müller was here and", "{'k':'v'}", "Anna Müller", "Berlin"),
            ("docB$ef56ab78_0", "Anna Müller absent", "{}", None, None),
        ],
        "id string, report string, metadata string, patientname string, city string",
    ).repartition(3)
    out = {
        r["id"]: r
        for r in anonymizer_postprocess(
            chunks, ["patientname", "city"]
        ).collect()
    }
    a = out["docA$ab12cd34"]
    assert a["report"] == "Anna Müller was here and met Hans Gruber"
    assert a["personal_info_list"] == ["Anna Müller", "Berlin", "Hans Gruber"]
    # masked with umlaut-variant expansion, each doc its own list
    assert a["masked_report"] == "■■■■■■■■■■■ was here and met ■■■■■■■■■■■"
    assert a["metadata"] == "{'k':'v'}"
    b = out["docB$ef56ab78"]
    assert b["personal_info_list"] == []
    assert b["masked_report"] == "Anna Müller absent"  # no leak across docs


def test_pivot_fields_j7(spark):
    from llmaix_spark.operators.extraction import pivot_fields

    raw = spark.createDataFrame(
        [
            ("c1", '{"name": "John", "age": "30"}', False),
            ("c2", '{"name": "Jane"}', False),
            ("c3", "{}", True),
        ],
        "conv_id string, parsed string, error boolean",
    )
    got = {r["conv_id"]: r for r in pivot_fields(raw, ["name", "age"]).collect()}
    assert got["c1"]["name"] == "John" and got["c1"]["age"] == "30"
    assert got["c2"]["age"] is None
    assert got["c3"]["name"] is None and got["c3"]["error"] is True


def test_infer_label_types_ann_nulls_are_dropped(spark):
    """NULLs in the ANNOTATION column are dropped (the reference keeps
    only isinstance-str values, routes.py:684): {'True','False',NULL}
    still reads as the boolean pair."""
    df = spark.createDataFrame(
        [("True",), ("False",), (None,)], ["flag"]
    )
    got = infer_label_types(df, df, ["flag"])
    # llm side has a NULL too → multiclass blocked, but boolean is
    # decided from the annotation set alone
    assert got["flag"]["label_type"] == "boolean"
    assert got["flag"]["label_classes"] == ["False", "True"]


def test_redaction_counts_null_text_yields_zero_counts(spark):
    """A NULL gt/auto/orig row contributes zero counts instead of a
    TypeError that kills the stage."""
    from llmaix_spark.operators.redaction import score_redactions

    df = spark.createDataFrame(
        [("a", "ab■d", "ab■d", "abcd"), ("b", None, None, None)],
        ["id", "gt_text", "auto_text", "orig_text"],
    )
    rows = {r["id"]: r for r in score_redactions(df).collect()}
    assert rows["a"]["tp"] == 1
    assert (rows["b"]["tp"], rows["b"]["fp"], rows["b"]["tn"], rows["b"]["fn"]) == (0, 0, 0, 0)


def test_anonymizer_ignore_short_sequences_forwarded(spark):
    """The short-sequence filter must actually reach the masking UDF."""
    from llmaix_spark.operators.anonymizer import anonymize_conversations

    t = spark.createDataFrame(
        [("c1", 0, "Jo Ab met Maximilian Grossmann", None, None)],
        "conv_id string, turn_idx int, text string, tool string, ts timestamp",
    )
    masked = {
        r["conv_id"]: r["masked_report"]
        for r in anonymize_conversations(t, ignore_short_sequences=6).collect()
    }
    # short PII (<=6 chars) survives; long PII masked
    assert "Maximilian" not in masked["c1"]
