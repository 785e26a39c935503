"""Anonymization kernels — ported from the reference's test tables.

Sources: webapp/llm_processing/tests/test_anonymization_utils.py
(masking :74-87, PII-list normalize :50-72, short-sequence filter
:106-112) and test_anonymizer_postprocess.py (per-row PII isolation
:18-48, failed-report survival :51-67).
"""

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from llmaix_spark.functions import masking as mk


def test_mask_length_preserving_case_insensitive():
    # reference test_anonymization_utils.py:74-87
    got = mk.mask_text("Patient John Smith was seen", ["john", "SMITH"])
    assert got == "Patient **** ***** was seen"
    assert len(got) == len("Patient John Smith was seen")


def test_mask_skips_empty_items():
    assert mk.mask_text("abc", ["", None, "?", "b"]) == "a*c"


def test_mask_overlapping_matches():
    # finditer is non-overlapping — reference semantics (utils.py:187)
    assert mk.mask_text("aaa", ["aa"]) == "**a"


def test_convert_personal_info_list():
    # dedupe order-preserving, drop empty-ish, umlaut variants appended
    got = mk.convert_personal_info_list(
        ["Müller", "John", "Müller", "", "?", None, "John"]
    )
    # umlaut variant appended right after its source item (reference
    # add_strings_with_no_umlauts, utils.py:28-36 — interleaved order)
    assert got == ["Müller", "Mueller", "John"]


def test_replace_personal_info_short_sequence_filter():
    # reference utils.py:235-239: len <= ignore_short_sequences dropped
    got = mk.replace_personal_info(
        "ab abc", ["ab", "abc"], ignore_short_sequences=2, replacement_char="■"
    )
    assert got == "ab ■■■"


def test_replace_personal_info_fuzzy_merge():
    got = mk.replace_personal_info(
        "Jon Smith", ["Smith"], fuzzy_matches=[("Jon", 95), ("xx", 50)],
        replacement_char="■",
    )
    assert got == "■■■ ■■■■■"


def test_find_fuzzy_matches_threshold():
    # 1 edit on a 10-char word → ratio 90, kept at threshold 90;
    # 1 edit on a 4-char word → 75, dropped (reference semantics: 90 gate)
    matches = mk.find_fuzzy_matches(
        "Weissgxrber came by", ["Weissgerber"], threshold=90
    )
    assert ("Weissgxrber" in dict(matches))
    assert mk.find_fuzzy_matches("Jhon here", ["John"], threshold=90) == []


def test_find_fuzzy_matches_split_criteria():
    # tokens <3 chars and <4 digits are never used as probes
    assert mk.find_fuzzy_matches("ab ab ab", ["ab"], threshold=50) == []
    # 4+ digit tokens are probes
    got = mk.find_fuzzy_matches("1234 foo", ["1234"], threshold=90)
    assert ("1234", 100.0) in got


def test_generate_dollartext():
    # reference report_redaction/utils.py:170-184
    assert mk.generate_dollartext("abcdef", [(1, 3), (4, 6)]) == "a■■d■■"
    # out-of-range spans clamp
    assert mk.generate_dollartext("ab", [(0, 99)]) == "■■"


def test_masked_report_udf_rowwise_isolation(spark):
    """Each row masked with its *own* PII list — the anonymizer regression
    (reference test_anonymizer_postprocess.py:18-48)."""
    df = spark.createDataFrame(
        [
            ("r1", "John visited Berlin", ["John"]),
            ("r2", "John visited Berlin", ["Berlin"]),
            ("r3", "Nothing here", []),
            ("r4", None, ["x"]),
        ],
        "id string, report string, pii array<string>",
    )
    got = {
        r["id"]: r["m"]
        for r in df.select(
            "id", mk.masked_col(F.col("report"), F.col("pii")).alias("m")
        ).collect()
    }
    assert got["r1"] == "■■■■ visited Berlin"
    assert got["r2"] == "John visited ■■■■■■"
    assert got["r3"] == "Nothing here"
    assert got["r4"] is None
