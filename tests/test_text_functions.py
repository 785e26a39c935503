"""Scalar kernel tests — ported truth tables from the reference suites.

Sources: webapp/llm_processing/tests/test_anonymization_utils.py (empty
predicate :27-33, umlauts :36-47, PII-list parse :50-72, masking :74-87,
fuzzy criteria :139-150) and webapp/llm_processing/routes.py base-id
semantics (:1045-1057).
"""

import pytest
from pyspark.sql import functions as F

from llmaix_spark.functions import text as tx


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


# --- P1 empty predicate (reference utils.py:147-169) -------------------------

@pytest.mark.parametrize(
    "value,expected",
    [
        (None, True),
        ("", True),
        ("   ", True),
        ("?", True),
        (" ? ", True),
        ("x", False),
        ("0", False),
        ("nan", False),  # the *string* 'nan' is not empty in the reference
    ],
)
def test_is_empty_expr(spark, value, expected):
    got = _eval(spark, tx.is_empty_expr(F.lit(value).cast("string")))
    assert got == expected


def test_is_empty_numeric(spark):
    assert _eval(spark, tx.is_empty_numeric_expr(F.lit(float("nan")))) is True
    assert _eval(spark, tx.is_empty_numeric_expr(F.lit(1.5))) is False


# --- F1 umlauts (reference utils.py:12-36) -----------------------------------

@pytest.mark.parametrize(
    "value,expected",
    [
        ("Müller", "Mueller"),
        ("GRÖSSE", "GROeSSE"),
        ("Straße", "Strasse"),
        ("Ärger Öl Übung", "Aerger Oel Uebung"),
        ("plain", "plain"),
    ],
)
def test_replace_umlauts_expr(spark, value, expected):
    assert _eval(spark, tx.replace_umlauts_expr(F.lit(value))) == expected


def test_umlaut_variants(spark):
    got = _eval(spark, tx.with_umlaut_variants_expr(F.lit("Müller")))
    assert got == ["Müller", "Mueller"]
    got = _eval(spark, tx.with_umlaut_variants_expr(F.lit("Smith")))
    assert got == ["Smith"]


# --- F10 boolean coercion (reference labelannotation/routes.py:178) ----------

@pytest.mark.parametrize(
    "value,expected",
    [("true", True), ("1", True), ("Yes", True), ("JA", True), ("y", True),
     ("false", False), ("0", False), ("nein", False), ("", False)],
)
def test_boolean_coerce(spark, value, expected):
    assert _eval(spark, tx.boolean_coerce_expr(F.lit(value))) == expected


@pytest.mark.parametrize(
    ("value", "expected"),
    [
        # annotationhelper equivalence classes, case-folded
        # (reference webapp/annotationhelper/routes.py:136-137)
        ("True", True), ("ja", True), ("YES", True), ("correct", True),
        ("wahr", True), ("1", True),
        ("False", False), ("Nein", False), ("no", False), ("falsch", False),
        ("0", False),
        # outside both sets → NULL (three-valued)
        ("maybe", None), ("", None), ("y", None),
    ],
)
def test_boolean_coerce_wide(spark, value, expected):
    assert _eval(spark, tx.boolean_coerce_wide_expr(F.lit(value))) == expected


# --- P11 base-id (reference llm_processing/routes.py:1045-1057) --------------

@pytest.mark.parametrize(
    "value,expected",
    [
        ("doc$ab12cd34_0", "doc$ab12cd34"),
        ("doc$ab12cd34_17", "doc$ab12cd34"),
        ("doc$ab12cd34", "doc$ab12cd34"),
        ("doc_3", "doc_3"),  # no '$' → unchanged even with _digit suffix
        ("plain", "plain"),
    ],
)
def test_base_id_expr(spark, value, expected):
    assert _eval(spark, tx.base_id_expr(F.lit(value))) == expected


def test_report_id_short(spark):
    got = _eval(spark, tx.report_id_short_expr(F.lit("case7.pdf$ab12cd34_0")))
    assert got == "case7"


# --- F7 fuzzy token split (reference report_redaction/utils.py:421-433) ------

def test_fuzzy_tokens(spark):
    got = _eval(spark, tx.fuzzy_tokens_expr(F.lit("Jo Ann 1234 x7 Smith-Jones")))
    # 'Jo' (len 2, <4 digits) and 'x7' dropped; '1234' kept via digit rule
    assert got == ["Ann", "1234", "Smith", "Jones"]


# --- P5 id generation (deterministic; shape of input_processing:646-654) -----

def test_gen_id_deterministic(spark):
    a = _eval(spark, tx.gen_id_expr(F.lit("report1")))
    b = _eval(spark, tx.gen_id_expr(F.lit("report1")))
    assert a == b and a.startswith("report1$") and len(a.split("$")[1]) == 8


def test_scrubs(spark):
    assert _eval(spark, tx.whitespace_scrub_expr(F.lit("a\tb\nc\rd"))) == "abcd"
    assert _eval(spark, tx.quote_scrub_expr(F.lit("it's \"q\""))) == "its q"


def test_first_non_empty(spark):
    got = _eval(
        spark,
        tx.first_non_empty_expr(F.array(F.lit(""), F.lit("?"), F.lit("ok"))),
    )
    assert got == "ok"


def test_fuzzy_tokens_unicode_words(spark):
    """Java \\w is ASCII-only (landmine #3): without (?U), 'Müller'
    tokenizes as ['M','ller'], diverging from the reference's Python
    \\b\\w+\\b."""
    from llmaix_spark.functions.text import fuzzy_tokens_expr

    df = spark.createDataFrame([("Anna Müller",)], ["s"])
    [row] = df.select(fuzzy_tokens_expr(F.col("s")).alias("t")).collect()
    assert row["t"] == ["Anna", "Müller"]
