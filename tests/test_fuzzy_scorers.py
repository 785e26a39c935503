"""F6: thefuzz-faithful fuzzy scorers.

Python twins pinned to thefuzz's public WRatio/QRatio semantics
(the reference's scorer — report_redaction/utils.py:413-437, expectations
cross-checked against webapp/llm_processing/tests/test_anonymization_utils.py);
JVM composite pinned to match the reference matcher's accept/reject at the
90 gate on reordered and substring-containing surfaces.
"""

from pyspark.sql import functions as F

from llmaix_spark.functions import fuzzy as fz
from llmaix_spark.functions import masking as mk


# --- Python twins (difflib-faithful) -----------------------------------------


def test_full_process():
    # \W → space (kept, not squeezed), lower, strip — thefuzz utils.full_process
    assert fz.full_process("Dr. Anna-Meier") == "dr  anna meier"
    assert fz.full_process("  x  ") == "x"
    assert fz.full_process(None) == ""
    assert fz.full_process("Müller") == "müller"  # unicode \w kept


def test_simple_and_qratio():
    # difflib 2M/T: "john"/"jhon" share "j" + "on" → 2*3/8 = 75
    assert fz.qratio("John", "Jhon") == 75
    assert fz.qratio("john", "john") == 100
    assert fz.qratio("", "x") == 0


def test_wratio_reordered_name():
    """'Dr. Anna Meier' vs 'Meier, Anna': token_set intersection covers
    the shorter side fully → 100 * 0.95 = 95. Plain norm-Levenshtein
    scores ~31 — the round-2 verdict's silent-recall-loss case."""
    assert fz.wratio("Dr. Anna Meier", "Meier, Anna") == 95
    assert fz.ratio("dr anna meier", "meier anna") < 50


def test_wratio_substring():
    """'Anna' inside 'Annaberg': len_ratio 2 ≥ 1.5 → partial alignment
    scores 100 * 0.9 = 90 — exactly at the reference's default gate."""
    assert fz.wratio("Anna", "Annaberg") == 90
    assert fz.ratio("anna", "annaberg") == 50.0


def test_wratio_identical_and_gates():
    assert fz.wratio("john", "john") == 100
    assert fz.wratio("", "john") == 0
    # len_ratio > 8 drops the partial scale to 0.6
    assert fz.wratio("ab1", "ab1" + " filler" * 8) <= 60


def test_token_sort_and_set():
    assert fz.token_sort_ratio("great is spark", "spark is great") == 100
    assert fz.token_set_ratio("anna meier extra words", "meier anna") == 100
    # token_sort keeps duplicates, token_set collapses them
    assert fz.token_sort_ratio("a a b", "a b") < 100
    assert fz.token_set_ratio("a a b", "a b") == 100


def test_find_fuzzy_matches_wratio_rescues_reordered():
    """Probe token 'Meier' from 'Meier, Anna' must rescue the reordered
    surface's word under WRatio (partial/token logic), reference-style."""
    got = dict(mk.find_fuzzy_matches("met Dr Meier today", ["Meier, Anna"]))
    assert got.get("Meier") == 100
    # QRatio path still accepted by the scorer switch
    got_q = dict(
        mk.find_fuzzy_matches("met Dr Meier today", ["Meier, Anna"],
                              scorer="QRatio")
    )
    assert got_q.get("Meier") == 100


def test_find_fuzzy_matches_limit_five():
    """process.extract's default limit=5: the 6th equally-scoring word is
    never considered (reference utils.py:431 uses the default)."""
    text = "Abcd abcd ABCD aBcd abCd abcD"
    got = mk.find_fuzzy_matches(text, ["abcd"], threshold=90)
    assert len(got) == 5
    assert "abcD" not in dict(got)


def test_find_fuzzy_matches_invalid_scorer():
    import pytest

    with pytest.raises(ValueError, match="Invalid scorer"):
        mk.find_fuzzy_matches("x", ["abc"], scorer="nope")


# --- JVM composite at the 90 gate ---------------------------------------------

# Surfaces where the reference matcher (WRatio ≥ 90) accepts but plain
# normalized Levenshtein rejects — the linking-recall fixture from the
# round-2 verdict, plus controls that must stay rejected.
_ACCEPT = [
    ("Dr. Anna Meier", "Meier, Anna"),      # reorder + subset
    ("great is spark", "spark is great"),   # pure reorder
    ("Anna", "Annaberg"),                   # substring containment
    ("Weissgerber", "Weissgxrber"),         # 1 edit on a long token
]
_REJECT = [
    ("John", "Paul"),
    ("alpha beta", "gamma delta"),
]


def test_wratio_expr_matches_reference_gate(spark):
    rows = [(a, b, True) for a, b in _ACCEPT] + [
        (a, b, False) for a, b in _REJECT
    ]
    df = spark.createDataFrame(rows, "a string, b string, expect boolean")
    got = df.select(
        "a", "expect",
        (fz.wratio_expr(F.col("a"), F.col("b")) >= 90).alias("accepted"),
        fz.ratio_expr(F.col("a"), F.col("b")).alias("plain"),
    ).collect()
    for r in got:
        assert r["accepted"] == r["expect"], r
    # and the python twin agrees on every fixture row
    for a, b in _ACCEPT:
        assert fz.wratio(a, b) >= 90
    for a, b in _REJECT:
        assert fz.wratio(a, b) < 90


def test_jvm_exprs_null_in_null_out(spark):
    """A NULL surface must score NULL (filtered by any gate), NOT 95/100:
    concat_ws collapses a NULL token array to '' (ratio('','')=100) and
    greatest/least skip NULL operands, so without explicit guards a
    nullable join column matched EVERY candidate row (review finding)."""
    df = spark.createDataFrame(
        [(None, "anna meier"), ("anna meier", None), (None, None)],
        "a string, b string",
    )
    got = df.select(
        fz.wratio_expr(F.col("a"), F.col("b")).alias("w"),
        fz.token_sort_ratio_expr(F.col("a"), F.col("b")).alias("tsor"),
        fz.token_set_ratio_expr(F.col("a"), F.col("b")).alias("tser"),
        fz.partial_ratio_expr(F.col("a"), F.col("b")).alias("p"),
        fz.ratio_expr(F.col("a"), F.col("b")).alias("r"),
    ).collect()
    for row in got:
        for c in ("w", "tsor", "tser", "p", "r"):
            assert row[c] is None, (c, row)


def test_token_sort_expr_reorder_is_100(spark):
    df = spark.createDataFrame([("b a c", "c b a")], "a string, b string")
    r = df.select(
        fz.token_sort_ratio_expr(F.col("a"), F.col("b")).alias("s")
    ).collect()[0]
    assert r["s"] == 100.0


def test_partial_ratio_expr_window(spark):
    df = spark.createDataFrame(
        [("anna", "xxannayy"), ("abc", "abc")], "a string, b string"
    )
    got = [
        r["p"]
        for r in df.select(
            fz.partial_ratio_expr(F.col("a"), F.col("b")).alias("p")
        ).collect()
    ]
    assert got == [100.0, 100.0]
