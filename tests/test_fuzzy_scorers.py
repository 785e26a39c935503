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


# --- JVM/Python agreement band (hypothesis sweep; r3 verdict item 7) ---------
# The JVM composite's base similarity is normalized Levenshtein, the
# Python twin's is difflib 2M/T (module docstring) — a DOCUMENTED
# divergence. This sweep turns it into a MEASURED one over the domain
# the scorer runs on (short person-name surfaces: letters incl. umlauts,
# space, [.,'-]). Stated bounds, from a 1000-pair seeded sweep plus the
# generated cases here:
#
#   * py ≥ 90  ⇒  jvm ≥ py − 10   (worst observed shortfall −7.4: the
#     transposition class — Levenshtein counts a character swap as 2
#     edits where difflib's matching blocks lose ~1; this is the ONLY
#     near-gate miss class observed)
#   * py ≥ 80  ⇒  jvm ≤ py + 2    (the composite never manufactures a
#     match above the gate: worst observed overshoot +0.67; zero
#     jvm≥90-but-py<90 cases in the sweep)
#   * jvm ≥ python plain processed ratio (monotone upgrade — the
#     composite is a greatest() over the base, cross-checked against
#     the Python twin of the base formula)

from hypothesis import given, settings
from hypothesis import strategies as st

_NAME_ALPHA = "abcdefghijklmnopqrstuvwxyzäöüß .,-'"
_surface = st.text(alphabet=_NAME_ALPHA, min_size=1, max_size=24)


@st.composite
def _fuzzy_pair(draw):
    a = draw(_surface)
    kind = draw(st.integers(0, 5))
    if kind == 0:  # word reorder (the rescue class)
        b = " ".join(reversed(a.split())) or a
    elif kind == 1:  # single-char typo: sub/del/ins
        i = draw(st.integers(0, max(len(a) - 1, 0)))
        op = draw(st.integers(0, 2))
        c = draw(st.sampled_from(_NAME_ALPHA))
        b = (a[:i] + c + a[i + 1 :], a[:i] + a[i + 1 :], a[:i] + c + a[i:])[op]
    elif kind == 2:  # transposition (the known divergence class)
        i = draw(st.integers(0, max(len(a) - 2, 0)))
        b = a[:i] + a[i + 1 : i + 2] + a[i : i + 1] + a[i + 2 :]
    elif kind == 3:  # truncation/substring
        b = a[: max(1, len(a) // 2)]
    elif kind == 4:  # unrelated surface
        b = draw(_surface)
    else:
        b = a
    return a, b


@given(st.lists(_fuzzy_pair(), min_size=40, max_size=40))
@settings(max_examples=5, deadline=None, derandomize=True)
def test_wratio_jvm_python_agreement_band(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    got = df.select(
        "a", "b", fz.wratio_expr(F.col("a"), F.col("b")).alias("jvm")
    ).collect()
    for r in got:
        a, b, jvm = r["a"], r["b"], r["jvm"]
        py = fz.wratio(a, b)
        assert jvm is not None
        if py >= 90:
            assert jvm >= py - 10, (a, b, py, jvm)
        if py >= 80:
            assert jvm <= py + 2, (a, b, py, jvm)
        pa, pb = fz.full_process(a), fz.full_process(b)
        if pa and pb:
            # monotone upgrade over the (shared-formula) plain ratio
            assert jvm >= round(fz.ratio(pa, pb), 4) - 1e-6, (a, b, jvm)
