"""Property-based tests (hypothesis) for the pure kernels.

These pin INVARIANTS rather than examples: the JSON repair round-trip,
length preservation of masking, confusion-count conservation, classwise
masking vs a literal twin of the reference loop, and total robustness of
the prometheus parser. All kernels are pure Python — no Spark session —
so hundreds of generated cases run in milliseconds."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from llmaix_spark.functions.json_repair import _is_empty_value, repair_and_parse
from llmaix_spark.functions.masking import (
    generate_classwise_dollartext,
    generate_dollartext,
    mask_text,
    replace_umlauts,
)
from llmaix_spark.functions.telemetry import parse_prometheus_text
from llmaix_spark.operators.redaction import redaction_counts

R = "■"


def _expected(d):
    # J5: empty-ish values collapse to "", everything else stringified
    # verbatim (no trim — functions/json_repair.py:80-88)
    return {k: ("" if _is_empty_value(v) else str(v)) for k, v in d.items()}


# value alphabet avoids the repair kernel's destructive classes on
# purpose: backslashes are stripped (J3), '?'/whitespace-only collapse to
# "" (J5) — those behaviours have their own example tests
_val = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                           whitelist_characters=" äöüß"),
    min_size=1, max_size=30,
).filter(lambda s: s.strip() and s.strip() != "?")
_key = st.text(alphabet="abcdefghij_", min_size=1, max_size=10)


@given(st.dictionaries(_key, _val, min_size=0, max_size=6))
@settings(max_examples=200)
def test_json_repair_roundtrip(d):
    """A well-formed LLM payload survives repair with values stringified
    and empty-ish values collapsed (reference value normalization, J5)."""
    parsed, _repaired, err = repair_and_parse(
        json.dumps(d, ensure_ascii=False)
    )
    assert err is False
    assert parsed == _expected(d)


@given(
    st.dictionaries(_key, _val, min_size=1, max_size=4),
    st.sampled_from(["<|eot_id|>", "</s>", " I hope this helps!", ""]),
)
@settings(max_examples=100)
def test_json_repair_survives_suffixes(d, suffix):
    """End markers and trailing prose (quirks the reference's tests pin)
    never change the parsed payload."""
    body = json.dumps(d, ensure_ascii=False)
    parsed, _r, err = repair_and_parse(body + suffix)
    assert err is False
    assert parsed == _expected(d)


_texttoks = st.lists(
    st.text(alphabet="abcdefgäöü", min_size=1, max_size=8),
    min_size=0, max_size=20,
)


@given(_texttoks, st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=6), max_size=4))
@settings(max_examples=200)
def test_mask_text_length_preserving(words, pii):
    text = " ".join(words)
    masked = mask_text(text, pii)
    assert len(masked) == len(text)
    # masking is monotone: adding PII items never unmasks a position
    more = mask_text(text, pii + ["abc"])
    for a, b in zip(masked, more):
        if a == "*":
            assert b == "*"


@given(
    st.text(alphabet="abc ", max_size=40),
    st.lists(st.tuples(st.integers(-5, 60), st.integers(-5, 60)), max_size=6),
)
@settings(max_examples=200)
def test_dollartext_length_preserving_any_spans(text, spans):
    assert len(generate_dollartext(text, spans)) == len(text)


@given(st.text(alphabet="aäöüÄÖÜß b", max_size=30))
@settings(max_examples=200)
def test_umlaut_translit_fixpoint(s):
    """Transliteration reaches a fixpoint in one pass (no umlauts remain,
    second application is identity)."""
    once = replace_umlauts(s)
    assert not any(u in once for u in "äöüÄÖÜß")
    assert replace_umlauts(once) == once


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["x", "y", "z"]),
            st.integers(0, 12),
            st.integers(0, 12),
        ),
        max_size=8,
    )
)
@settings(max_examples=200)
def test_classwise_dollartext_matches_reference_loop(anns):
    """Equivalence with a literal twin of the reference's
    label-outer/annotation-inner loop for arbitrary (overlapping,
    inverted, out-of-range) spans — both clamped identically."""
    text = "abcdefghij"
    annotations = [
        {"label": l, "begin": b, "end": e} for l, b, e in anns
    ]

    def twin(t, annotations, rc="■"):
        out = {}
        for label in {a["label"] for a in annotations}:
            out[label] = t
            for a in annotations:
                if a["label"] == label:
                    out[label] = generate_dollartext(
                        out[label], [(a["begin"], a["end"])], rc
                    )
        return out

    assert generate_classwise_dollartext(text, annotations) == twin(
        text, annotations
    )


@given(st.lists(st.sampled_from([R, "a", "b", " ", ","]), max_size=30))
@settings(max_examples=200)
def test_redaction_counts_conserve_positions(chars):
    """tp+fp+tn+fn == number of counted (non-special) positions, for any
    aligned (gt, auto, orig) triple."""
    orig = "".join("a" if c == R else c for c in chars)  # orig never masked
    gt = "".join(chars)
    auto = "".join(reversed(chars)) if chars else ""
    tp, fp, tn, fn = redaction_counts(gt, auto, orig)
    from llmaix_spark.operators.redaction import SKIP_CHARS

    countable = sum(1 for c in orig if c not in SKIP_CHARS)
    assert tp + fp + tn + fn == countable


@given(st.text(max_size=300))
@settings(max_examples=300)
def test_prometheus_parser_total(text):
    """The parser never raises and always yields float values, whatever
    bytes arrive from a half-started server."""
    out = parse_prometheus_text(text)
    assert all(isinstance(v, float) for v in out.values())


# --- round-3 kernels ---------------------------------------------------------


@given(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False,
              allow_infinity=False),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=300, deadline=None)
def test_round_half_up_shortest_decimal_invariant(x, dp):
    """_round_half_up must equal HALF_UP quantization of the
    shortest-decimal representation (the F.round-on-doubles contract)
    for ANY double, not just away from boundaries."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from llmaix_spark.operators.similarity import _round_half_up

    got = float(_round_half_up(np.array([x]), dp)[0])
    want = float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-dp),
                                  rounding=ROUND_HALF_UP)
    )
    assert got == want  # float == handles -0.0 vs 0.0 already


@given(st.text(max_size=30), st.text(max_size=30))
@settings(max_examples=300, deadline=None)
def test_fuzzy_twin_bounds_and_identity(a, b):
    """thefuzz twins: scores are ints in [0, 100]; a non-empty processed
    string scores 100 against itself; empty processed side scores 0."""
    from llmaix_spark.functions import fuzzy as fz

    for fn in (fz.wratio, fz.qratio):
        s = fn(a, b)
        assert isinstance(s, int) and 0 <= s <= 100
    pa = fz.full_process(a)
    if pa:
        assert fz.wratio(a, a) == 100
    else:
        assert fz.wratio(a, b) == 0


@given(
    st.dictionaries(
        st.sampled_from(["train", "val", "test", "holdout"]),
        st.floats(min_value=0.01, max_value=5.0, allow_nan=False),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=30, deadline=None)
def test_dataset_split_thresholds_partition_buckets(weights):
    """The PRODUCTION split thresholds (curation.split_thresholds — the
    exact pairs split_expr builds its CASE chain from) must tile
    [0, buckets) completely: every bucket maps to exactly one split, so
    no row is ever dropped or double-assigned, for ANY positive weight
    dict."""
    from llmaix_spark.operators.curation import split_thresholds

    pairs = split_thresholds(weights, buckets=10000)
    uppers = [u for _, u in pairs]
    assert uppers == sorted(uppers)  # monotone ⇒ CASE chain is total
    assert uppers[-1] == 10000
    assert [n for n, _ in pairs] == list(weights)
