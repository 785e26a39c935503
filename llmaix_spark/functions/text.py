"""Scalar text kernels as native Column expressions (JVM-side, codegen'd).

Each kernel mirrors a reference behaviour (file:line cited per function)
but is expressed with built-in pyspark.sql.functions so it stays inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- P1: empty-ish predicate -------------------------------------------------
# Reference `is_empty_string_nan_or_none` (webapp/llm_processing/utils.py:147-169):
# None, "", whitespace-only, "?" (stripped), float NaN → empty.


def is_empty_expr(col: Column) -> Column:
    """NULL, '', whitespace-only, or '?' after trim → true (strings)."""
    t = F.trim(col)
    return col.isNull() | (t == F.lit("")) | (t == F.lit("?"))


def is_empty_numeric_expr(col: Column) -> Column:
    """NULL or NaN → true (float columns)."""
    return col.isNull() | F.isnan(col)


# --- F1: umlaut transliteration ---------------------------------------------
# Reference `replace_umlauts` (webapp/llm_processing/utils.py:12-26): fixed map
# ä→ae ö→oe ü→ue Ä→Ae Ö→Oe Ü→Ue ß→ss.

_UMLAUT_MAP = [
    ("ä", "ae"),
    ("ö", "oe"),
    ("ü", "ue"),
    ("Ä", "Ae"),
    ("Ö", "Oe"),
    ("Ü", "Ue"),
    ("ß", "ss"),
]


def replace_umlauts_expr(col: Column) -> Column:
    out = col
    for uml, rep in _UMLAUT_MAP:
        out = F.replace(out, F.lit(uml), F.lit(rep))
    return out


def has_umlaut_expr(col: Column) -> Column:
    return col.rlike("[äöüÄÖÜß]")


def with_umlaut_variants_expr(col: Column) -> Column:
    """Array of [original, transliterated] when they differ, else [original].

    Mirrors `add_strings_with_no_umlauts` (webapp/llm_processing/utils.py:28-36):
    the variant is *appended*, order preserved.
    """
    translit = replace_umlauts_expr(col)
    return F.when(has_umlaut_expr(col), F.array(col, translit)).otherwise(
        F.array(col)
    )


# --- F10: boolean coercion ----------------------------------------------------
# Reference truthy set (webapp/labelannotation/routes.py:178): lowercase in
# {"true","1","yes","y","ja"}.

_TRUTHY = ["true", "1", "yes", "y", "ja"]


def boolean_coerce_expr(col: Column) -> Column:
    return F.lower(F.trim(col)).isin(_TRUTHY)


# annotationhelper's wider equivalence classes (case-folded; reference
# webapp/annotationhelper/routes.py:136-137): values outside both sets
# coerce to NULL instead of false — three-valued, unlike the
# labelannotation set above.
_TRUE_EQUIV = ["true", "ja", "yes", "correct", "wahr", "1"]
_FALSE_EQUIV = ["false", "nein", "no", "falsch", "0"]


def boolean_coerce_wide_expr(col: Column) -> Column:
    v = F.lower(F.trim(col))
    return (
        F.when(v.isin(_TRUE_EQUIV), F.lit(True))
        .when(v.isin(_FALSE_EQUIV), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


# --- P5: id generation ---------------------------------------------------------
# Reference: id = {orig_id|filename} + '$' + uuid4()[:8]
# (webapp/input_processing/routes.py:646-654). For replayability at scale we
# use a deterministic content hash instead of uuid4 — same shape, stable.


def gen_id_expr(base: Column, salt: Column | None = None) -> Column:
    payload = base if salt is None else F.concat_ws("\x00", base, salt)
    return F.concat(base, F.lit("$"), F.substring(F.sha2(payload, 256), 1, 8))


def chunk_id_expr(doc_id: Column, chunk_idx: Column) -> Column:
    """Chunked rows get `<id>_<i>` (webapp/input_processing/routes.py:707-717)."""
    return F.concat(doc_id, F.lit("_"), chunk_idx.cast("string"))


# --- P11: base-id derivation ----------------------------------------------------
# Reference `extract_base_id` (webapp/llm_processing/routes.py:1045-1057):
# strip a trailing `_<digits>` chunk suffix *after* the `$`; ids without a
# `$` or without the numeric suffix pass through unchanged.


def base_id_expr(col: Column) -> Column:
    has_dollar = col.contains("$")
    stripped = F.regexp_replace(col, r"^(.*\$.*)_\d+$", r"$1")
    return F.when(has_dollar, stripped).otherwise(col)


def report_id_short_expr(col: Column) -> Column:
    """`id.split('.pdf')[0].split('$')[0]` (webapp/labelannotation/routes.py:778-780)."""
    return F.split(F.split(col, r"\.pdf").getItem(0), r"\$").getItem(0)


# --- P7/P8: scrubs ---------------------------------------------------------------


def whitespace_scrub_expr(col: Column) -> Column:
    """Remove tab/newline/carriage-return (webapp/input_processing/routes.py:678-679)."""
    return F.regexp_replace(col, "[\t\n\r]", "")


def quote_scrub_expr(col: Column) -> Column:
    """Strip single/double quotes (webapp/input_processing/routes.py:487)."""
    return F.translate(col, "'\"", "")


# --- F7: fuzzy-token split rules ---------------------------------------------------
# Reference (webapp/report_redaction/utils.py:421-433): word tokens via
# \b\w+\b, kept when len>=3 or >=4 digits.


def fuzzy_tokens_expr(col: Column) -> Column:
    # (?U): Java \w is ASCII-only (landmine #3) — without the flag
    # 'Müller' tokenizes as ['M','ller'], diverging from the reference's
    # Python \b\w+\b (report_redaction/utils.py:429)
    toks = F.regexp_extract_all(col, F.lit(r"(?U)\w+"), 0)
    return F.filter(
        toks,
        lambda t: (F.length(t) >= 3)
        | (F.length(F.regexp_replace(t, "[^0-9]", "")) >= 4),
    )


# --- P12: first non-empty of list ----------------------------------------------------
# Reference `extract_first_non_empty_string` (webapp/labelannotation/routes.py:581-594).


def first_non_empty_expr(arr: Column) -> Column:
    """First element that isn't empty-ish (is_empty_expr generalizes the
    reference's bare `item != ""`); an exhausted array yields '' — the
    reference's `next(..., "")` default. F.get, not getItem: under ANSI
    mode getItem(0) on the empty filtered array raises
    INVALID_ARRAY_INDEX instead of returning the default (round-5 find,
    caught while building the oracle)."""
    return F.coalesce(
        F.get(F.filter(arr, lambda x: ~is_empty_expr(x)), F.lit(0)),
        F.lit(""),
    )


# --- normalization used by linking -----------------------------------------------------


def norm_surface_expr(col: Column) -> Column:
    """Canonical normalization: umlaut-fold, lowercase, squeeze whitespace."""
    return F.regexp_replace(
        F.lower(replace_umlauts_expr(F.trim(col))), r"\s+", " "
    )
