"""Fuzzy similarity scorers.

The reference scores candidate matches with thefuzz WRatio/QRatio at a
default threshold of 90 (webapp/report_redaction/utils.py:413-433).

Two families here:

Python twins (`wratio`, `qratio`, `token_sort_ratio`, `token_set_ratio`,
`partial_ratio`) — faithful to thefuzz's public semantics including
difflib SequenceMatcher ratios, full_process normalization, the 0.95 /
0.90 WRatio weights, the 1.5/8 length-ratio gates, and int rounding.
These back the row-local pandas-UDF fuzzy matcher (the path where the
reference calls WRatio) and the test oracles.

JVM Column expressions (`ratio_expr`, `token_sort_ratio_expr`,
`token_set_ratio_expr`, `partial_ratio_expr`, `wratio_expr`) — codegen'd
scorers for join gates. Their base similarity is normalized Levenshtein

    ratio(a, b) = 100 * (1 - lev(a, b) / max(len(a), len(b)))

not difflib's 2M/T (difflib is not expressible as a builtin); the two
agree at the 90-gate for the reordered/substring surfaces the composite
exists to rescue (pinned by tests/test_fuzzy_scorers.py), and the JVM
composite stays a monotone upgrade over plain `ratio_expr` — it can only
ADD recall at a fixed threshold.
"""

from __future__ import annotations

import re as _re
from difflib import SequenceMatcher

from pyspark.sql import Column
from pyspark.sql import functions as F


def ratio_expr(a: Column, b: Column) -> Column:
    """0-100 normalized Levenshtein similarity, JVM-side."""
    denom = F.greatest(F.length(a), F.length(b), F.lit(1))
    return (F.lit(100.0) * (F.lit(1.0) - F.levenshtein(a, b) / denom))


def _processed_expr(col: Column) -> Column:
    """thefuzz full_process, JVM-side: non-word chars (unicode; (?U) —
    Java \\w is ASCII-only, CLAUDE.md landmine #3) → space, lowercase,
    trim."""
    return F.trim(F.lower(F.regexp_replace(col, r"(?U)\W", " ")))


def _tokens_expr(col: Column) -> Column:
    # python str.split(): split on whitespace runs, no empty tokens
    return F.filter(F.split(col, r"\s+"), lambda t: F.length(t) > 0)


def _null_guard(a: Column, b: Column, expr: Column) -> Column:
    """NULL in → NULL out. concat_ws/greatest/least silently SKIP NULL
    operands, so without this the token composites score a NULL surface
    as ratio('','') = 100 against everything — a cross-product of
    garbage matches above any gate."""
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("double")).otherwise(
        expr
    )


def token_sort_ratio_expr(a: Column, b: Column, process: bool = True) -> Column:
    """thefuzz token_sort_ratio shape: sort the (processed) word tokens,
    rejoin, score. Rescues reordered surfaces ('Dr. Anna Meier' vs
    'Meier, Anna') that plain ratio fails at the 90 gate. NULL-safe like
    ratio_expr (the Python twin follows thefuzz and scores None as 0 —
    both fail any positive gate)."""
    raw_a, raw_b = a, b
    if process:
        a, b = _processed_expr(a), _processed_expr(b)
    sa = F.concat_ws(" ", F.array_sort(_tokens_expr(a)))
    sb = F.concat_ws(" ", F.array_sort(_tokens_expr(b)))
    return _null_guard(raw_a, raw_b, ratio_expr(sa, sb))


def token_set_ratio_expr(a: Column, b: Column, process: bool = True) -> Column:
    """thefuzz token_set_ratio shape: score the sorted token-set
    intersection against each side's intersection+remainder string, take
    the max — 100 when one surface's tokens are a subset of the other's.
    NULL-safe like ratio_expr."""
    raw_a, raw_b = a, b
    if process:
        a, b = _processed_expr(a), _processed_expr(b)
    ta = F.array_sort(F.array_distinct(_tokens_expr(a)))
    tb = F.array_sort(F.array_distinct(_tokens_expr(b)))
    sect = F.concat_ws(" ", F.array_sort(F.array_intersect(ta, tb)))
    only_a = F.concat_ws(" ", F.array_sort(F.array_except(ta, tb)))
    only_b = F.concat_ws(" ", F.array_sort(F.array_except(tb, ta)))
    s1 = F.trim(F.concat_ws(" ", sect, only_a))
    s2 = F.trim(F.concat_ws(" ", sect, only_b))
    return _null_guard(
        raw_a,
        raw_b,
        F.greatest(
            ratio_expr(sect, s1), ratio_expr(sect, s2), ratio_expr(s1, s2)
        ),
    )


def partial_ratio_expr(
    a: Column, b: Column, max_offsets: int = 64
) -> Column:
    """Best normalized-Levenshtein ratio of the shorter string against
    every equal-length substring of the longer (the rapidfuzz
    partial_ratio definition — thefuzz approximates the same alignment
    via difflib blocks). O(len_diff) levenshteins per pair, capped at
    max_offsets alignments (beyond that the stride skips positions) —
    intended for short surfaces (names), not documents."""
    from llmaix_spark.functions.arrays import bind_array

    short = F.when(F.length(a) <= F.length(b), a).otherwise(b)
    long_ = F.when(F.length(a) <= F.length(b), b).otherwise(a)
    diff = F.length(long_) - F.length(short)
    step = F.greatest(
        F.lit(1), F.ceil(diff / F.lit(max_offsets)).cast("int")
    )
    offsets = F.sequence(F.lit(0), diff, step)
    best = bind_array(
        offsets,
        lambda offs: F.array_max(
            F.transform(
                offs,
                lambda i: ratio_expr(
                    short, F.substring(long_, i + 1, F.length(short))
                ),
            )
        ),
    )
    # equal lengths → diff 0 → single offset; empty strings → ratio 100
    return _null_guard(a, b, best)


def wratio_expr(a: Column, b: Column) -> Column:
    """JVM WRatio-shaped composite (weights and gates from thefuzz):
    full-process both sides, then
      len_ratio < 1.5 : max(base, 0.95*token_sort, 0.95*token_set)
      len_ratio ≥ 1.5 : also 0.90*partial (0.60 when len_ratio > 8)
    Base similarity is normalized Levenshtein (see module docstring).
    NULL-safe like ratio_expr; empty processed sides score 0."""
    pa, pb = _processed_expr(a), _processed_expr(b)
    base = ratio_expr(pa, pb)
    tsor = token_sort_ratio_expr(pa, pb, process=False) * 0.95
    tser = token_set_ratio_expr(pa, pb, process=False) * 0.95
    len_ratio = F.greatest(F.length(pa), F.length(pb)) / F.greatest(
        F.least(F.length(pa), F.length(pb)), F.lit(1)
    )
    pscale = F.when(len_ratio > 8, F.lit(0.6)).otherwise(F.lit(0.9))
    partial = partial_ratio_expr(pa, pb) * pscale
    composite = F.when(
        len_ratio < 1.5, F.greatest(base, tsor, tser)
    ).otherwise(
        F.greatest(base, partial, tsor * pscale, tser * pscale)
    )
    guarded = F.when(
        (F.length(pa) == 0) | (F.length(pb) == 0), F.lit(0.0)
    ).otherwise(F.round(composite, 4))
    # NULL-safe like ratio_expr: length(NULL)==0 is NULL, not true, and
    # greatest() skips NULL operands — without the outer guard a NULL
    # surface scored 95 via the token composites and passed the 90 gate
    return _null_guard(a, b, guarded)


def levenshtein(a: str, b: str) -> int:
    """Plain DP Levenshtein (driver/UDF-side twin of the builtin)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def ratio(a: str, b: str) -> float | None:
    # null propagation mirrors the JVM twin (ratio_expr → NULL), instead
    # of a TypeError from len(None)
    if a is None or b is None:
        return None
    if not a and not b:
        return 100.0
    return 100.0 * (1.0 - levenshtein(a, b) / max(len(a), len(b), 1))


# --- thefuzz-faithful Python twins -------------------------------------------
# The reference's matcher is thefuzz WRatio/QRatio over full_process-ed
# tokens (report_redaction/utils.py:413-437). These reimplement the public
# thefuzz semantics from its documented behavior: difflib SequenceMatcher
# ratio (2M/T over matching blocks, NOT Levenshtein), full_process
# normalization, token sort/set composites, partial-ratio block alignment,
# the WRatio 0.95/0.90/0.60 weights and 1.5/8 length gates, and int
# rounding. Pinned against the reference's own expectations in
# tests/test_fuzzy_scorers.py.

_NON_WORD = _re.compile(r"(?u)\W")


def full_process(s) -> str:
    """thefuzz utils.full_process: non-word chars → space, lower, strip."""
    if s is None:
        return ""
    return _NON_WORD.sub(" ", str(s)).lower().strip()


def _intr(x: float) -> int:
    return int(round(x))


def _seq_ratio(a: str, b: str) -> float:
    return SequenceMatcher(None, a, b).ratio()


def simple_ratio(a: str, b: str) -> int:
    """thefuzz fuzz.ratio: difflib 2M/T, 0-100 int."""
    return _intr(100.0 * _seq_ratio(a, b))


def partial_ratio(a: str, b: str) -> int:
    """thefuzz fuzz.partial_ratio: align the shorter string at each
    matching-block offset of the longer, best windowed ratio."""
    shorter, longer = (a, b) if len(a) <= len(b) else (b, a)
    if not longer:
        return 100
    blocks = SequenceMatcher(None, shorter, longer).get_matching_blocks()
    scores = []
    for block in blocks:
        start = max(block[1] - block[0], 0)
        window = longer[start : start + len(shorter)]
        r = _seq_ratio(shorter, window)
        if r > 0.995:
            return 100
        scores.append(r)
    return _intr(100.0 * max(scores))


def _sorted_tokens(s: str) -> str:
    return " ".join(sorted(s.split())).strip()


def token_sort_ratio(a: str, b: str, process: bool = True) -> int:
    if process:
        a, b = full_process(a), full_process(b)
    return simple_ratio(_sorted_tokens(a), _sorted_tokens(b))


def token_set_ratio(a: str, b: str, process: bool = True) -> int:
    if process:
        a, b = full_process(a), full_process(b)
    ta, tb = set(a.split()), set(b.split())
    sect = " ".join(sorted(ta & tb))
    s1 = (sect + " " + " ".join(sorted(ta - tb))).strip()
    s2 = (sect + " " + " ".join(sorted(tb - ta))).strip()
    return max(
        simple_ratio(sect, s1),
        simple_ratio(sect, s2),
        simple_ratio(s1, s2),
    )


def qratio(a, b) -> int:
    """thefuzz fuzz.QRatio: full_process then plain ratio; 0 on an empty
    processed side."""
    pa, pb = full_process(a), full_process(b)
    if not pa or not pb:
        return 0
    return simple_ratio(pa, pb)


def wratio(a, b) -> int:
    """thefuzz fuzz.WRatio: weighted max of plain / partial / token_sort /
    token_set ratios with the 1.5 and 8 length-ratio gates."""
    pa, pb = full_process(a), full_process(b)
    if not pa or not pb:
        return 0
    base = float(simple_ratio(pa, pb))
    len_ratio = max(len(pa), len(pb)) / min(len(pa), len(pb))
    unbase_scale = 0.95
    if len_ratio < 1.5:
        tsor = token_sort_ratio(pa, pb, process=False) * unbase_scale
        tser = token_set_ratio(pa, pb, process=False) * unbase_scale
        return _intr(max(base, tsor, tser))
    partial_scale = 0.6 if len_ratio > 8 else 0.9
    partial = partial_ratio(pa, pb) * partial_scale
    ptsor = token_sort_ratio(pa, pb, process=False) * unbase_scale * partial_scale
    ptser = token_set_ratio(pa, pb, process=False) * unbase_scale * partial_scale
    return _intr(max(base, partial, ptsor, ptser))
