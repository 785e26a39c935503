"""Fuzzy similarity scorers.

The reference scores candidate matches with thefuzz WRatio/QRatio at a
default threshold of 90 (webapp/report_redaction/utils.py:413-433). This
engine uses a normalized-Levenshtein ratio with the same 0-100 scale and
threshold semantics:

    ratio(a, b) = 100 * (1 - lev(a, b) / max(len(a), len(b)))

implemented (a) as a built-in Column expression (`levenshtein()` is
JVM-side, codegen'd — the hot path for the linking join) and (b) in pure
Python for the pandas-UDF fuzzy matcher and the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ratio_expr(a: Column, b: Column) -> Column:
    """0-100 normalized Levenshtein similarity, JVM-side."""
    denom = F.greatest(F.length(a), F.length(b), F.lit(1))
    return (F.lit(100.0) * (F.lit(1.0) - F.levenshtein(a, b) / denom))


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
