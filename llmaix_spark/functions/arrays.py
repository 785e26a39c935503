"""Array-expression helpers.

`bind_array` works around a Catalyst behaviour with higher-order
functions: referencing a computed array expression (e.g.
`split(text, ' ')` or `transform(toks, md5...)`) from inside another
lambda re-evaluates the WHOLE inner expression on every access —
`element_at(split(x), i)` inside a transform over k indices costs
O(k · |split|) instead of O(|split| + k). Binding the array once as a
lambda variable makes it a concrete per-row value:

    bind_array(arr_expr, lambda arr: transform(..., lambda i:
               element_at(arr, i)))

Observed 8-12× speedups on shingle/window constructions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_array(arr_expr: Column, fn) -> Column:
    """Evaluate `arr_expr` once per row; `fn` receives it as a bound
    lambda variable and returns any Column computed from it."""
    return F.element_at(F.transform(F.array(arr_expr), fn), 1)
