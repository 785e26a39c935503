"""Text chunking (P9) — deterministic word-group splitting.

The reference splits documents into ≤N-char chunks at word boundaries
with a greedy accumulator (webapp/input_processing/routes.py:689-721) —
inherently sequential. The distributed recast uses fixed word-count
groups (chunk i = words [i*k, (i+1)*k)): same round-trip guarantee
(chunks rejoin to the original text), but closed-form — every chunk
boundary computable independently, so the operator is a narrow
projection with zero shuffle and is expressible in ANSI SQL for the
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_by_words(
    df: DataFrame,
    words_per_chunk: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text) → (conv_id, turn_idx, text): one row per chunk of
    `words_per_chunk` space-separated words, order-preserving."""
    from llmaix_spark.functions.arrays import bind_array

    # NULL text → one empty chunk, not a silently-vanished document
    # (posexplode over a NULL array emits zero rows; dropping is
    # skip_empty's counted job, not an uncounted side effect here)
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    k = words_per_chunk
    chunks = bind_array(
        toks,
        lambda t: F.transform(
            F.sequence(F.lit(0), F.ceil(F.size(t) / k).cast("int") - 1),
            lambda i: F.concat_ws(" ", F.slice(t, i * k + 1, k)),
        ),
    )
    return df.select(
        F.col(id_col).cast("string").alias("conv_id"),
        F.posexplode(chunks).alias("turn_idx", "text"),
    )


def reassemble(chunked: DataFrame, sep: str = " ") -> DataFrame:
    """Inverse of chunk_by_words: (conv_id, n_turns, conv_text) with
    chunks rejoined in turn order — the A1 aggregation."""
    from llmaix_spark.operators.assembly import assemble_conversations

    return assemble_conversations(chunked, sep=sep)
