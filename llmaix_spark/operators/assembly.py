"""Stable-order conversation assembly (reference A1/W1).

The reference reassembles chunked documents with a pandas
`groupby('base_id').agg(' '.join)` whose correctness silently depends on
implicit row order (webapp/llm_processing/routes.py:1060-1065). Here the
ordering contract is *explicit*: `array_sort(collect_list(struct(turn_idx,
text)))` — a single map-side-combinable aggregation, one shuffle on
conv_id, no window-sort needed. This is where the north rule's "per-turn
text equality under stable ordering" invariant lives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_conversations(
    transcripts: DataFrame, sep: str = " ", keep_turns: bool = False
) -> DataFrame:
    """transcripts(conv_id, turn_idx, text, ...) → one row per conversation.

    Output: (conv_id, n_turns, conv_text [, turns array<struct>]) with
    conv_text = turn texts joined by `sep` in turn_idx order. Empty/garbage
    turns are kept verbatim (the reference joins every chunk; filtering is
    a separate, counted step — see `skip_empty`).
    """
    turns = F.array_sort(
        F.collect_list(F.struct(F.col("turn_idx"), F.col("text")))
    )
    agg = transcripts.groupBy("conv_id").agg(
        turns.alias("turns"),
        F.count(F.lit(1)).cast("int").alias("n_turns"),
    )
    out = agg.withColumn(
        "conv_text",
        F.concat_ws(sep, F.transform("turns", lambda t: t["text"])),
    )
    if not keep_turns:
        out = out.drop("turns")
    return out.select("conv_id", "n_turns", "conv_text", *(
        ["turns"] if keep_turns else []
    ))


def per_turn_equality_violations(transcripts: DataFrame) -> DataFrame:
    """North-rule invariant check: assemble → explode back → every
    (conv_id, turn_idx, text) must equal the source. Returns the
    violations DataFrame (empty ⇔ invariant holds).

    Join is 1:1 on (conv_id, turn_idx); with both sides partitioned by
    conv_id the shuffle is shared.
    """
    assembled = assemble_conversations(transcripts, keep_turns=True)
    back = assembled.select(
        "conv_id", F.explode("turns").alias("t")
    ).select(
        "conv_id",
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.text").alias("text_rt"),
    )
    src = transcripts.select("conv_id", "turn_idx", "text")
    joined = src.join(back, ["conv_id", "turn_idx"], "full_outer")
    return joined.filter(
        ~(
            F.col("text").eqNullSafe(F.col("text_rt"))
        )
    )


def skip_empty(transcripts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P2: drop empty-ish turns, but *count* them (reference counts skipped
    reports, webapp/llm_processing/routes.py:482-490). Returns
    (kept_df, skipped_count_df)."""
    from llmaix_spark.functions.text import is_empty_expr

    pred = is_empty_expr(F.col("text"))
    kept = transcripts.filter(~pred)
    skipped = transcripts.filter(pred).agg(
        F.count(F.lit(1)).alias("skipped")
    )
    return kept, skipped
