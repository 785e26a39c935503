"""Event-timeline analytics: ordered funnel stages.

The transcripts engine's event side (events table: user_id, ts,
event_type) feeds product-analytics consumers; the funnel — "how many
users did A, then B after A, then C after B" — is the canonical one.

Scale notes (100 TB):
- Each step is one filtered scan + one equi-join on user_id + one
  map-side-combinable min() — the step chain reuses the same user_id
  hash partitioning, so AQE coalesces the exchanges between steps.
- No windows over the whole timeline and no driver-side counts: the
  per-user reached-stage is a union of tiny (user, stage) tables
  resolved with one max() aggregation.
- Strictly-after semantics (ts_k > ts_{k-1}) use min() only, so the
  result is insensitive to event ordering within equal timestamps.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_us: int | None = None,
) -> DataFrame:
    """Count users by the deepest funnel stage reached.

    Stage k (1-based) means: the user has events matching
    steps[0..k-1] in strictly increasing timestamp order, anchored at
    the EARLIEST qualifying time of each step (min-anchoring is the
    standard conversion-funnel semantics and is order-deterministic).
    ``max_gap_us`` bounds each step-to-step gap (the conversion
    window): step k must land in (t_{k-1}, t_{k-1} + max_gap_us].
    Stage 0 = the user produced events but never steps[0].

    Returns (stage BIGINT, n_users BIGINT) — one row per non-empty
    stage.
    """
    if not steps:
        raise ValueError("funnel_stages needs at least one step")
    e = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(type_col).alias("et"),
    ).localCheckpoint(eager=False)  # one consumer per step + user universe

    reached = (
        e.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("us").alias("t"))
    )
    stage_rows = [reached.select("u", F.lit(1).alias("stage"))]
    for k, step in enumerate(steps[1:], start=2):
        in_window = F.col("us") > F.col("t")
        if max_gap_us is not None:
            in_window = in_window & (
                F.col("us") <= F.col("t") + F.lit(max_gap_us)
            )
        reached = (
            e.filter(F.col("et") == step)
            .join(reached.select("u", "t"), "u")
            .where(in_window)
            .groupBy("u")
            .agg(F.min("us").alias("t"))
        )
        stage_rows.append(reached.select("u", F.lit(k).alias("stage")))

    from functools import reduce

    users = e.select("u").distinct()
    # a user appears once per stage reached; max() is the depth
    all_stages = reduce(DataFrame.unionAll, stage_rows)
    staged = users.join(all_stages, "u", "left").groupBy("u").agg(
        F.coalesce(F.max("stage"), F.lit(0)).alias("stage")
    )
    return staged.groupBy(F.col("stage").cast("bigint").alias("stage")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
