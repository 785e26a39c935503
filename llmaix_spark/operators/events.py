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


def burst_buckets(
    events: DataFrame,
    bucket_s: int = 3600,
    z_threshold: int = 2,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    out_dp: int = 4,
) -> DataFrame:
    """Per-type burst detection: time buckets whose event count sits
    more than ``z_threshold`` population standard deviations ABOVE the
    type's mean bucket count.

    Cross-engine exactness: the z² comparison is done in INTEGER
    arithmetic — with k buckets, count sum S and square-sum Q per type,
      z² > T²  ⟺  (n·k − S)² > T² · (Q·k − S²)
    so the burst gate never touches a float (no stddev ulp drift can
    flip a boundary bucket). The displayed z is then derived from the
    same integers by one bigint→double division and an IEEE sqrt —
    both correctly rounded, hence bit-identical across engines.

    Scale notes (100 TB): two map-side-combinable aggregations
    (bucket counts, then per-type moment sums); the per-type moment
    table is tiny and joins back broadcast. The decimal(38,0) squares
    hold to ~10¹⁹ bucket-count sums — beyond that, bucket coarser.
    Only non-empty buckets participate (a type's silent hours don't
    enter the mean — the operator measures burstiness of active
    periods; densify upstream if zeros should count).
    """
    e = events.select(
        F.col(type_col).alias("et"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
    ).select(
        "et",
        # integral `div` — no float quotient near bucket boundaries
        F.expr(f"us div {bucket_s * 1_000_000}").alias("bucket"),
    )
    counts = e.groupBy("et", "bucket").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n")
    )
    moments = counts.groupBy("et").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("k"),
        F.sum("n").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("decimal(38,0)").alias("q"),
    )
    j = counts.join(F.broadcast(moments), "et")
    dev = F.col("n") * F.col("k") - F.col("s")  # k·(n − mean), scaled
    var_k2 = F.col("q") * F.col("k") - F.col("s") * F.col("s")  # k²·var
    t2 = F.lit(z_threshold * z_threshold)
    return (
        j.filter((dev > 0) & (dev * dev > t2 * var_k2))
        .select(
            F.col("et").alias("event_type"),
            F.col("bucket").cast("bigint").alias("bucket"),
            F.col("n").cast("bigint").alias("n_events"),
            F.round(
                F.sqrt(
                    (dev * dev).cast("double") / var_k2.cast("double")
                ),
                out_dp,
            ).alias("z"),
        )
    )
