"""Survival analysis over the event timeline: Kaplan-Meier estimator.

Time-to-event ("how long from signup until the first qualifying
purchase, accounting for users we stop observing") is the canonical
censored-duration question product/medical analytics ask of an event
log; the reference's cohort consumers (LLMAIx evaluates per-patient
outcome timelines) map onto exactly this shape.

Cross-engine determinism (the alignment rules this module leans on —
see plans/queries.py header):
- Durations are exact integer hours: microsecond epoch differences with
  integer division, never float date math.
- The at-risk table (n_risk, n_death, n_censored per duration) is pure
  BIGINT arithmetic.
- Each step factor 1 - d/n is ONE correctly-rounded IEEE division plus
  one exact subtraction, and the survival curve is the LEFT FOLD of
  those factors in duration order (Spark `aggregate()` seeded 1.0 ==
  DuckDB `list_reduce` seeded with the first element, since 1.0*x is
  exact) — bit-identical products, rounded once at the end.

Scale notes (100 TB):
- The subject table is one row per user (two filtered scans + two
  map-side-combinable min() aggregates joined on user_id).
- The curve itself has bounded cardinality — one row per distinct
  duration, capped by the observation window in hours (NOT by data
  size) — so the unpartitioned cumulative window over it is a
  constant-size final stage at any SF, same class as the 168-row
  dow_hour matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_US_PER_HOUR = 3_600_000_000


def kaplan_meier(
    events: DataFrame,
    origin_type: str = "signup",
    event_type: str = "purchase",
    value_floor: float = 120.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    out_dp: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival curve of hours from a user's first
    `origin_type` event to their first qualifying `event_type` event
    (2dp-rounded value >= value_floor, at or after the origin); users
    with no qualifying event are right-censored at the corpus's last
    observed timestamp.

    Returns one row per distinct duration:
      duration_h, n_risk, n_death, n_censored, survival (out_dp dp).
    """
    e = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(type_col).alias("ty"),
        F.round(F.col(value_col), 2).alias("v2"),
    )
    tmax = e.agg(F.max("us").alias("tmax"))
    # 2 consumers (death's origin-gate join + the subjects left join) —
    # checkpoint or the per-user min re-aggregates twice (landmine #1)
    origin = (
        e.where(F.col("ty") == origin_type)
        .groupBy("u")
        .agg(F.min("us").alias("t0"))
        .localCheckpoint(eager=False)
    )
    death = (
        e.where(
            (F.col("ty") == event_type) & (F.col("v2") >= F.lit(value_floor))
        )
        .join(origin, "u")
        .where(F.col("us") >= F.col("t0"))
        .groupBy("u")
        .agg(F.min("us").alias("tp"))
    )
    subjects = (
        origin.join(death, "u", "left")
        .crossJoin(F.broadcast(tmax))
        .select(
            "u",
            F.expr(
                f"(coalesce(tp, tmax) - t0) div {_US_PER_HOUR}"
            )
            .cast("bigint")
            .alias("duration_h"),
            F.col("tp").isNotNull().cast("bigint").alias("obs"),
        )
    ).localCheckpoint(eager=False)  # consumers: total + the curve base
    total = subjects.agg(F.count(F.lit(1)).alias("n_total"))
    base = subjects.groupBy("duration_h").agg(
        F.sum("obs").cast("bigint").alias("n_death"),
        (F.count(F.lit(1)) - F.sum("obs")).cast("bigint").alias("n_censored"),
    )
    # Bounded-cardinality final stage: one row per distinct duration
    # (<= observation window in hours), so the global window is safe.
    w = Window.orderBy("duration_h")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stepped = base.crossJoin(F.broadcast(total)).select(
        "duration_h",
        "n_death",
        "n_censored",
        (
            F.col("n_total")
            - (
                F.sum(F.col("n_death") + F.col("n_censored")).over(wcum)
                - (F.col("n_death") + F.col("n_censored"))
            )
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    factor = F.lit(1.0) - F.col("n_death").cast("double") / F.col(
        "n_risk"
    ).cast("double")
    folded = stepped.select(
        "duration_h",
        "n_risk",
        "n_death",
        "n_censored",
        F.collect_list(factor).over(wcum).alias("_facs"),
    )
    surv = F.expr(
        "aggregate(_facs, CAST(1.0 AS DOUBLE), (a, x) -> a * x)"
    )
    return folded.select(
        "duration_h",
        "n_risk",
        "n_death",
        "n_censored",
        F.round(surv, out_dp).alias("survival"),
    )
