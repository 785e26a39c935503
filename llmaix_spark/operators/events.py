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

import math

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
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


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    out_dp: int = 6,
) -> DataFrame:
    """First-order Markov transition counts and probabilities between
    consecutive event types on each user's timeline.

    One lead() window per user (ordered by (ts, event_id) — total, so
    deterministic under timestamp ties), one map-side-combinable pair
    count, and the per-source normalizer derived FROM the pair table
    (tiny) and joined back broadcast. p is a single bigint/bigint
    division (correctly rounded double, identical cross-engine).
    """
    w = Window.partitionBy("u").orderBy("us", "eid")
    pairs = (
        events.select(
            F.col(user_col).alias("u"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
            F.col(id_col).alias("eid"),
            F.col(type_col).alias("src"),
        )
        .select("u", "src", F.lead("src").over(w).alias("dst"))
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("src").agg(F.sum("n").alias("tot"))
    return pairs.join(F.broadcast(totals), "src").select(
        "src",
        "dst",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.col("tot"), out_dp).alias("p"),
    )


def cohort_retention(
    events: DataFrame,
    period_s: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    out_dp: int = 6,
) -> DataFrame:
    """Cohort retention: users grouped by their first-activity period;
    for each later period offset, the fraction of the cohort active.

    Two map-side-combinable aggregations (per-user first period from
    the distinct (user, period) activity table; then per
    (cohort, offset) distinct-user counts) plus a broadcast join of
    the (tiny) cohort-size table. Offset 0 is the cohort itself
    (rate 1.0 by construction). All counts are integers; the rate is
    one bigint division.
    """
    active = (
        events.select(
            F.col(user_col).alias("u"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        )
        .select("u", F.expr(f"us div {period_s * 1_000_000}").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)  # consumers: cohorts, activity join
    )
    cohorts = active.groupBy("u").agg(F.min("p").alias("p0"))
    sizes = cohorts.groupBy("p0").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    joined = active.join(cohorts, "u").groupBy(
        "p0", (F.col("p") - F.col("p0")).alias("offset")
    ).agg(F.count(F.lit(1)).alias("n_active"))
    return joined.join(F.broadcast(sizes), "p0").select(
        F.col("p0").cast("bigint").alias("cohort_period"),
        F.col("offset").cast("bigint").alias("offset"),
        F.col("n_active").cast("bigint").alias("n_active"),
        F.col("n_cohort").cast("bigint").alias("n_cohort"),
        F.round(F.col("n_active") / F.col("n_cohort"), out_dp).alias(
            "retention"
        ),
    )


def ohlc_buckets(
    events: DataFrame,
    bucket_s: int = 86400,
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    out_dp: int = 2,
) -> DataFrame:
    """Open/high/low/close downsampling of the event value series per
    (type, time bucket) — the timeseries rollup a monitoring consumer
    reads instead of raw events.

    One map-side-combinable aggregate: open/close are min/max over a
    (us, event_id, value) struct — the struct's lexicographic order
    makes first/last deterministic under timestamp ties (event_id is
    the tiebreak) with NO window and no second pass; high/low/volume
    are plain min/max/count. Value sums ride bigint cents.
    """
    e = events.select(
        F.col(type_col).alias("et"),
        F.col(value_col).alias("v"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(id_col).alias("eid"),
    ).select(
        "et",
        "v",
        "us",
        "eid",
        F.expr(f"us div {bucket_s * 1_000_000}").alias("bucket"),
    )
    first = F.min(F.struct("us", "eid", "v"))
    last = F.max(F.struct("us", "eid", "v"))
    return e.groupBy("et", "bucket").agg(
        first["v"].alias("open_raw"),
        last["v"].alias("close_raw"),
        F.max("v").alias("high_raw"),
        F.min("v").alias("low_raw"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.round(F.col("v") * 100, 0).cast("bigint")).alias("cents"),
    ).select(
        F.col("et").alias("event_type"),
        F.col("bucket").cast("bigint").alias("bucket"),
        F.round("open_raw", out_dp).alias("open"),
        F.round("high_raw", out_dp).alias("high"),
        F.round("low_raw", out_dp).alias("low"),
        F.round("close_raw", out_dp).alias("close"),
        "n_events",
        F.round(F.col("cents") / 100.0, 2).alias("total_value"),
    )


def running_totals(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    out_dp: int = 2,
) -> DataFrame:
    """Per-user running total of event value plus the step delta —
    one window pass on (ts, event_id) per user; the cumulative sum
    rides bigint cents so every prefix is integer-exact cross-engine
    (a double running sum would drift order-dependently)."""
    w = Window.partitionBy("u").orderBy("us", "eid")
    e = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(id_col).alias("eid"),
        F.round(F.col(value_col) * 100, 0).cast("bigint").alias("cents"),
    )
    run = F.sum("cents").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    prev = F.lag("cents").over(w)
    return e.select(
        F.col("eid").cast("bigint").alias("event_id"),
        F.col("u").alias("user_id"),
        F.round(run / 100.0, out_dp).alias("running_total"),
        F.round((F.col("cents") - prev) / 100.0, out_dp).alias("delta"),
    )


def ewma_exact(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    depth: int = 16,
    out_dp: int = 6,
) -> DataFrame:
    """Per-event exponentially-weighted moving average with alpha=1/2
    over the last `depth` observations of the same user — the smoothing
    a monitoring/trend consumer applies, made integer-exact.

    A textbook streaming EWMA (s = alpha*x + (1-alpha)*s_prev) is a
    chain of double multiplies whose rounding depends on history length,
    so no two engines agree at the last ulp. Truncating the window at
    `depth` rows and using the dyadic weight 2^j (newest heaviest) makes
    the numerator a pure BIGINT Horner fold over the frame —
    acc*2+cents — and the denominator (2^m - 1)*100 an exact small
    integer, so the ONLY floating-point step is one correctly-rounded
    IEEE division that is bit-identical cross-engine.

    One window pass per user on (ts, id): collect_list over a
    rows-frame is frame-ordered, reverse() flips it newest-first, and
    aggregate() folds JVM-side — no shuffle beyond the user_id
    partitioning, no UDF. Numerator bound: |cents| <= ~2^17 with
    depth=16 keeps the fold under 2^33, far inside both BIGINT and
    exact-double range.
    """
    w = (
        Window.partitionBy("u")
        .orderBy("us", "eid")
        .rowsBetween(-(depth - 1), 0)
    )
    e = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(id_col).alias("eid"),
        F.round(F.col(value_col) * 100, 0).cast("bigint").alias("cents"),
    )
    arr = F.collect_list("cents").over(w)
    witharr = e.select("u", "eid", arr.alias("arr"))
    num = F.expr(
        "aggregate(reverse(arr), CAST(0 AS BIGINT), (acc, x) -> acc * 2 + x)"
    )
    den = (
        F.expr("shiftleft(CAST(1 AS BIGINT), size(arr))") - F.lit(1)
    ) * F.lit(100)
    return witharr.select(
        F.col("eid").cast("bigint").alias("event_id"),
        F.col("u").alias("user_id"),
        F.size("arr").cast("bigint").alias("window_n"),
        F.round(num.cast("double") / den.cast("double"), out_dp).alias(
            "ewma"
        ),
    )


def time_weighted_avg(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    out_dp: int = 6,
) -> DataFrame:
    """Per-user time-weighted average value (TWAP): each observation
    holds until the next one, so the mean weights each value by its
    holding duration — the IoT/financial downsample a plain avg() gets
    wrong whenever sampling is irregular.

    One lead() window per user on (ts, id) gives the holding interval
    dt in exact microseconds; dt·cents products stay in BIGINT
    (|dt| ≤ years ~ 3e13 µs × cents ≤ 1e5 < 2^63) and their per-user
    sums ride DECIMAL(38,0) — exact, order-invariant, cross-engine
    (DuckDB sums BIGINT into HUGEINT). The final division is the only
    floating-point step. Users with a single event (no interval) drop
    out — there is nothing to weight.
    """
    w = Window.partitionBy("u").orderBy("us", "eid")
    e = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(id_col).alias("eid"),
        F.round(F.col(value_col) * 100, 0).cast("bigint").alias("cents"),
    )
    stepped = e.select(
        "u",
        "cents",
        (F.lead("us").over(w) - F.col("us")).alias("dt"),
    ).where(F.col("dt").isNotNull())
    agg = stepped.groupBy("u").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum((F.col("dt") * F.col("cents")).cast("decimal(38,0)")).alias(
            "_wsum"
        ),
        F.sum(F.col("dt").cast("decimal(38,0)")).alias("_tsum"),
    )
    return agg.where(F.col("_tsum") > 0).select(
        F.col("u").alias("user_id"),
        "n_intervals",
        F.round(
            F.col("_wsum").cast("double")
            / F.col("_tsum").cast("double")
            / 100.0,
            out_dp,
        ).alias("twap"),
    )


def rolling_active_users(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """DAU plus trailing-``window_days`` distinct active users per day
    — the WAU/MAU engagement metric. Distinct counts are not additive,
    so the naive plan is a GLOBAL range window over days (one
    partition = one task at any scale). Instead each distinct
    (day, user) row is exploded into the ``window_days`` report days
    it contributes to — a map-side ×W fanout that keeps the whole job
    as two hash aggregates partitioned by day, fully parallel.

    Returns (day DATE, dau, active_w) for every day present in the
    input; a report day counts contributions only from observed days
    (no zero-fill for silent days).
    """
    if window_days < 1:
        raise ValueError("rolling_active_users needs window_days >= 1")
    du = (
        events.select(
            F.datediff(
                F.to_date(F.col(ts_col).cast("timestamp")),
                F.lit("1970-01-01").cast("date"),
            ).alias("dayn"),
            F.col(user_col).alias("u"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # consumers: dau, contrib, days
    )
    dau = du.groupBy("dayn").agg(
        F.countDistinct("u").cast("bigint").alias("dau")
    )
    contrib = du.select(
        F.explode(
            F.sequence(
                F.col("dayn"), F.col("dayn") + F.lit(window_days - 1)
            )
        ).alias("dayn"),
        "u",
    )
    act = contrib.groupBy("dayn").agg(
        F.countDistinct("u").cast("bigint").alias("active_w")
    )
    return (
        dau.join(act, "dayn")  # inner: act covers every observed day
        .select(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("dayn"))
            .alias("day"),
            "dau",
            "active_w",
        )
    )


def cusum_alarms(
    events: DataFrame,
    alarm_threshold: int = 50_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user one-sided CUSUM changepoint monitor: S_0 = 0,
    S_i = max(0, S_{i-1} + x_i - k) over the user's events in (ts, id)
    order, where x_i is the exact bigint-cents value and the drift
    allowance k is the global floor-mean cents (one scalar aggregate,
    broadcast). Emits per user the peak statistic, the number of alarm
    points (S_i > alarm_threshold), and the final state — the batch
    twin of the streaming quality monitor that flags upward shifts in
    spend/latency.

    The recursion S_i = f(S_{i-1}) is not a prefix sum, so no window
    can express it; it IS a sequential left fold, which `aggregate()`
    runs JVM-side over the frame-ordered per-user array. All arithmetic
    is BIGINT (exact at any SF: |S| <= n_events * max_cents), so the
    result is bit-identical to the DuckDB recursive-CTE oracle.

    Scale notes: one hash aggregate (collect_list per user) — the
    per-user array is bounded by a user's event count, the same
    cardinality any sessionization holds in one task; no global sort,
    no driver loop, no UDF.
    """
    e = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(id_col).alias("eid"),
        F.round(F.col(value_col) * 100, 0).cast("bigint").alias("cents"),
    )
    k = e.agg(
        F.expr("sum(cents) div count(*)").cast("bigint").alias("drift_k")
    )
    seqs = e.groupBy("u").agg(
        F.array_sort(
            F.collect_list(F.struct("us", "eid", "cents"))
        ).alias("seq")
    )
    step = "greatest(CAST(0 AS BIGINT), acc.s + x.cents - drift_k)"
    folded = F.expr(
        "aggregate(seq, "
        "named_struct('s', CAST(0 AS BIGINT), 'mx', CAST(0 AS BIGINT), "
        "'al', CAST(0 AS BIGINT)), "
        f"(acc, x) -> named_struct('s', {step}, "
        f"'mx', greatest(acc.mx, {step}), "
        f"'al', acc.al + IF({step} > CAST({int(alarm_threshold)} AS BIGINT), "
        "CAST(1 AS BIGINT), CAST(0 AS BIGINT))))"
    )
    return (
        seqs.crossJoin(F.broadcast(k))
        .select(
            F.col("u").alias("user_id"),
            F.size("seq").cast("bigint").alias("n_events"),
            "drift_k",
            folded.alias("_st"),
        )
        .select(
            "user_id",
            "n_events",
            "drift_k",
            F.col("_st.mx").alias("max_s"),
            F.col("_st.al").alias("n_alarms"),
            F.col("_st.s").alias("final_s"),
        )
    )


def attribute_last_touch(
    events: DataFrame,
    conversion_type: str = "purchase",
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Last-touch marketing attribution: each conversion event is
    credited to the user's most recent PRIOR non-conversion event
    within `window_days` ('direct' when none); emits conversions and
    exact bigint-cents revenue per channel.

    One window pass per user on the unique (ts, id) order: last()
    IGNORE NULLS over rows [unbounded, -1] carries the latest touch
    struct forward, the lookback gate compares exact microsecond
    epochs, and the channel aggregate is map-side combinable. No
    self-join, no UDF; the user_id hash partitioning is the only
    shuffle before the final small aggregate.
    """
    w = (
        Window.partitionBy("u")
        .orderBy("us", "eid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("ty"),
        F.round(F.col(value_col) * 100, 0).cast("bigint").alias("cents"),
    )
    touch = F.last(
        F.when(
            F.col("ty") != conversion_type,
            F.struct(F.col("us").alias("tus"), F.col("ty").alias("tty")),
        ),
        ignorenulls=True,
    ).over(w)
    lookback_us = window_days * 86_400_000_000
    tagged = e.select("u", "us", "ty", "cents", touch.alias("tch"))
    channel = F.when(
        F.col("tch").isNull()
        | (F.col("us") - F.col("tch.tus") > F.lit(lookback_us)),
        F.lit("direct"),
    ).otherwise(F.col("tch.tty"))
    return (
        tagged.where(F.col("ty") == conversion_type)
        .select(channel.alias("channel"), "cents")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
            F.sum("cents").cast("bigint").alias("attributed_cents"),
        )
    )


def event_trigrams(
    events: DataFrame,
    n_top: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Top event-type trigrams (the sequential-pattern-mining step a
    behavior model starts from): consecutive (t1, t2, t3) triples per
    user on the unique (ts, id) order, counted corpus-wide, top
    ``n_top`` with the full (count DESC, t1, t2, t3) tie-break so the
    cut is deterministic.

    One window pass per user (two lead() on the same sort — a single
    Sort + Window in the plan), a map-side-combinable count, then
    TakeOrderedAndProject for the top-k (never a global sort)."""
    w = Window.partitionBy("u").orderBy("us", "eid")
    e = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("t1"),
    )
    tri = e.select(
        "t1",
        F.lead("t1", 1).over(w).alias("t2"),
        F.lead("t1", 2).over(w).alias("t3"),
    ).where(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        tri.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(n_top)
    )


def debounce_events(
    events: DataFrame,
    gap_hours: int = 12,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user event throttle with LAST-KEPT semantics: an event is
    kept iff at least ``gap_hours`` have passed since the previous
    KEPT event (the first always survives) — the dedup/rate-limit a
    notification or billing pipeline applies. Unlike sessionize's
    lag-gap, the reference point is the last *survivor*, which makes
    this a true sequential recursion (a burst of closely spaced
    events must all compare against one anchor, not each other).

    Folded JVM-side over the per-user frame-ordered array with a
    (last_kept_us, kept_ids) accumulator — pure BIGINT comparisons,
    bit-identical to the DuckDB recursive-CTE oracle. Emits one row
    per kept event: (user_id, event_id, kept_rank).

    Scale notes: one hash aggregate (collect_list per user — the
    sessionization cardinality), posexplode back out; no window, no
    UDF, no driver loop.
    """
    gap_us = int(gap_hours) * 3_600_000_000
    e = events.select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(id_col).cast("bigint").alias("eid"),
    )
    seqs = e.groupBy("u").agg(
        F.array_sort(F.collect_list(F.struct("us", "eid"))).alias("seq")
    )
    kept = F.expr(
        "aggregate(seq, "
        # sentinel -2^62 (NOT Long.MIN: x.us - MIN overflows under ANSI)
        "named_struct('last', CAST(-4611686018427387904 AS BIGINT), "
        "             'ids', CAST(array() AS ARRAY<BIGINT>)), "
        f"(acc, x) -> IF(x.us - acc.last >= CAST({gap_us} AS BIGINT), "
        "  named_struct('last', x.us, "
        "               'ids', array_append(acc.ids, x.eid)), acc), "
        "acc -> acc.ids)"
    )
    return seqs.select(
        F.col("u").alias("user_id"), F.posexplode(kept).alias("pos", "event_id")
    ).select(
        "user_id",
        "event_id",
        (F.col("pos") + 1).cast("bigint").alias("kept_rank"),
    )


def stationary_distribution(
    events: DataFrame,
    iterations: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    out_dp: int = 6,
) -> DataFrame:
    """Stationary distribution of the first-order event-type Markov
    chain via fixed-iteration power iteration over the (tiny,
    dimension-bounded) transition-count matrix.

    Partition-invariance discipline: the state vector lives in BIGINT
    nano-probability units. Each contribution term is rounded to a
    bigint BEFORE summation (bigint sums commute exactly), and each
    iteration renormalizes to 1e9 via one 1-row aggregate broadcast —
    so the result is bit-identical at any shuffle.partitions and
    matches the unrolled DuckDB oracle term for term. States that
    never occur as a transition target decay to mass 0 (documented:
    no damping/restart — this is the raw chain, not PageRank).

    Scale: ONE lead() window over the events table (partitioned by
    user — parallel), one map-side pair count; every iteration then
    touches only the K^2 transition table (K = |event types|, a
    dimension), localCheckpointed once so the event scan never
    re-executes.
    """
    w = Window.partitionBy("u").orderBy("us", "eid")
    pairs = (
        events.select(
            F.col(user_col).alias("u"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
            F.col(id_col).alias("eid"),
            F.col(type_col).alias("src"),
        )
        .select("u", "src", F.lead("src").over(w).alias("dst"))
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = pairs.groupBy("src").agg(F.sum("n").alias("tot"))
    p = pairs.join(F.broadcast(tot), "src").select(
        "src", "dst", (F.col("n") / F.col("tot")).alias("p")
    )
    states = (
        events.select(F.col(type_col).alias("state")).distinct()
    )
    # K^2 rows — cut the event-scan lineage so the loop never re-reads
    p = p.localCheckpoint(eager=True)
    states = states.localCheckpoint(eager=True)
    k = states.count()
    # floor(x + 0.5), not Python round(): the oracle's round() is
    # half-away-from-zero while Python's is half-to-even
    v = states.select(
        "state",
        F.lit(int(math.floor(1e9 / k + 0.5))).cast("bigint").alias("nano"),
    )
    for _ in range(iterations):
        raw = (
            p.join(v, p["src"] == v["state"])
            .select(
                F.col("dst"),
                F.round(F.col("nano") * F.col("p"), 0)
                .cast("bigint")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("raw"))
        )
        mass = raw.agg(F.sum("raw").alias("m"))
        v = (
            states.join(raw, states["state"] == raw["dst"], "left")
            .crossJoin(F.broadcast(mass))
            .select(
                "state",
                F.round(
                    F.coalesce(F.col("raw"), F.lit(0)) * (1e9 / F.col("m")), 0
                )
                .cast("bigint")
                .alias("nano"),
            )
        )
    # integer-space final rounding — round(nano/1e9, dp) on a double
    # diverges across engines on half-ties (Spark BigDecimal HALF_UP
    # vs DuckDB double rounding); (nano + half) div scale is exact
    scale = 10 ** (9 - out_dp)
    return v.select(
        "state",
        (
            F.expr(f"(nano + {scale // 2}) div {scale}")
            / F.lit(float(10**out_dp))
        ).alias("stationary_p"),
    )


def eventually_follows(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Process-mining eventually-follows matrix: for each ordered type
    pair (a, b), how many users have SOME b strictly after their FIRST
    a — the reachability view events_transitions' direct-follows
    (adjacent-only) summary can't answer. b-after-first-a reduces to
    one tuple comparison per (user, a, b): last(b) > first(a) under
    the total (ts, event_id) order, so no per-pair scan is needed.

    Scale: one window over (user, type) — parallel partitions — folds
    each user×type group to a single first/last row; the self-join
    runs at that bounded grain (≤ |types| rows per user). The
    |types|-row denominator table broadcasts back.
    """
    w = Window.partitionBy("u", "t").orderBy("us", "eid")
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"),
        F.col(id_col).alias("eid"),
    )
    ranked = base.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("u", "t").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    st = ranked.groupBy("u", "t").agg(
        F.max(F.when(F.col("rn") == 1, F.col("us"))).alias("f_us"),
        F.max(F.when(F.col("rn") == 1, F.col("eid"))).alias("f_eid"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("us"))).alias("l_us"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("eid"))).alias("l_eid"),
    )
    na = st.groupBy("t").agg(F.count(F.lit(1)).cast("bigint").alias("n_a"))
    a = st.select(
        F.col("u"), F.col("t").alias("ta"),
        F.col("f_us"), F.col("f_eid"),
    )
    b = st.select(
        F.col("u").alias("ub"), F.col("t").alias("tb"),
        F.col("l_us"), F.col("l_eid"),
    )
    ef = (F.col("l_us") > F.col("f_us")) | (
        (F.col("l_us") == F.col("f_us")) & (F.col("l_eid") > F.col("f_eid"))
    )
    pairs = (
        a.join(b, (F.col("u") == F.col("ub")) & (F.col("ta") != F.col("tb")))
        .groupBy("ta", "tb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users_both"),
            F.sum(ef.cast("bigint")).cast("bigint").alias("n_ef"),
        )
    )
    return (
        pairs.join(F.broadcast(na), pairs["ta"] == na["t"])
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.col("n_a").alias("n_users_a"),
            "n_users_both",
            "n_ef",
            F.round(F.col("n_ef") * 1.0 / F.col("n_a"), 6).alias("ef_share"),
        )
    )
