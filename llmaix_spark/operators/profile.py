"""One-pass table profiling (the data-quality step a curation
pipeline runs before trusting a new drop of 100 TB): per column —
null count, exact distinct count, min/max (numeric and string kept in
typed fields).

Plan shape: ONE aggregate over the table produces a single wide row
(all per-column statistics as separate aggregate expressions — the
multiple count(DISTINCT) compile to one Expand + partial aggregation,
so the input is still scanned exactly once), then a driver-free
``stack`` unpivots the row into one row per column. At 100 TB the
exact-distinct Expand multiplies shuffle rows by the number of
profiled columns; for a quick look, swap ``exact_distinct=False`` to
approx_count_distinct (single pass, no Expand, ~2% HLL error — not
oracle-comparable, which is why the oracled query keeps exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``. Returns one row
    per column: (column_name, n_rows, n_nulls, n_distinct, min_num,
    max_num, min_str, max_str) — numeric columns fill the *_num pair
    (as DOUBLE), everything else the *_str pair; the unused pair is
    typed NULL."""
    fields = [
        (f.name, isinstance(f.dataType, NumericType))
        for f in df.schema.fields
        if columns is None or f.name in columns
    ]
    if not fields:
        raise ValueError("profile_columns: no columns selected")

    distinct_agg = F.countDistinct if exact_distinct else (
        lambda c: F.approx_count_distinct(c)
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__rows")]
    for name, is_num in fields:
        c = F.col(name)
        aggs.append(
            F.sum(F.when(c.isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"{name}__nulls")
        )
        aggs.append(
            distinct_agg(c).cast("bigint").alias(f"{name}__distinct")
        )
        if is_num:
            aggs.append(F.min(c).cast("double").alias(f"{name}__minn"))
            aggs.append(F.max(c).cast("double").alias(f"{name}__maxn"))
        else:
            aggs.append(
                F.min(c).cast("string").alias(f"{name}__mins")
            )
            aggs.append(
                F.max(c).cast("string").alias(f"{name}__maxs")
            )
    wide = df.agg(*aggs)

    parts = []
    for name, is_num in fields:
        minn = f"`{name}__minn`" if is_num else "CAST(NULL AS DOUBLE)"
        maxn = f"`{name}__maxn`" if is_num else "CAST(NULL AS DOUBLE)"
        mins = "CAST(NULL AS STRING)" if is_num else f"`{name}__mins`"
        maxs = "CAST(NULL AS STRING)" if is_num else f"`{name}__maxs`"
        parts.append(
            f"'{name}', `{name}__nulls`, `{name}__distinct`, "
            f"{minn}, {maxn}, {mins}, {maxs}"
        )
    stack = (
        f"stack({len(fields)}, {', '.join(parts)}) AS "
        "(column_name, n_nulls, n_distinct, min_num, max_num, "
        "min_str, max_str)"
    )
    return wide.select(
        F.expr(stack), F.col("__rows").alias("n_rows")
    ).select(
        "column_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )


def profile_quantiles(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    exact: bool = True,
) -> DataFrame:
    """Per-group distribution profile of a numeric column: count, an
    explicit sum/count mean (engine-internal avg() accumulation
    differs across engines; an exact integer sum followed by one
    double division does not), and interpolated quantiles at
    ``probs`` — percentile_cont semantics, (n−1)·q rank interpolation,
    rounded to 6dp.

    ``exact=True`` uses Spark's sort-based exact percentile: per-group
    state holds the group's value multiset, which is the
    oracle-comparable path but memory-bound at 100 TB. The scale path
    is ``exact=False`` → approx_percentile (bounded-error sketch,
    mergeable map-side, constant memory) — same schema, ±accuracy
    tolerance, not value-oracled."""
    by = list(by or [])
    v = F.col(value_col)
    plist = list(probs)
    qfn = F.percentile if exact else (
        lambda c, p: F.approx_percentile(c, p, F.lit(10_000))
    )
    aggs = [
        F.count(v).cast("bigint").alias("n"),
        F.round(
            F.sum(v).cast("double") / F.count(v).cast("double"), 6
        ).alias("mean"),
        qfn(v, F.lit(plist)).alias("__qs"),
    ]
    out = df.groupBy(*[F.col(c) for c in by]).agg(*aggs)
    qcols = [
        F.round(F.col("__qs").getItem(i).cast("double"), 6).alias(
            f"q{int(round(p * 100)):02d}"
        )
        for i, p in enumerate(plist)
    ]
    return out.select(*by, "n", "mean", *qcols)


def profile_histogram(
    df: DataFrame,
    value_col: str,
    bin_width: int = 100,
    n_bins: int = 20,
) -> DataFrame:
    """Fixed-width histogram of a numeric column: value v lands in
    bin floor(v / width), clamped into [0, n_bins-1] so outliers pile
    into the edge bins instead of growing the output. Returns one row
    per OCCUPIED bin: (bin, lo, n, v_min, v_max) — lo is the bin's
    nominal lower bound (edge bins can hold values outside
    [lo, lo+width) by construction). One map-side-combinable
    aggregation; output is at most n_bins rows regardless of input
    size."""
    v = F.col(value_col)
    b = F.greatest(
        F.lit(0),
        F.least(F.floor(v / F.lit(int(bin_width))), F.lit(int(n_bins) - 1)),
    ).cast("bigint")
    return (
        df.where(v.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min(v).cast("bigint").alias("v_min"),
            F.max(v).cast("bigint").alias("v_max"),
        )
        .select(
            "bin",
            (F.col("bin") * int(bin_width)).cast("bigint").alias("lo"),
            "n",
            "v_min",
            "v_max",
        )
    )


def pareto_frontier(
    df: DataFrame,
    max_col: str,
    min_col: str,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """2-D Pareto frontier: rows not strictly dominated under
    (maximize ``max_col``, minimize ``min_col``). Row r' dominates r
    iff (x' > x AND y' <= y) OR (x' >= x AND y' < y) — duplicates of
    a frontier point all survive (neither strictly dominates).

    Two-phase plan (the frontier identity: the global frontier is a
    subset of the union of per-partition frontiers): phase 1 computes
    each partition's local frontier with a RANGE-framed window
    partitioned by spark_partition_id — min(y) over [x+1, ∞) catches
    strict-x dominators, min(y) over [x, ∞) catches equal-x ones —
    so the corpus is filtered to a few survivors per partition
    WITHOUT any global sort; phase 2 re-runs the same window
    un-partitioned over only the survivors. The physical partitioning
    feeding phase 1 is arbitrary and may vary run to run — harmless:
    every local frontier is a superset of the global one, and phase 2
    makes the final answer exact and deterministic.

    ``max_col`` must be integral (the range frame steps by 1).
    """
    id_cols = id_cols or [
        c for c in df.columns if c not in (max_col, min_col)
    ]
    base = df.select(
        *id_cols,
        F.col(max_col).alias("_x"),
        F.col(min_col).alias("_y"),
    )

    def survivors(d: DataFrame, local: bool) -> DataFrame:
        part = [F.spark_partition_id()] if local else []
        w_strict = (
            Window.partitionBy(*part)
            .orderBy("_x")
            .rangeBetween(1, Window.unboundedFollowing)
        )
        w_geq = (
            Window.partitionBy(*part)
            .orderBy("_x")
            .rangeBetween(0, Window.unboundedFollowing)
        )
        dominated = (F.min("_y").over(w_strict) <= F.col("_y")) | (
            F.min("_y").over(w_geq) < F.col("_y")
        )
        return d.withColumn("_dom", dominated).filter(
            ~F.coalesce(F.col("_dom"), F.lit(False))
        ).drop("_dom")

    local_front = survivors(base, local=True)
    return survivors(local_front, local=False).select(
        *id_cols,
        F.col("_x").alias(max_col),
        F.col("_y").alias(min_col),
    )


def group_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    out_dp: int = 6,
) -> DataFrame:
    """Per-group simple linear regression (slope, intercept, r²) with
    EXACT integer sufficient statistics.

    ``x_col`` and ``y_col`` must be BIGINT (the caller scales —
    epoch seconds, integer cents). Returns (``*group_cols``, n, slope,
    intercept, r2) rounded to ``out_dp``.

    Why not Spark's built-in ``regr_slope``: it accumulates DOUBLE
    sums, whose value depends on partition merge order — fine within
    one engine, but never bit-stable across engines or even across
    repartitions. Here every sufficient statistic (Σx, Σy, Σxy, Σx²,
    Σy²) is summed in DECIMAL(38,0) — exact integers, order-invariant,
    still ONE map-side-combinable aggregate (partial sums merge
    exactly) — and the closed forms touch floating point only at the
    very end: each of n·Σxy−ΣxΣy, n·Σx²−(Σx)², n·Σy²−(Σy)² is an
    exact decimal (no cancellation — cancellation is a rounding
    phenomenon and nothing rounds until the final division), converted
    once to double (correctly rounded) and combined with single IEEE
    ops, identical in any IEEE-754 engine. Magnitude headroom: with
    |x| ≤ 2e9 (epoch seconds) and |y| ≤ 1e9 (cents), n·Σx² at 1e8
    rows/group is ~4e34 < 10^38; larger groups should pre-shift x by
    a constant epoch.
    """
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = (
        df.groupBy(*group_cols).agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
            F.sum(d(x_col)).alias("_sx"),
            F.sum(d(y_col)).alias("_sy"),
            F.sum(d(x_col) * d(y_col)).alias("_sxy"),
            F.sum(d(x_col) * d(x_col)).alias("_sxx"),
            F.sum(d(y_col) * d(y_col)).alias("_syy"),
        )
    )
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(
        "double"
    )
    den_x = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(
        "double"
    )
    den_y = (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast(
        "double"
    )
    slope_raw = num / den_x
    slope = F.round(slope_raw, out_dp)
    # the RAW slope feeds the intercept: at |x| ~ 2e9 a 5e-7 slope
    # perturbation (one 6dp rounding step) moves the intercept by
    # ~1000 — and the raw quotient is already cross-engine-identical
    # (one IEEE division on identical doubles), so nothing is gained
    # by rounding early
    intercept = F.round(
        (
            F.col("_sy").cast("double")
            - slope_raw * F.col("_sx").cast("double")
        )
        / F.col("_n").cast("double"),
        out_dp,
    )
    r2 = F.round((num * num) / (den_x * den_y), out_dp)
    zero_var = F.col("_den_x_raw") == 0
    return (
        agg.withColumn("_den_x_raw", den_x)
        .withColumn("_den_y_raw", den_y)
        .select(
            *group_cols,
            F.col("_n").cast("bigint").alias("n"),
            F.when(zero_var, F.lit(None).cast("double"))
            .otherwise(slope)
            .alias("slope"),
            F.when(zero_var, F.lit(None).cast("double"))
            .otherwise(intercept)
            .alias("intercept"),
            F.when(zero_var | (F.col("_den_y_raw") == 0),
                   F.lit(None).cast("double"))
            .otherwise(r2)
            .alias("r2"),
        )
    )


def skew_histogram(
    df: DataFrame,
    key_col: str,
    share_dp: int = 6,
) -> DataFrame:
    """Key-frequency skew profile: how concentrated is a prospective
    shuffle key? Returns one row per power-of-two frequency bucket —
    (bucket, freq_lo, n_keys, n_rows, row_share) where bucket =
    floor(log₂ frequency) — the diagnostic to run BEFORE keying a
    100 TB join/groupBy on a column (a fat top bucket means salting
    or AQE skew-split territory; the repo's own Zipf landmines —
    unigram_logprob's two-path join, the LSH/kNN caps — all began as
    exactly this histogram's tail).

    Plan shape: groupBy(key).count (map-side combinable — the ONLY
    corpus-width shuffle, and partial aggregation absorbs the very
    skew being measured), then a bucket-level re-aggregate over ≤
    |distinct keys| rows. floor(log₂ f) is length(bin(f)) − 1 — pure
    integer/string ops, no transcendental, identical in both engines.
    NULL keys are counted as their own frequency class like any other
    (a NULL-heavy join key is the most common real-world skew).
    """
    freq = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).alias("_f")
    )
    total = freq.agg(F.sum("_f").alias("_total"))
    bucket = (F.length(F.bin(F.col("_f"))) - 1).cast("bigint")
    return (
        freq.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum("_f").cast("bigint").alias("n_rows"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            # py shiftleft() only takes a literal count; the SQL form
            # shifts by a column. bucket ≤ 62 by construction (f is a
            # positive BIGINT count), so the checked shift cannot trip
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))")
            .cast("bigint")
            .alias("freq_lo"),
            "n_keys",
            "n_rows",
            F.round(
                F.col("n_rows").cast("double")
                / F.col("_total").cast("double"),
                share_dp,
            ).alias("row_share"),
        )
    )


def sequence_gaps(
    df: DataFrame,
    key_col: str,
    bucket_size: int = 1024,
) -> DataFrame:
    """Missing ranges in an integer key sequence (the referential
    audit for surrogate-key tables: retention holes, failed loads,
    compaction bugs). Returns (gap_start, gap_end, gap_len) for every
    maximal missing run strictly inside [min(key), max(key)].

    A naive lead() over the whole sequence is an unpartitioned window
    — one task sorts the corpus. Two-level plan instead: keys bucket
    by ``key div bucket_size``; intra-bucket gaps come from a lead()
    window PARTITIONED by bucket (parallel, bounded state), and
    cross-bucket gaps from a second lead() over the per-bucket
    (min, max) summary — a table ``bucket_size×`` smaller than the
    key set, where a single-partition window is fine (and empty
    buckets between two summaries are swallowed by the same boundary
    gap row). Duplicates are collapsed by the distinct; NULL keys are
    ignored.
    """
    k = (
        df.select(F.col(key_col).cast("bigint").alias("_k"))
        .where(F.col("_k").isNotNull())
        .distinct()
        .withColumn("_b", F.col("_k") - (F.col("_k") % bucket_size))
    )
    w_in = Window.partitionBy("_b").orderBy("_k")
    intra = (
        k.withColumn("_next", F.lead("_k").over(w_in))
        .where(F.col("_next") > F.col("_k") + 1)
        .select(
            (F.col("_k") + 1).alias("gap_start"),
            (F.col("_next") - 1).alias("gap_end"),
        )
    )
    summary = k.groupBy("_b").agg(
        F.min("_k").alias("_lo"), F.max("_k").alias("_hi")
    )
    w_b = Window.orderBy("_b")
    # single-partition window is fine HERE: one row per bucket
    cross = (
        summary.withColumn("_next_lo", F.lead("_lo").over(w_b))
        .where(F.col("_next_lo") > F.col("_hi") + 1)
        .select(
            (F.col("_hi") + 1).alias("gap_start"),
            (F.col("_next_lo") - 1).alias("gap_end"),
        )
    )
    return intra.unionByName(cross).select(
        "gap_start",
        "gap_end",
        (F.col("gap_end") - F.col("gap_start") + 1).alias("gap_len"),
    )


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    out_dp: int = 2,
) -> DataFrame:
    """Per-group lower weighted median: the smallest value v whose
    cumulative weight reaches half the group total (2·cumw(v) ≥ W) —
    the robust center a 100 TB metrics job wants when each row stands
    for many units (quantity-weighted price, token-weighted score).
    Integer values (cents) and integer weights make the threshold
    test exact — no interpolation, no float accumulation anywhere.

    Plan: pre-aggregate (group, value) → summed weight FIRST (map-
    side combinable; collapses duplicate values, so the window below
    sees distinct values only), then one cumulative-sum window per
    group ordered by value, then a min() re-aggregate of the
    qualifying rows. State per window partition is the group's
    DISTINCT value set — bounded by value cardinality, not row count.
    Returns (``*group_cols``, n_rows, total_w, median) with median =
    value/100 dollars at ``out_dp``.
    """
    v = (
        df.groupBy(*group_cols, F.col(value_col).alias("_v"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(weight_col).cast("bigint").alias("_w"),
        )
    )
    wspec = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy(*group_cols)
    # n_rows rides the same window pass as the totals (sum of per-value
    # counts == group row count) — no second scan/shuffle of df and no
    # re-aggregate join on the way out
    cum = v.select(
        *group_cols,
        "_v",
        F.sum("_w").over(wspec).alias("_cum"),
        F.sum("_w").over(wtot).alias("_tot"),
        F.sum("_n").over(wtot).alias("_nr"),
    )
    return (
        cum.where(F.lit(2) * F.col("_cum") >= F.col("_tot"))
        .groupBy(*group_cols)
        .agg(
            F.min("_v").alias("_med"),
            F.first("_tot").alias("total_w"),
            F.first("_nr").cast("bigint").alias("n_rows"),
        )
        .select(
            *group_cols,
            "n_rows",
            F.col("total_w").cast("bigint").alias("total_w"),
            F.round(F.col("_med") / 100.0, out_dp).alias("median"),
        )
    )


def outliers_mad(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 3.0,
    out_dp: int = 4,
) -> DataFrame:
    """Per-group robust outlier profile via median absolute deviation:
    a value is an outlier when |v − median| > k · 1.4826 · MAD (the
    Hampel filter; 1.4826 scales MAD to σ under normality). Mean/
    stddev rules break on the very outliers they hunt — median/MAD
    have a 50% breakdown point, which is what a data-quality gate over
    an untrusted 100 TB drop needs.

    Three passes by construction (median → MAD needs the median →
    counting needs the MAD), each a map-side-combinable aggregate plus
    a BROADCAST join of a one-row-per-group stats table back onto the
    corpus — never a corpus shuffle. The exact percentile is the
    oracle-comparable path; at true scale swap approx_percentile into
    the same shape (single-digit-% error, constant memory). Integer
    cents in, exact interpolated medians out ((n−1)·q percentile_cont
    semantics — the repo's profile_quantiles contract); the threshold
    compare runs on identically-derived doubles in both engines.

    Returns (``*group_cols``, n_rows, median, mad, n_outliers) with
    median/MAD in dollars at ``out_dp``.
    """
    v = F.col(value_col)
    # r6 shape: ONE corpus scan builds a (group, value) → count rollup
    # (map-side combinable); the three chained passes (median → MAD →
    # outlier count) all aggregate the rollup via percentile's frequency
    # argument — identical values (Percentile's buffer is a value→count
    # map internally), but the corpus is never re-scanned and the stats
    # tables are localCheckpointed so no subtree re-executes (the old
    # plan ran the full-corpus percentile ~6×: 26 Exchanges, 4.0 s at
    # sf0.1). Lazy checkpoints are GC-released (landmine #1).
    cnts = (
        df.groupBy(*group_cols, v.alias("_v"))
        .agg(F.count(F.lit(1)).alias("_ct"))
        .localCheckpoint(eager=False)
    )
    med = (
        cnts.groupBy(*group_cols)
        .agg(
            F.percentile(F.col("_v"), F.lit(0.5), F.col("_ct")).alias("_med"),
            F.sum("_ct").cast("bigint").alias("n_rows"),
        )
        .localCheckpoint(eager=False)
    )
    j = cnts.join(F.broadcast(med), group_cols)
    dev = F.abs(F.col("_v") - F.col("_med"))
    mad_tbl = (
        j.groupBy(*group_cols)
        .agg(F.percentile(dev, F.lit(0.5), F.col("_ct")).alias("_mad"))
        .localCheckpoint(eager=False)
    )
    j2 = j.join(F.broadcast(mad_tbl), group_cols)
    flagged = j2.groupBy(*group_cols).agg(
        F.sum(
            F.when(
                dev > F.lit(k * 1.4826) * F.col("_mad"), F.col("_ct")
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("n_outliers")
    )
    return (
        med.join(mad_tbl, group_cols)
        .join(flagged, group_cols)
        .select(
            *group_cols,
            "n_rows",
            F.round(F.col("_med") / 100.0, out_dp).alias("median"),
            F.round(F.col("_mad") / 100.0, out_dp).alias("mad"),
            "n_outliers",
        )
    )


def fd_check(
    df: DataFrame,
    lhs: str,
    rhs: str,
) -> DataFrame:
    """Functional-dependency audit: report every ``lhs`` value that
    maps to more than one distinct ``rhs`` — the violations of the
    dependency lhs -> rhs a curation pipeline asserts before keying on
    a column (e.g. "every product name has exactly one brand").

    One hash aggregate on lhs with a count(DISTINCT rhs) — Catalyst
    compiles the distinct into a two-phase partial aggregation, so the
    table is scanned once and the shuffle carries only (lhs, rhs)
    pairs, pre-deduped map-side. Returns (lhs_value, n_distinct_rhs,
    n_rows), violations only; an empty result certifies the FD holds.
    """
    return (
        df.groupBy(F.col(lhs).cast("string").alias("lhs_value"))
        .agg(
            F.countDistinct(rhs).cast("bigint").alias("n_distinct_rhs"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        .where(F.col("n_distinct_rhs") > 1)
    )


def rfm_segments(
    orders: DataFrame,
    customer: DataFrame,
    n_tiles: int = 5,
) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quintiles)
    WITHIN market segment: each customer gets three ntile scores —
    recency tile 1 = most recent buyer — and the output is the cell
    cube (segment, r-f-m cell, customer count, mean spend).

    Determinism: recency is exact integer days from the corpus's last
    order date (microsecond epoch, integer division); monetary rides
    exact BIGINT cents (order-invariant sums); every ntile orders by
    (metric, custkey) so ties break identically cross-engine; the cell
    mean is the integer floor-mean in cents — no float anywhere, after
    a first cut of this op hit the classic cross-engine half-cent
    round boundary (2140149.635 rounds .64 on Spark's BigDecimal
    HALF_UP, .63 on DuckDB's scaled-double round).

    Scale notes: ntile windows are PARTITIONED by market segment (the
    window_deciles rule — a global ntile would single-task the corpus;
    for global quantile scores pre-bucket by approx cutpoints instead,
    profile_quantiles is that path). Two shuffles total: the custkey
    aggregate and the segment window; the final cell cube is
    <= segments * n_tiles^3 rows.
    """
    from pyspark.sql import Window

    tmax = orders.agg(
        F.max(F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias(
            "tmax"
        )
    )
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            ).alias("last_us"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("monetary"),
        )
        .crossJoin(F.broadcast(tmax))
        .select(
            "o_custkey",
            F.expr("(tmax - last_us) div 86400000000")
            .cast("bigint")
            .alias("r_days"),
            "n_orders",
            "monetary",
        )
    )
    j = per_cust.join(
        F.broadcast(
            customer.select("c_custkey", "c_mktsegment")
        ),
        per_cust.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("segment"),
        "o_custkey",
        "r_days",
        "n_orders",
        "monetary",
    )
    seg = "segment"
    wr = Window.partitionBy(seg).orderBy("r_days", "o_custkey")
    wf = Window.partitionBy(seg).orderBy(
        F.col("n_orders").desc(), "o_custkey"
    )
    wm = Window.partitionBy(seg).orderBy(
        F.col("monetary").desc(), "o_custkey"
    )
    scored = j.select(
        seg,
        "monetary",
        F.ntile(n_tiles).over(wr).alias("r_score"),
        F.ntile(n_tiles).over(wf).alias("f_score"),
        F.ntile(n_tiles).over(wm).alias("m_score"),
    )
    return (
        scored.groupBy(
            "segment",
            F.concat_ws(
                "-", F.col("r_score"), F.col("f_score"), F.col("m_score")
            ).alias("rfm_cell"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.expr("sum(monetary) div count(*)")
            .cast("bigint")
            .alias("avg_monetary_cents"),
        )
    )


def winsorized_mean(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    lo_p: float = 0.1,
    hi_p: float = 0.9,
    out_dp: int = 2,
) -> DataFrame:
    """Per-group winsorized mean: values are clipped to the group's
    [lo_p, hi_p] interpolated percentiles before averaging — the
    outlier-robust mean a profiling pass reports next to the raw one.

    Determinism contract: the value rides as exact bigint cents and
    the bounds are NEAREST-RANK order statistics (the value at rank
    ceil(p*n) in the (cents, row-id) total order) — pure integer
    selection, no interpolation formula whose last-ulp rounding could
    differ across engines. The clip is integer, the clipped sum is an
    exact BIGINT, and each mean is one IEEE division chain mirrored
    verbatim by the oracle.

    Plan: one rank window per group (partitioned — never a global
    sort), a group-cardinality bounds aggregate that broadcasts back,
    then one map-side-combinable sum; output rows = group count.
    """
    by = list(by or [])
    cents = F.round(F.col(value_col) * 100, 0).cast("bigint")
    grp = [F.lit(0).alias("_g")] if not by else [F.col(c) for c in by]
    gnames = ["_g"] if not by else by
    base = df.select(*grp, cents.alias("_cents"))
    w = Window.partitionBy(*gnames).orderBy("_cents")
    ranked = base.select(
        *gnames,
        "_cents",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy(*gnames))
        .alias("_n"),
    )
    lo_rank = F.greatest(F.lit(1), F.ceil(F.lit(lo_p) * F.col("_n")))
    hi_rank = F.ceil(F.lit(hi_p) * F.col("_n"))
    bounds = ranked.groupBy(*gnames).agg(
        F.max(F.when(F.col("_rn") == lo_rank, F.col("_cents"))).alias(
            "_lo"
        ),
        F.max(F.when(F.col("_rn") == hi_rank, F.col("_cents"))).alias(
            "_hi"
        ),
    )
    joined = base.join(F.broadcast(bounds), gnames)
    clipped = F.least(F.greatest(F.col("_cents"), F.col("_lo")), F.col("_hi"))
    return (
        joined.select(*by, clipped.alias("_w"), F.col("_cents"))
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum("_cents").cast("double")
                / F.count(F.lit(1)).cast("double")
                / 100.0,
                out_dp,
            ).alias("raw_mean"),
            F.round(
                F.sum("_w").cast("double")
                / F.count(F.lit(1)).cast("double")
                / 100.0,
                out_dp,
            ).alias("winsorized_mean"),
        )
    )


def wilson_bounds(
    k_col: str,
    n_col: str,
    z: float = 1.96,
    out_dp: int = 6,
):
    """Wilson score interval columns (p_hat, low, high) for k successes
    of n trials — the small-sample-safe confidence interval a metrics
    dashboard should use instead of the Wald ±z·sqrt(pq/n).

    Bit-portable by construction: the entire formula is +,*,/ and ONE
    sqrt — all correctly-rounded IEEE-754 operations (sqrt included;
    only transcendentals diverge across engines) — applied to exact
    integer-derived doubles with z and z² as round-trip literals, so
    an oracle mirroring the parenthesization reproduces every bit.
    Returns a dict of three Columns to splat into a select.
    """
    kk = F.col(k_col).cast("double")
    nn = F.col(n_col).cast("double")
    p = kk / nn
    z2 = F.lit(z * z)
    zl = F.lit(z)
    denom = F.lit(1.0) + z2 / nn
    center = p + z2 / (F.lit(2.0) * nn)
    rad = zl * F.sqrt(
        p * (F.lit(1.0) - p) / nn
        + z2 / (F.lit(4.0) * nn * nn)
    )
    return {
        "p_hat": F.round(p, out_dp),
        "wilson_low": F.round((center - rad) / denom, out_dp),
        "wilson_high": F.round((center + rad) / denom, out_dp),
    }
