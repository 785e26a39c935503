"""Mergeable summary sketches with bit-exact cross-engine contracts.

A 100 TB curation pipeline cannot afford exact distinct counts or
uniform scans for every "how big / what sample" question; the standard
answers are streaming sketches (DataSketches, BlinkDB lineage). Spark's
built-ins (approx_count_distinct = HyperLogLog++) are engine-specific —
their estimates can never be value-oracled against another engine. The
sketches here are chosen so that every arithmetic step is either exact
integer math or a single correctly-rounded IEEE-754 operation on
identical inputs, which makes the SAME algorithm produce bit-identical
results in Spark and DuckDB (the repo's oracle bar) while keeping the
real sketch properties (bounded state, mergeability, known error):

- ``kmv_distinct`` — K-Minimum-Values distinct-count sketch
  (Bar-Yossef et al. 2002; the Theta-sketch family's simplest member):
  per group keep the k smallest 60-bit hashes; estimate
  (k-1) · 2^60 / h_(k). The k-th minimum is an exact integer, the
  estimate is ONE double division. Relative error ~ 1/sqrt(k-2).
- ``priority_sample`` — Priority Sampling (Duffield, Lund, Thorup
  2007): weight-proportional without-replacement sampling with
  unbiased subset-sum estimators, priority q = w / u with
  u = (h+1)/2^60 hash-uniform. q is two IEEE ops (multiply, divide) —
  no ln/pow, so no libm divergence between JVM and DuckDB (the
  Efraimidis–Spirakis exponential-key formulation needs ln(u) and a
  1-ulp libm disagreement near a rounding boundary could flip the
  sample; priorities compare exactly instead).

Reference parity note: the reference app (KatherLab/LLMAIx) samples
and counts only in-memory (pandas value_counts / df.sample in the
webapp routes); these operators are the scale-out replacements for
those ad-hoc steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from llmaix_spark.operators.linking import stable_hash60_expr

_HASH_SPACE = float(2**60)  # exact in double (6-bit mantissa payload)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    est_dp: int = 4,
    err_dp: int = 6,
    include_exact: bool = True,
) -> DataFrame:
    """Per-group KMV distinct-count estimate, optionally next to the
    exact count.

    Returns (``*group_cols``, n_exact, kmv_estimate, rel_err), or just
    (``*group_cols``, kmv_estimate) with ``include_exact=False`` —
    the production mode at scale: the whole point of the sketch is NOT
    paying for the exact count, so the error-reporting mode exists for
    validation (and the value oracle). With both computed, the shared
    distinct table is localCheckpointed (2 consumers — repo cache
    policy) instead of being re-executed per branch. NULL values are
    ignored (md5(NULL) is NULL — the repo-wide rule that a NULL never
    silently hashes). With fewer than ``k`` distinct values the sketch
    degenerates to the exact count (estimate == n_exact).

    Plan shape: ONE distinct over (group, hash) — map-side combinable,
    the only corpus-width shuffle — then two group-local aggregates
    over the distinct table joined back together (both sides are
    ≤ |groups| rows; Catalyst broadcasts). The k-smallest selection is
    a rank window that Spark 3.5+ rewrites to WindowGroupLimit, i.e.
    each map task keeps only its local k minima BEFORE the exchange —
    at 100 TB the sketch shuffle carries k rows per group per task,
    not the distinct table. The estimate divides the exact integer
    (k-1)·2^60 (a 6-significant-bit double, exact) by the exact
    integer k-th minimum hash: one correctly-rounded IEEE division,
    bit-identical in any IEEE-754 engine.
    """
    if k < 3:
        raise ValueError("kmv_distinct needs k >= 3 (error ~ 1/sqrt(k-2))")
    d = (
        df.select(
            *group_cols,
            stable_hash60_expr(F.col(value_col).cast("string")).alias("_h"),
        )
        .where(F.col("_h").isNotNull())
        .distinct()
    )
    if include_exact:
        d = d.localCheckpoint(eager=False)  # consumers: exact, sketch
    w = Window.partitionBy(*group_cols).orderBy("_h")
    sk = (
        d.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("_n_sk"),
            F.max("_h").alias("_hk"),
        )
    )
    est = F.when(
        F.col("_n_sk") < k, F.col("_n_sk").cast("double")
    ).otherwise(
        F.lit(float((k - 1) * 2**60)) / F.col("_hk").cast("double")
    )
    if not include_exact:
        return sk.select(
            *group_cols, F.round(est, est_dp).alias("kmv_estimate")
        )
    exact = d.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    return (
        exact.join(sk, group_cols)
        .withColumn("kmv_estimate", F.round(est, est_dp))
        .select(
            *group_cols,
            "n_exact",
            "kmv_estimate",
            F.round(
                F.abs(F.col("kmv_estimate") - F.col("n_exact"))
                / F.col("n_exact"),
                err_dp,
            ).alias("rel_err"),
        )
    )


def priority_sample(
    df: DataFrame,
    weight_cents_col: str,
    id_cols: list[str],
    k: int = 64,
    out_dp: int = 2,
) -> DataFrame:
    """Priority sample of ``k`` rows, weight-proportional without
    replacement, with the Duffield–Lund–Thorup unbiased per-row
    subset-sum estimate.

    ``weight_cents_col`` must be a positive BIGINT (the repo's
    integer-cents convention — exact weights in, exact weights out).
    Priority q = w · 2^60 / (h+1) where h is the shared 60-bit hash of
    the id tuple; the k largest priorities are the sample, the (k+1)-th
    priority is the threshold τ, and ŵ = max(w, τ) satisfies
    E[Σ_sample ŵ] = Σ_population w (DLT 2007, Thm 1).

    Returns (rank, ``*id_cols``, weight, weight_est) with weight and
    weight_est in dollars rounded to ``out_dp``.

    Plan shape: the priority is a narrow projection; the k+1 survivors
    come from orderBy+limit — Catalyst plans TakeOrderedAndProject
    (per-partition size-(k+1) heaps, driver merge of k+1 rows per
    partition), never a global sort. τ rides a 1-row broadcast
    crossJoin. Determinism: q is exactly two IEEE operations on exact
    integers (w·2^60 may exceed 2^53 and round — but identically in
    every IEEE engine; ditto the division), and the ordering
    tie-breaks on the id tuple, so the sample is a pure function of
    the data in ANY engine — no RNG, rerun-stable, resume-safe.
    """
    h = stable_hash60_expr(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in id_cols])
    )
    scored = df.select(
        *id_cols,
        F.col(weight_cents_col).alias("_w"),
        (
            F.col(weight_cents_col).cast("double") * F.lit(_HASH_SPACE)
            / (h + F.lit(1)).cast("double")
        ).alias("_q"),
    )
    order = [F.desc("_q")] + [F.asc(c) for c in id_cols]
    top = scored.orderBy(*order).limit(k + 1)
    # τ = the (k+1)-th priority; with n ≤ k the whole population is
    # sampled and DLT defines τ = 0 (the estimate is the exact weight)
    tau = top.agg(
        F.when(F.count(F.lit(1)) > k, F.min("_q"))
        .otherwise(F.lit(0.0))
        .alias("_tau")
    )
    w_rank = Window.orderBy(*order)
    # single-partition window is fine HERE: it sees k+1 rows, not the corpus
    return (
        top.crossJoin(F.broadcast(tau))
        .withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
        .where(F.col("rank") <= k)
        .select(
            "rank",
            *id_cols,
            F.round(F.col("_w") / 100.0, out_dp).alias("weight"),
            F.round(
                F.greatest(F.col("_w").cast("double"), F.col("_tau"))
                / 100.0,
                out_dp,
            ).alias("weight_est"),
        )
    )


def kmv_merge(
    df: DataFrame,
    part_col: str,
    value_col: str,
    k: int = 64,
    est_dp: int = 4,
    merged_label: str = "ALL",
) -> DataFrame:
    """Per-partition KMV sketches plus their MERGE — the property that
    makes the sketch usable at 100 TB: each executor (here: each value
    of ``part_col``) summarizes its shard into k hashes, and the global
    distinct estimate is computed from the union of those sketch
    contents alone (<= parts·k rows), never from the base table.

    Merge validity (Bar-Yossef et al.): the merged k-th minimum is <=
    every part's k-th minimum, so all hashes below it survive in some
    part's sketch — taking the k smallest distinct hashes across the
    sketches yields exactly the sketch of the union.

    Returns one row per part plus a ``merged_label`` row:
    (part, n_exact, kmv_estimate). n_exact counts distinct hashes (==
    distinct values modulo 60-bit collisions, identically cross-engine)
    and exists to validate the estimate; production would drop it.

    Plan shape: ONE distinct over (part, hash) localCheckpointed (3
    consumers: per-part sketch, per-part exact, global exact), a
    WindowGroupLimit rank per part, and a global sort-limit over
    <= parts·k sketch rows — the merge never reshuffles the base.
    """
    if k < 3:
        raise ValueError("kmv_merge needs k >= 3")
    d = (
        df.select(
            F.col(part_col).cast("string").alias("part"),
            stable_hash60_expr(F.col(value_col).cast("string")).alias("_h"),
        )
        .where(F.col("_h").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("part").orderBy("_h")
    kept = (
        d.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .localCheckpoint(eager=False)  # consumers: per-part agg, merge
    )
    num = F.lit(float((k - 1) * 2**60))

    def _est(n_sk, hk):
        return F.when(n_sk < k, n_sk.cast("double")).otherwise(
            num / hk.cast("double")
        )

    per_part_sk = kept.groupBy("part").agg(
        F.count(F.lit(1)).alias("_n_sk"), F.max("_h").alias("_hk")
    )
    per_part_ex = d.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    parts = per_part_ex.join(per_part_sk, "part").select(
        "part",
        "n_exact",
        F.round(_est(F.col("_n_sk"), F.col("_hk")), est_dp).alias(
            "kmv_estimate"
        ),
    )
    merged_sk = (
        kept.select("_h")
        .distinct()
        .orderBy("_h")
        .limit(k)
        .agg(F.count(F.lit(1)).alias("_n_sk"), F.max("_h").alias("_hk"))
    )
    merged_ex = d.select("_h").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    merged = merged_ex.crossJoin(merged_sk).select(
        F.lit(merged_label).alias("part"),
        "n_exact",
        F.round(_est(F.col("_n_sk"), F.col("_hk")), est_dp).alias(
            "kmv_estimate"
        ),
    )
    return parts.unionByName(merged)


def kmv_jaccard(
    df: DataFrame,
    tag_col: str,
    value_col: str,
    tag_a: str,
    tag_b: str,
    k: int = 64,
    est_dp: int = 4,
    jac_dp: int = 6,
) -> DataFrame:
    """Set-intersection estimation from two KMV sketches alone — the
    sketch-algebra twin of kmv_merge's union: estimate |A|, |B|,
    |A ∪ B| and Jaccard(A, B) = |U_k ∩ A_k ∩ B_k| / |U_k| where U_k
    is the k smallest distinct hashes across both sketches (the union
    sketch, by the kmv_merge validity argument), then
    |A ∩ B| ≈ J · |A ∪ B|. One output row.

    Everything after the (tag, hash) distinct operates on ≤ 2k sketch
    rows: the per-tag k-minima come from a WindowGroupLimit rank (map
    tasks retain k rows before the exchange), the union sketch is a
    TakeOrderedAndProject over sketch contents, and membership is two
    joins on 60-bit integers. Determinism: exact integer hashes and
    counts; each estimate is one IEEE division by the exact k-th
    minimum ((k-1)·2^60 is a short-mantissa double, exact); J is one
    integer-ratio division; the intersection estimate multiplies two
    identically-computed doubles — bit-identical cross-engine.
    """
    if k < 3:
        raise ValueError("kmv_jaccard needs k >= 3")
    d = (
        df.select(
            F.col(tag_col).cast("string").alias("tag"),
            stable_hash60_expr(F.col(value_col).cast("string")).alias(
                "_h"
            ),
        )
        .where(F.col("tag").isin([tag_a, tag_b]) & F.col("_h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("tag").orderBy("_h")
    sk = (
        d.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("tag", "_h")
        # consumers: per-tag aggregate, union sketch, 2 membership sides
        .localCheckpoint(eager=False)
    )
    kth_const = F.lit(float((k - 1) * 2**60))
    est_of = F.when(
        F.col("_n") < k, F.col("_n").cast("double")
    ).otherwise(kth_const / F.col("_hk").cast("double"))
    per_tag = (
        sk.groupBy("tag")
        .agg(F.count(F.lit(1)).alias("_n"), F.max("_h").alias("_hk"))
        .select("tag", est_of.alias("_est"))
    )
    ests = per_tag.agg(
        F.max(F.when(F.col("tag") == tag_a, F.col("_est"))).alias("_ea"),
        F.max(F.when(F.col("tag") == tag_b, F.col("_est"))).alias("_eb"),
    )
    u = sk.select("_h").distinct().orderBy("_h").limit(k)
    # single-partition from here on: ≤ k rows by construction
    ua = u.agg(F.count(F.lit(1)).alias("_n"), F.max("_h").alias("_hk"))
    inter = (
        u.join(sk.where(F.col("tag") == tag_a).select("_h"), "_h")
        .join(sk.where(F.col("tag") == tag_b).select("_h"), "_h")
        .agg(F.count(F.lit(1)).alias("_ni"))
    )
    jac = F.col("_ni").cast("double") / F.col("_n").cast("double")
    est_union = F.when(
        F.col("_n") < k, F.col("_n").cast("double")
    ).otherwise(kth_const / F.col("_hk").cast("double"))
    return (
        ua.crossJoin(F.broadcast(inter))
        .crossJoin(F.broadcast(ests))
        .select(
            F.lit(k).cast("bigint").alias("k"),
            F.round(F.col("_ea"), est_dp).alias("est_a"),
            F.round(F.col("_eb"), est_dp).alias("est_b"),
            F.round(est_union, est_dp).alias("est_union"),
            F.round(jac, jac_dp).alias("jaccard_est"),
            F.round(jac * est_union, est_dp).alias("est_intersection"),
        )
    )


# HLL numerator: alpha_256 * m^2 * 2^53 with alpha_256 = 0.7213/(1 +
# 1.079/256) (Flajolet et al. 2007). Shortest-round-trip literal —
# parses to the identical double in Spark and DuckDB (verified
# float(repr(x)) == x at build time).
_HLL_P = 8
_HLL_M = 1 << _HLL_P
_HLL_REM_BITS = 60 - _HLL_P  # low bits of the 60-bit hash
_HLL_NUM = 4.2399330249068963e+20
assert float(repr(_HLL_NUM)) == (
    0.7213 / (1 + 1.079 / _HLL_M) * _HLL_M * _HLL_M * float(2**53)
)


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    est_dp: int = 4,
    err_dp: int = 6,
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate made exact-arithmetic:
    the register sum Σ 2^(-M_j), normally a float accumulation whose
    order differs per engine, is scaled by 2^53 into a pure BIGINT sum
    (M_j ≤ 53 ⇒ each term 2^(53-M_j) is an exact integer; 256 registers
    ⇒ Σ < 2^61) — so the ONLY float step is one IEEE division of the
    constant α·m²·2^53 by the exact register sum. The small-range
    linear-counting correction is deliberately omitted (it needs ln(),
    which is not bit-portable): below ~2.5m distincts the raw
    estimator's bias shows — the oracle reproduces it identically, and
    kmv_distinct is the sketch to use in that regime.

    Unlike KMV, HLL needs NO distinct() pre-pass (max is duplicate-
    insensitive): ONE two-level hash aggregate — (group, bucket) max
    rank map-side, then per-group register sum — plus an exact
    countDistinct branch for the reported rel_err (production drops
    it). Registers are 6 bits × 256 per group at any SF: the mergeable
    always-tiny sketch that ships per-shard at 100 TB.
    """
    g = [F.col(c) for c in group_cols]
    h = stable_hash60_expr(F.col(value_col).cast("string"))
    base = df.select(*g, h.alias("_h")).where(F.col("_h").isNotNull())
    rem = F.col("_h").bitwiseAND(F.lit((1 << _HLL_REM_BITS) - 1))
    rank = F.when(rem == 0, F.lit(_HLL_REM_BITS + 1)).otherwise(
        F.lit(_HLL_REM_BITS + 1) - F.length(F.bin(rem))
    )
    regs = (
        base.select(
            *g,
            F.shiftright(F.col("_h"), _HLL_REM_BITS).alias("_bucket"),
            rank.alias("_rank"),
        )
        .groupBy(*group_cols, "_bucket")
        .agg(F.max("_rank").alias("_m"))
    )
    sums = regs.groupBy(*group_cols).agg(
        (
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), "
                    f"{_HLL_REM_BITS + 1} - _m)"
                )
            )
            + (F.lit(_HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << (_HLL_REM_BITS + 1))
        ).alias("_s")
    )
    exact = base.groupBy(*group_cols).agg(
        F.countDistinct("_h").cast("bigint").alias("n_exact")
    )
    est = F.lit(_HLL_NUM) / F.col("_s").cast("double")
    return (
        exact.join(sums, group_cols)
        .withColumn("hll_estimate", F.round(est, est_dp))
        .select(
            *group_cols,
            "n_exact",
            "hll_estimate",
            F.round(
                F.abs(F.col("hll_estimate") - F.col("n_exact"))
                / F.col("n_exact"),
                err_dp,
            ).alias("rel_err"),
        )
    )
