"""Plan pins, partition invariance, and python twins for the round-11
wave (Spearman / Mann–Kendall / Mann–Whitney / HHI / sweep-line
concurrency / growth accounting).
"""

from __future__ import annotations

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_spearman_windows_stay_partitioned(spark):
    """Both rank windows partition by event_type — a global sort over
    the raw stream would show up as rangepartitioning."""
    from llmaix_spark.plans.queries import q_spearman_corr

    plan = _phys(q_spearman_corr(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_mann_kendall_pair_join_broadcasts(spark):
    """The quadratic pair stage runs on the calendar-bounded daily
    rollup and broadcasts — never a shuffle join, never raw rows²."""
    from llmaix_spark.plans.queries import q_mann_kendall

    plan = _phys(q_mann_kendall(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_mann_whitney_single_partition_only_on_rollup(spark):
    """The unpartitioned cumulative window is allowed only AFTER the
    distinct-cents rollup (bounded domain); the raw scan must go
    through a hash aggregate first, and the totals side broadcasts."""
    from llmaix_spark.plans.queries import q_mann_whitney_u

    plan = _phys(q_mann_whitney_u(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "rangepartitioning" not in plan


def test_max_concurrency_no_global_sort(spark):
    from llmaix_spark.plans.queries import q_max_concurrency

    plan = _phys(q_max_concurrency(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_growth_accounting_churn_join_broadcasts(spark):
    from llmaix_spark.plans.queries import q_growth_accounting

    plan = _phys(q_growth_accounting(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "spearman_corr",
        "mann_kendall",
        "mann_whitney_u",
        "hhi_concentration",
        "max_concurrency",
        "growth_accounting",
    ],
)
def test_wave11_partition_invariance(spark, qname):
    from llmaix_spark.plans import queries as Q

    fn = Q.QUERIES[qname]
    rows = {}
    for n in ("3", "16"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        df = fn(spark, SF_DIR)
        rows[n] = sorted(
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in df.collect()
        )
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert rows["3"] == rows["16"]


# ---------------------------------------------------------------------------
# python twins


def _events_pd():
    import pandas as pd

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["us"] = e["ts"].astype("int64")
    e["cents"] = (e["value"] * 100).round().astype(int)
    return e


def _orders_pd():
    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["cents"] = (o["o_totalprice"] * 100).round().astype(int)
    o["month_key"] = (
        o["o_orderdate"].dt.year * 12 + o["o_orderdate"].dt.month
    )
    o["dom"] = o["o_orderdate"].dt.day
    return o


def test_spearman_matches_pandas(spark):
    """Average-rank Pearson over pandas rank(method='average') must
    agree with the exact-integer closed form to 1e-6."""
    from llmaix_spark.plans.queries import q_spearman_corr

    got = {
        r["event_type"]: (r["n"], r["rho"])
        for r in q_spearman_corr(spark, SF_DIR).collect()
    }

    e = _events_pd()
    for ty, g in e.groupby("event_type"):
        rx = g["cents"].rank(method="average").to_numpy()
        ry = g["us"].rank(method="average").to_numpy()
        rho = np.corrcoef(rx, ry)[0, 1]
        n, grho = got[ty]
        assert n == len(g)
        assert abs(grho - rho) < 1e-6


def test_mann_kendall_matches_python(spark):
    from llmaix_spark.plans.queries import q_mann_kendall

    got = {
        r["month_key"]: (r["n_days"], r["s"], r["var_num"])
        for r in q_mann_kendall(spark, SF_DIR).collect()
    }

    daily = (
        _orders_pd()
        .groupby(["month_key", "dom"])["cents"]
        .sum()
        .reset_index()
    )
    for mk, g in daily.groupby("month_key"):
        pts = [
            int(v)
            for _, v in sorted(zip(g["dom"].astype(int), g["cents"]))
        ]
        n = len(pts)
        s = sum(
            int(np.sign(pts[j] - pts[i]))
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie_term = sum(
            t * (t - 1) * (2 * t + 5)
            for t in __import__("collections")
            .Counter(pts)
            .values()
            if t > 1
        )
        var_num = n * (n - 1) * (2 * n + 5) - tie_term
        assert got[int(mk)] == (n, s, var_num)


def test_mann_whitney_matches_numpy(spark):
    """2U against a searchsorted twin: 2U = 2·#{x>y} + #{x=y} over
    group × rest pairs; also the U1 + U2' = n1·n2 pairing identity
    (each type's 2U plus the rest-vs-type 2U must equal 2·n1·n2)."""
    from llmaix_spark.plans.queries import q_mann_whitney_u

    got = {
        r["event_type"]: (r["n1"], r["n2"], r["u2"])
        for r in q_mann_whitney_u(spark, SF_DIR).collect()
    }

    e = _events_pd()
    allv = e["cents"].to_numpy()
    for ty, g in e.groupby("event_type"):
        x = g["cents"].to_numpy()
        rest = np.sort(
            e.loc[e["event_type"] != ty, "cents"].to_numpy()
        )
        less = np.searchsorted(rest, x, "left").sum()
        eq = (
            np.searchsorted(rest, x, "right")
            - np.searchsorted(rest, x, "left")
        ).sum()
        u2 = 2 * int(less) + int(eq)
        n1, n2, gu2 = got[ty]
        assert (n1, n2) == (len(x), len(allv) - len(x))
        assert gu2 == u2
        # pairing identity: U(x vs rest) + U(rest vs x) = n1*n2
        less_r = (len(x) * len(rest)) - int(less) - int(eq)
        assert u2 + 2 * less_r + int(eq) == 2 * len(x) * len(rest)


def test_hhi_matches_python(spark):
    from llmaix_spark.plans.queries import q_hhi_concentration

    got = {
        r["month_key"]: (r["n_custs"], r["hhi"])
        for r in q_hhi_concentration(spark, SF_DIR).collect()
    }

    mc = (
        _orders_pd()
        .groupby(["month_key", "o_custkey"])["cents"]
        .sum()
        .reset_index()
    )
    for mk, g in mc.groupby("month_key"):
        rev = [int(v) for v in g["cents"]]
        hhi = sum(r * r for r in rev) / (sum(rev) ** 2)
        n, ghhi = got[int(mk)]
        assert n == len(rev)
        assert abs(ghhi - hhi) < 1e-6


def test_max_concurrency_matches_python(spark):
    """Brute-force sweep over event boundaries, half-open intervals:
    concurrency at instant t = #{i: start_i <= t < end_i}."""
    from llmaix_spark.plans.queries import q_max_concurrency

    got = {
        r["event_type"]: (r["peak"], r["peak_at_us"])
        for r in q_max_concurrency(spark, SF_DIR).collect()
    }

    e = _events_pd()
    e["end_us"] = e["us"] + e["cents"] * 10_000
    for ty, g in e.groupby("event_type"):
        starts = np.sort(g["us"].to_numpy())
        ends = np.sort(g["end_us"].to_numpy())
        best, best_t = -1, None
        for t in starts:  # peaks occur at starts (half-open)
            c = int(
                np.searchsorted(starts, t, "right")
                - np.searchsorted(ends, t, "right")
            )
            if c > best:
                best, best_t = c, int(t)
        assert got[ty] == (best, best_t)


def test_growth_accounting_matches_python(spark):
    from llmaix_spark.plans.queries import q_growth_accounting

    got = {
        r["week"]: (
            r["n_active"],
            r["n_new"],
            r["n_retained"],
            r["n_resurrected"],
            r["n_churned"],
        )
        for r in q_growth_accounting(spark, SF_DIR).collect()
    }

    e = _events_pd()
    e["week"] = (e["us"] // DAY_US) // 7
    active: dict[int, set] = {
        int(w): set(g["user_id"]) for w, g in e.groupby("week")
    }
    seen: set = set()
    weeks = sorted(active)
    last_week_of: dict = {}
    for w in weeks:
        users = active[w]
        new = sum(1 for u in users if u not in seen)
        retained = sum(
            1 for u in users if last_week_of.get(u) == w - 1
        )
        resurrected = sum(
            1
            for u in users
            if u in seen and last_week_of.get(u, w) < w - 1
        )
        prev_active = len(active.get(w - 1, set()))
        churned = prev_active - retained
        assert got[w] == (len(users), new, retained, resurrected, churned)
        seen |= users
        for u in users:
            last_week_of[u] = w
