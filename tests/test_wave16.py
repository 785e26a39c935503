"""Plan pins, partition invariance, and python twins for the round-16
wave (zone-map pruning / late-arrival audit / co-occurrence lift /
channel cohorts / weekly stickiness / basket sizes).
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_zonemap_no_sort_anywhere(spark):
    """Block ids come from integer division on the layout column — the
    simulation must not sort anything."""
    from llmaix_spark.plans.queries import q_zonemap_prune_sim

    plan = _phys(q_zonemap_prune_sim(spark, SF_DIR))
    assert "Sort" not in plan
    assert "Window" not in plan
    assert "rangepartitioning" not in plan


def test_late_arrival_single_window(spark):
    from llmaix_spark.plans.queries import q_late_arrival_audit

    plan = _phys(q_late_arrival_audit(spark, SF_DIR))
    assert plan.count("Window") == 1
    assert "rangepartitioning" not in plan


def test_lift_marginals_broadcast(spark):
    from llmaix_spark.plans.queries import q_daily_cooccurrence_lift

    plan = _phys(q_daily_cooccurrence_lift(spark, SF_DIR))
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan


def test_cohort_no_window(spark):
    """Firsts reduce with min(struct) — never a per-user row_number
    window; the probe join is equi-keyed."""
    from llmaix_spark.plans.queries import q_cohort_by_channel

    plan = _phys(q_cohort_by_channel(spark, SF_DIR))
    assert "Window" not in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_basket_hist_no_window(spark):
    from llmaix_spark.plans.queries import q_basket_size_hist

    plan = _phys(q_basket_size_hist(spark, SF_DIR))
    assert "Window" not in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "zonemap_prune_sim",
        "late_arrival_audit",
        "daily_cooccurrence_lift",
        "cohort_by_channel",
        "stickiness_weekly",
        "basket_size_hist",
    ],
)
def test_wave16_partition_invariance(spark, qname):
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
    e["us"] = e["ts"].astype("int64")  # fixtures are µs-precision
    e["day"] = e["us"] // DAY_US
    return e


def test_zonemap_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_zonemap_prune_sim

    got = {
        r["layout"]: (r["n_blocks"], r["n_pruned"], r["prune_rate"])
        for r in q_zonemap_prune_sim(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["day"] = o["o_orderdate"].astype("int64") // DAY_US
    lo, hi = 9497, 9862
    for name, key in (
        ("by_orderkey", o["o_orderkey"] // 256),
        ("by_day", o["day"] // 8),
    ):
        g = o.groupby(key)["day"].agg(["min", "max"])
        pruned = int(((g["max"] < lo) | (g["min"] > hi)).sum())
        nb, np_, pr = got[name]
        assert (nb, np_) == (len(g), pruned)
        assert abs(pr - pruned / len(g)) < 1e-6
    # a date predicate prunes the date-clustered layout better
    assert got["by_day"][2] >= got["by_orderkey"][2]


def test_late_arrival_matches_python(spark):
    from llmaix_spark.plans.queries import q_late_arrival_audit

    got = {
        r["event_type"]: (
            r["n_events"],
            r["n_late"],
            r["max_late_us"],
            r["late_share"],
        )
        for r in q_late_arrival_audit(spark, SF_DIR).collect()
    }

    e = _events_pd()
    for ty, g in e.groupby("event_type"):
        run, late, mx = 0, 0, 0
        for _, us in sorted(zip(g["event_id"], g["us"])):
            run = max(run, us)
            l = run - us
            mx = max(mx, l)
            if l > 1_800_000_000:
                late += 1
        n, nl, gm, sh = got[ty]
        assert (n, nl, gm) == (len(g), late, mx)
        assert abs(sh - late / len(g)) < 1e-6


def test_lift_matches_python(spark):
    from llmaix_spark.plans.queries import q_daily_cooccurrence_lift

    got = {
        (r["type_a"], r["type_b"]): (r["n_ab"], r["lift"])
        for r in q_daily_cooccurrence_lift(spark, SF_DIR).collect()
    }

    e = _events_pd()
    ud = e.groupby(["user_id", "day"])["event_type"].agg(set)
    n = len(ud)
    types = sorted(e["event_type"].unique())
    marg = {t: int(ud.apply(lambda s: t in s).sum()) for t in types}
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            nab = int(ud.apply(lambda s: a in s and b in s).sum())
            if nab == 0:
                assert (a, b) not in got
                continue
            gn, gl = got[(a, b)]
            assert gn == nab
            assert abs(gl - nab * n / (marg[a] * marg[b])) < 1e-6


def test_cohort_matches_python(spark):
    from llmaix_spark.plans.queries import q_cohort_by_channel

    got = {
        (r["channel"], r["day_k"]): (
            r["n_cohort"],
            r["n_active"],
            r["retention"],
        )
        for r in q_cohort_by_channel(spark, SF_DIR).collect()
    }

    e = _events_pd()
    firsts = {}
    for _, r in e.sort_values(["us", "event_id"]).iterrows():
        firsts.setdefault(r["user_id"], (r["event_type"], int(r["day"])))
    act = set(zip(e["user_id"], e["day"]))
    channels = sorted({c for c, _ in firsts.values()})
    for ch in channels:
        members = [
            (u, d0) for u, (c, d0) in firsts.items() if c == ch
        ]
        for k in (1, 7):
            alive = sum(1 for u, d0 in members if (u, d0 + k) in act)
            nc, na, rt = got[(ch, k)]
            assert (nc, na) == (len(members), alive)
            assert abs(rt - alive / len(members)) < 1e-6


def test_stickiness_matches_python(spark):
    from llmaix_spark.plans.queries import q_stickiness_weekly

    got = {
        r["week"]: (r["n_days"], r["wau"], r["stickiness"])
        for r in q_stickiness_weekly(spark, SF_DIR).collect()
    }

    e = _events_pd()
    e["week"] = e["day"] // 7
    for wk, g in e.groupby("week"):
        days = g.groupby("day")["user_id"].nunique()
        wau = g["user_id"].nunique()
        st = int(days.sum()) / (len(days) * wau)
        gn, gw, gs = got[int(wk)]
        assert (gn, gw) == (len(days), wau)
        assert abs(gs - st) < 1e-6
        assert 0 < gs <= 1  # mean DAU can never exceed WAU


def test_basket_hist_matches_python(spark):
    from collections import Counter

    import pandas as pd

    from llmaix_spark.plans.queries import q_basket_size_hist

    got = {
        r["basket_size"]: (r["n_orders"], r["order_share"], r["line_share"])
        for r in q_basket_size_hist(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    sizes = Counter(li.groupby("l_orderkey").size())
    t_orders = sum(sizes.values())
    t_lines = sum(k * v for k, v in sizes.items())
    assert t_lines == len(li)
    for k, n in sizes.items():
        gn, gos, gls = got[k]
        assert gn == n
        assert abs(gos - n / t_orders) < 1e-6
        assert abs(gls - k * n / t_lines) < 1e-6
    # shares each sum to 1
    assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-4
    assert abs(sum(v[2] for v in got.values()) - 1.0) < 1e-4
