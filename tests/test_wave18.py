"""Plan pins, partition invariance, and python twins for the round-18
wave (shipping SLA / Fano factor / funnel integrity / reactivation
latency / hourly envelope / discount elasticity).
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_shipping_sla_equi_join(spark):
    from llmaix_spark.plans.queries import q_shipping_sla

    plan = _phys(q_shipping_sla(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


def test_fano_no_window(spark):
    from llmaix_spark.plans.queries import q_fano_factor

    plan = _phys(q_fano_factor(spark, SF_DIR))
    assert "Window" not in plan
    assert "rangepartitioning" not in plan


def test_sequence_violations_no_window_no_join(spark):
    """Two nested aggregates — never a window or a join."""
    from llmaix_spark.plans.queries import q_sequence_violations

    plan = _phys(q_sequence_violations(spark, SF_DIR))
    assert "Window" not in plan
    assert "Join" not in plan


def test_reactivation_single_window(spark):
    from llmaix_spark.plans.queries import q_reactivation_latency

    plan = _phys(q_reactivation_latency(spark, SF_DIR))
    assert plan.count("Window") == 1
    assert "rangepartitioning" not in plan


def test_discount_baseline_broadcasts(spark):
    from llmaix_spark.plans.queries import q_discount_elasticity

    plan = _phys(q_discount_elasticity(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "shipping_sla",
        "fano_factor",
        "sequence_violations",
        "reactivation_latency",
        "hourly_envelope",
        "discount_elasticity",
    ],
)
def test_wave18_partition_invariance(spark, qname):
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


def test_shipping_sla_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_shipping_sla

    got = {
        r["priority"]: (r["n_lines"], r["p50_days"], r["p90_days"], r["max_days"])
        for r in q_shipping_sla(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["days"] = (
        j["l_shipdate"].astype("int64") // DAY_US
        - j["o_orderdate"].astype("int64") // DAY_US
    )
    for pr, g in j.groupby("o_orderpriority"):
        v = sorted(g["days"])
        n = len(v)
        p50 = v[(n + 1) // 2 - 1]
        p90 = v[(9 * n + 9) // 10 - 1]
        assert got[pr] == (n, p50, p90, max(v))
        assert p50 <= p90 <= max(v)


def test_fano_matches_python(spark):
    from llmaix_spark.plans.queries import q_fano_factor

    got = {
        r["event_type"]: (r["n_hours"], r["fano"])
        for r in q_fano_factor(spark, SF_DIR).collect()
    }

    e = _events_pd()
    e["hour"] = e["us"] // HOUR_US
    for ty, g in e.groupby("event_type"):
        x = list(g.groupby("hour").size())
        n = len(x)
        sx, sxx = sum(x), sum(v * v for v in x)
        fano = (n * sxx - sx * sx) / ((n - 1) * sx)
        gn, gf = got[ty]
        assert gn == n
        assert abs(gf - fano) < 1e-6
        assert gf >= 0


def test_sequence_violations_matches_python(spark):
    from llmaix_spark.plans.queries import q_sequence_violations

    row = q_sequence_violations(spark, SF_DIR).collect()[0]

    e = _events_pd()
    first = {}
    for (u, ty), g in e.groupby(["user_id", "event_type"]):
        first[(u, ty)] = int(g["us"].min())
    users = sorted({u for u, _ in first})
    purch = [u for u in users if (u, "purchase") in first]
    viol = [
        u
        for u in purch
        if (u, "signup") not in first
        or first[(u, "purchase")] < first[(u, "signup")]
    ]
    assert row["n_purchasers"] == len(purch)
    assert row["n_violating"] == len(viol)
    assert abs(row["violation_share"] - len(viol) / len(purch)) < 1e-6


def test_reactivation_matches_python(spark):
    from collections import Counter

    from llmaix_spark.plans.queries import q_reactivation_latency

    got = {
        r["gap_days"]: (r["n_gaps"], r["n_users"])
        for r in q_reactivation_latency(spark, SF_DIR).collect()
    }

    e = _events_pd()
    cnt: Counter = Counter()
    users: dict[int, set] = {}
    for u, g in e.groupby("user_id"):
        days = sorted(set(g["day"]))
        for a, b in zip(days, days[1:]):
            if b - a >= 2:
                cnt[b - a] += 1
                users.setdefault(b - a, set()).add(u)
    want = {g: (n, len(users[g])) for g, n in cnt.items()}
    assert got == want


def test_hourly_envelope_matches_python(spark):
    from llmaix_spark.plans.queries import q_hourly_envelope

    got = {
        r["hod"]: (r["n_days"], r["p10"], r["p50"], r["p90"])
        for r in q_hourly_envelope(spark, SF_DIR).collect()
    }

    e = _events_pd()
    e["hod"] = (e["us"] // HOUR_US) % 24
    for hod, g in e.groupby("hod"):
        x = sorted(g.groupby("day").size())
        n = len(x)
        p10 = x[max(1, (n + 9) // 10) - 1]
        p50 = x[(n + 1) // 2 - 1]
        p90 = x[(9 * n + 9) // 10 - 1]
        assert got[int(hod)] == (n, p10, p50, p90)
        assert p10 <= p50 <= p90


def test_discount_elasticity_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_discount_elasticity

    got = {
        r["disc_pct"]: (r["n_lines"], r["sum_qty"], r["qty_ratio_vs_zero"])
        for r in q_discount_elasticity(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["disc"] = (li["l_discount"] * 100).round().astype(int)
    li["qty"] = li["l_quantity"].round().astype(int)
    per = li.groupby("disc").agg(n=("qty", "size"), q=("qty", "sum"))
    n0, q0 = int(per.loc[0, "n"]), int(per.loc[0, "q"])
    for disc, row in per.iterrows():
        n, q = int(row["n"]), int(row["q"])
        gn, gq, gr = got[int(disc)]
        assert (gn, gq) == (n, q)
        assert abs(gr - (q * n0) / (n * q0)) < 1e-6
    # the zero-discount row is its own baseline
    assert abs(got[0][2] - 1.0) < 1e-9
