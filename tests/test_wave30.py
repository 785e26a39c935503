"""Plan pins, partition invariance, and python twins for the round-30
wave (diurnal phase / standardized repeat / weekday-priority
residuals / funnel Wilson / price endings / type co-frequency).
"""

from __future__ import annotations

import math

import pytest

SF_DIR = "/root/testdata/sf0.001"

HOUR_US = 3_600_000_000


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_phase_no_window_no_join(spark):
    from llmaix_spark.plans.queries import q_diurnal_phase

    plan = _phys(q_diurnal_phase(spark, SF_DIR))
    assert "Window" not in plan
    assert "Join" not in plan


def test_smr_cohort_rates_broadcast(spark):
    from llmaix_spark.plans.queries import q_standardized_repeat

    plan = _phys(q_standardized_repeat(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_residuals_margins_broadcast(spark):
    from llmaix_spark.plans.queries import q_weekday_priority_residuals

    plan = _phys(q_weekday_priority_residuals(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_funnel_wilson_single_user_agg(spark):
    from llmaix_spark.plans.queries import q_funnel_wilson

    plan = _phys(q_funnel_wilson(spark, SF_DIR))
    assert "Join" not in plan
    assert "Window" not in plan


def test_endings_bounded_topk(spark):
    from llmaix_spark.plans.queries import q_price_endings

    plan = _phys(q_price_endings(spark, SF_DIR))
    # the window ranks <= 100 ending rows — bounded by construction
    assert "CartesianProduct" not in plan


def test_cofrequency_counts_broadcast(spark):
    from llmaix_spark.plans.queries import q_type_cofrequency

    plan = _phys(q_type_cofrequency(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "diurnal_phase",
        "standardized_repeat",
        "weekday_priority_residuals",
        "funnel_wilson",
        "price_endings",
        "type_cofrequency",
    ],
)
def test_wave30_partition_invariance(spark, qname):
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


def test_phase_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_diurnal_phase

    got = {
        r["event_type"]: (
            r["n_events"],
            r["peak_hour"],
            r["resultant"],
            r["circ_mean_hour"],
        )
        for r in q_diurnal_phase(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["hod"] = (e["ts"].astype("int64") // HOUR_US) % 24
    for et, g in e.groupby("event_type"):
        counts = g.groupby("hod").size().to_dict()
        n = len(g)
        scx = ssx = 0
        for h, c in counts.items():
            cx = c * round(math.cos(2 * math.pi * h / 24), 9) * 1e6
            sx = c * round(math.sin(2 * math.pi * h / 24), 9) * 1e6
            scx += int(math.copysign(math.floor(abs(cx) + 0.5), cx))
            ssx += int(math.copysign(math.floor(abs(sx) + 0.5), sx))
        peak = max(counts, key=lambda h: counts[h] * 100 - h)
        res = math.sqrt(scx * scx + ssx * ssx) / (n * 1e6)
        mean_h = (24 / (2 * math.pi)) * math.atan2(ssx, scx)
        gn, gp, gr, gm = got[et]
        assert (gn, gp) == (n, peak)
        assert abs(gr - res) < 1e-5
        assert abs(gm - mean_h) < 1e-4
        assert 0 <= gr <= 1


def test_smr_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_standardized_repeat

    got = {
        r["seg"]: (
            r["n_customers"],
            r["observed_repeats"],
            r["expected_repeats"],
            r["smr"],
        )
        for r in q_standardized_repeat(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    o["mk"] = o["o_orderdate"].dt.year * 12 + o["o_orderdate"].dt.month
    f = o.groupby("o_custkey").agg(
        cohort=("mk", "min"), cnt=("mk", "size")
    )
    f["repeats"] = f["cnt"] - 1
    j = c.merge(f, left_on="c_custkey", right_index=True)
    rate = {
        coh: round(g["repeats"].mean(), 9)
        for coh, g in j.groupby("cohort")
    }
    for seg, g in j.groupby("c_mktsegment"):
        obs = int(g["repeats"].sum())
        exp = sum(rate[coh] for coh in g["cohort"])
        gn, go, ge, gs = got[seg]
        assert (gn, go) == (len(g), obs)
        assert abs(ge - exp) < 1e-4
        assert abs(gs - obs / exp) < 1e-4
    # SMRs average near 1 by construction
    assert abs(
        sum(v[1] for v in got.values())
        - sum(v[2] for v in got.values())
    ) < 1e-3 * sum(v[1] for v in got.values()) + 1


def test_residuals_match_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_weekday_priority_residuals

    got = {
        (r["dow"], r["priority"]): (r["n"], r["expected"], r["adj_residual"])
        for r in q_weekday_priority_residuals(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    # DuckDB dayofweek: 0=Sunday..6
    o["dow"] = (o["o_orderdate"].dt.dayofweek + 1) % 7
    cell = o.groupby(["dow", "o_orderpriority"]).size()
    nr = o.groupby("dow").size()
    nc = o.groupby("o_orderpriority").size()
    nt = len(o)
    resid_sum = 0.0
    for (dow, pr), n in cell.items():
        e = nr[dow] * nc[pr] / nt
        den = math.sqrt(e * (1 - nr[dow] / nt) * (1 - nc[pr] / nt))
        z = (n - e) / den
        gn, ge, gz = got[(dow, pr)]
        assert gn == n
        assert abs(ge - e) < 1e-4
        assert abs(gz - z) < 1e-4
        resid_sum += z
    # adjusted residuals are centered near zero over the table
    assert abs(resid_sum) < len(cell)


def test_funnel_wilson_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_funnel_wilson

    got = {
        r["step"]: (r["n"], r["x"], r["rate"], r["wilson_lo"], r["wilson_hi"])
        for r in q_funnel_wilson(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["us"] = e["ts"].astype("int64")
    s0 = s1 = s2 = 0
    for _, g in e.groupby("user_id"):
        t0 = g.loc[g["event_type"] == "signup", "us"].min()
        t1 = g.loc[g["event_type"] == "click", "us"].min()
        t2 = g.loc[g["event_type"] == "purchase", "us"].min()
        if pd.notna(t0):
            s0 += 1
            if pd.notna(t1) and t1 > t0:
                s1 += 1
                if pd.notna(t2) and t2 > t1:
                    s2 += 1
    for step, (x, n) in {
        "signup->click": (s1, s0),
        "click->purchase": (s2, s1),
    }.items():
        gn, gx, gr, glo, ghi = got[step]
        assert (gn, gx) == (n, x)
        assert abs(gr - x / n) < 1e-6
        center = (x + 1.92) / (n + 3.84)
        half = 1.96 / (n + 3.84) * math.sqrt(x * (n - x) / n + 0.96)
        assert abs(glo - (center - half)) < 1e-5
        assert abs(ghi - (center + half)) < 1e-5
        assert glo <= gr <= ghi


def test_endings_match_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_price_endings

    got = {
        r["ending"]: (r["n"], r["ending_share"])
        for r in q_price_endings(spark, SF_DIR).collect()
    }
    assert len(got) == 10

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    endings = (
        np.floor(o["o_totalprice"] * 100 + 0.5).astype(int) % 100
    )
    counts = endings.value_counts()
    top = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    for ending, n in top:
        gn, gs = got[int(ending)]
        assert gn == n
        assert abs(gs - n / len(o)) < 1e-6


def test_cofrequency_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_type_cofrequency

    got = {
        (r["type_a"], r["type_b"]): (
            r["n_a"],
            r["n_b"],
            r["n_both"],
            r["user_jaccard"],
        )
        for r in q_type_cofrequency(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    users: dict[str, set] = {}
    for r in e.itertuples():
        users.setdefault(r.event_type, set()).add(r.user_id)
    types = sorted(users)
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            inter = len(users[a] & users[b])
            if not inter:
                assert (a, b) not in got
                continue
            na, nb = len(users[a]), len(users[b])
            gna, gnb, gboth, gj = got[(a, b)]
            assert (gna, gnb, gboth) == (na, nb, inter)
            assert abs(gj - inter / (na + nb - inter)) < 1e-6
