"""Plan pins, partition invariance, and python twins for the round-13
wave (target encoding / CUPED / KS statistic / Lorenz curve /
successor entropy / runs test).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_target_encoding_broadcasts(spark):
    from llmaix_spark.plans.queries import q_target_encoding

    plan = _phys(q_target_encoding(spark, SF_DIR))
    assert plan.count("BroadcastExchange") >= 2
    assert "rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_cuped_single_data_rollup(spark):
    """The per-user rollup is the only data-volume stage; θ and the
    prior ride broadcast scalars."""
    from llmaix_spark.plans.queries import q_cuped_adjust

    plan = _phys(q_cuped_adjust(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_ks_windows_on_bounded_frame(spark):
    """The cumulative windows must consume the dense rollup frame, not
    the raw stream — a hash aggregate appears below every window."""
    from llmaix_spark.plans.queries import q_ks_statistic

    plan = _phys(q_ks_statistic(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "HashAggregate" in plan


def test_lorenz_no_range_partitioning(spark):
    """The global ntile sorts the per-customer ROLLUP on a single
    partition (bounded by #customers), never range-partitioning the
    raw orders."""
    from llmaix_spark.plans.queries import q_lorenz_curve

    plan = _phys(q_lorenz_curve(spark, SF_DIR))
    assert "rangepartitioning" not in plan


def test_runs_test_median_broadcasts(spark):
    from llmaix_spark.plans.queries import q_runs_test

    plan = _phys(q_runs_test(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "target_encoding",
        "cuped_adjust",
        "ks_statistic",
        "lorenz_curve",
        "conditional_entropy",
        "runs_test",
    ],
)
def test_wave13_partition_invariance(spark, qname):
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


def test_target_encoding_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_target_encoding

    got = {
        r["segment"]: (r["n"], r["n_pos"], r["enc"])
        for r in q_target_encoding(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    g_n = len(j)
    g_pos = int((j["o_orderstatus"] == "F").sum())
    for seg, g in j.groupby("c_mktsegment"):
        n = len(g)
        pos = int((g["o_orderstatus"] == "F").sum())
        enc = (pos * g_n + 10 * g_pos) / ((n + 10) * g_n)
        gn, gp, ge = got[seg]
        assert (gn, gp) == (n, pos)
        assert abs(ge - enc) < 1e-6
    # smoothing pulls every segment toward the global rate
    rate = g_pos / g_n
    for seg, (n, pos, enc) in got.items():
        raw = pos / n
        assert min(raw, rate) - 1e-9 <= enc <= max(raw, rate) + 1e-9


def test_cuped_matches_python(spark):
    from llmaix_spark.plans.queries import q_cuped_adjust

    got = {
        r["variant"]: (r["n_users"], r["mean_post"], r["adj_mean"], r["theta"])
        for r in q_cuped_adjust(spark, SF_DIR).collect()
    }

    e = _events_pd()
    e["day"] = e["us"] // DAY_US
    d0 = int(e["day"].min())
    pre = e[e["day"] < d0 + 7].groupby("user_id")["cents"].sum()
    post = e[e["day"] >= d0 + 7].groupby("user_id")["cents"].sum()
    users = sorted(set(e["user_id"]))
    x = {u: int(pre.get(u, 0)) for u in users}
    y = {u: int(post.get(u, 0)) for u in users}
    n = len(users)
    sx = sum(x.values())
    sy = sum(y.values())
    sxy = sum(x[u] * y[u] for u in users)
    sxx = sum(x[u] * x[u] for u in users)
    theta = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    gmx = sx / n
    for v in (0, 1):
        vu = [u for u in users if u % 2 == v]
        my = sum(y[u] for u in vu) / len(vu)
        mx = sum(x[u] for u in vu) / len(vu)
        nu, gmp, gadj, gth = got[v]
        assert nu == len(vu)
        assert abs(gmp - my) < 1e-6
        assert abs(gadj - (my - theta * (mx - gmx))) < 1e-5
        assert abs(gth - theta) < 1e-6
    # CUPED preserves the pooled mean direction: adjustments cancel
    tot_adj = sum(got[v][0] * (got[v][2] - got[v][1]) for v in (0, 1))
    assert abs(tot_adj) < 1.0  # n-weighted adjustments sum to ~0


def test_ks_matches_numpy(spark):
    from llmaix_spark.plans.queries import q_ks_statistic

    got = {
        r["event_type"]: (r["n1"], r["n2"], r["ks"])
        for r in q_ks_statistic(spark, SF_DIR).collect()
    }

    e = _events_pd()
    for ty, g in e.groupby("event_type"):
        a = np.sort(g["cents"].to_numpy())
        b = np.sort(e.loc[e["event_type"] != ty, "cents"].to_numpy())
        pool = np.unique(np.concatenate([a, b]))
        f1 = np.searchsorted(a, pool, "right") / len(a)
        f2 = np.searchsorted(b, pool, "right") / len(b)
        d = float(np.max(np.abs(f1 - f2)))
        n1, n2, ks = got[ty]
        assert (n1, n2) == (len(a), len(b))
        assert abs(ks - d) < 1e-6


def test_lorenz_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_lorenz_curve

    got = {
        r["decile"]: (
            r["n_custs"],
            r["rev_cents"],
            r["rev_share"],
            r["cum_share"],
        )
        for r in q_lorenz_curve(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["cents"] = (o["o_totalprice"] * 100).round().astype(int)
    rev = o.groupby("o_custkey")["cents"].sum().reset_index()
    rows = sorted(zip(rev["cents"], rev["o_custkey"]))
    n = len(rows)
    base, extra = divmod(n, 10)
    total = sum(r[0] for r in rows)
    i = 0
    cum = 0
    for dec in range(1, 11):
        size = base + (1 if dec <= extra else 0)
        chunk = rows[i : i + size]
        i += size
        s = sum(r[0] for r in chunk)
        cum += s
        gn, gs, gsh, gcum = got[dec]
        assert (gn, gs) == (size, s)
        assert abs(gsh - s / total) < 1e-6
        assert abs(gcum - cum / total) < 1e-6
    # Lorenz curve is convex: decile shares are non-decreasing
    shares = [got[d][2] for d in range(1, 11)]
    assert shares == sorted(shares)
    assert abs(got[10][3] - 1.0) < 1e-9


def test_conditional_entropy_matches_python(spark):
    from collections import Counter

    import pandas as pd

    from llmaix_spark.plans.queries import q_conditional_entropy

    got = {
        r["tok"]: (r["n_succ"], r["c_a"], r["h_log10"])
        for r in q_conditional_entropy(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    bi: Counter = Counter()
    for t in d["text"]:
        w = t.split(" ")
        bi.update(zip(w, w[1:]))
    ca: Counter = Counter()
    nsucc: Counter = Counter()
    for (a, _), c in bi.items():
        ca[a] += c
        nsucc[a] += 1
    for a in ca:
        mu = sum(
            c
            * int(
                round(
                    (round(math.log10(ca[a]), 6) - round(math.log10(c), 6))
                    * 1_000_000
                )
            )
            for (x, _), c in bi.items()
            if x == a
        )
        h = mu / (ca[a] * 1_000_000)
        gn, gc, gh = got[a]
        assert (gn, gc) == (nsucc[a], ca[a])
        assert abs(gh - round(h, 6)) < 2e-6
        # µlog10 recipe tracks the true successor entropy
        true_h = -sum(
            (c / ca[a]) * math.log10(c / ca[a])
            for (x, _), c in bi.items()
            if x == a
        )
        assert abs(gh - true_h) < 1e-4


def test_runs_test_matches_python(spark):
    from llmaix_spark.plans.queries import q_runs_test

    got = {
        r["event_type"]: (r["n_plus"], r["n_minus"], r["runs"])
        for r in q_runs_test(spark, SF_DIR).collect()
    }

    e = _events_pd()
    for ty, g in e.groupby("event_type"):
        vals = sorted(zip(g["cents"], g["event_id"]))
        med = vals[(len(vals) + 1) // 2 - 1][0]
        seq = [
            1 if c > med else 0
            for c, _ in sorted(
                zip(g["cents"], zip(g["us"], g["event_id"])),
                key=lambda p: p[1],
            )
            if c != med
        ]
        runs = 1 + sum(
            1 for a, b in zip(seq, seq[1:]) if a != b
        )
        assert got[ty] == (sum(seq), len(seq) - sum(seq), runs)
