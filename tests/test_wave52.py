"""Plan pins, partition invariance, and python twins for the round-52
wave (reuse distance / forecast baselines / l-diversity / kNN hubness /
Bland-Altman / Erlang-C staffing).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().strip().split(" ") if t]


# ---------------------------------------------------------------------------
# structural properties


def test_reuse_hit_rates_monotone(spark):
    from llmaix_spark.plans.queries import q_reuse_distance

    row = q_reuse_distance(spark, SF_DIR).collect()[0]
    assert row["n_reuses"] > 0
    # a bigger cache can only hit more
    assert row["hit_rate_c16"] >= row["hit_rate_c4"]
    assert 0 <= row["hit_rate_c4"] <= 1
    assert row["mean_reuse_distance"] >= 0


def test_forecast_snaive_context(spark):
    from llmaix_spark.plans.queries import q_forecast_baselines

    rows = {r["fc_method"]: r for r in q_forecast_baselines(spark, SF_DIR).collect()}
    assert set(rows) == {"naive", "snaive", "drift"}
    for r in rows.values():
        assert r["n_test"] == 28
        assert r["mae"] >= 0 and r["mase"] >= 0


def test_l_diversity_vs_k(spark):
    from llmaix_spark.plans.queries import q_l_diversity

    row = q_l_diversity(spark, SF_DIR).collect()[0]
    assert row["n_groups"] <= 125
    # l can never exceed k for a group, so min_l <= min_k is NOT
    # guaranteed globally; but l is at most the decile count
    assert 1 <= row["min_l"] <= 10
    assert row["min_l"] <= row["mean_l"]
    assert 0 <= row["share_below_l3"] <= 1


def test_hubness_moments(spark):
    from llmaix_spark.plans.queries import q_knn_hubness

    row = q_knn_hubness(spark, SF_DIR).collect()[0]
    # every point emits exactly 3 edges → mean in-degree is exactly 3
    assert abs(row["mean_in_degree"] - 3.0) < 1e-6
    assert row["max_in_degree"] >= 3
    # random high-dim data is hub-prone: right-skewed k-occurrence
    assert row["k_occurrence_skew"] > 0


def test_bland_altman_limits(spark):
    from llmaix_spark.plans.queries import q_bland_altman

    row = q_bland_altman(spark, SF_DIR).collect()[0]
    assert row["loa_lower"] < row["mean_diff"] < row["loa_upper"]
    # ~5% outside the limits by construction of 1.96·SD
    assert 0 <= row["share_outside"] <= 0.2


def test_erlang_monotone_in_servers(spark):
    from llmaix_spark.plans.queries import q_erlang_c_staffing

    rows = {r["servers"]: r for r in q_erlang_c_staffing(spark, SF_DIR).collect()}
    assert set(rows) == {2, 4}
    # more servers → lower blocking and lower wait probability
    assert rows[4]["erlang_b"] <= rows[2]["erlang_b"]
    assert rows[4]["erlang_c"] <= rows[2]["erlang_c"]
    for r in rows.values():
        assert 0 <= r["erlang_b"] <= 1
        assert 0 <= r["erlang_c"] <= 1


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "reuse_distance",
        "forecast_baselines",
        "l_diversity",
        "knn_hubness",
        "bland_altman",
        "erlang_c_staffing",
    ],
)
def test_wave52_partition_invariance(spark, qname):
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


def test_reuse_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_reuse_distance

    row = q_reuse_distance(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m = m.assign(
        us=m["o_orderdate"].astype("datetime64[ns]").astype("int64") // 1000
    )
    events = sorted(
        {
            (int(r.o_custkey), int(r.l_partkey), int(r.us), int(r.l_orderkey))
            for r in m.itertuples()
        }
    )
    by_cust = defaultdict(list)
    for cust, part, us, ok in events:
        by_cust[cust].append((us, ok, part))
    n_reuses = 0
    s_rd = 0
    h4 = h16 = 0
    for cust, evs in by_cust.items():
        evs.sort()
        by_part = defaultdict(list)
        for us, ok, part in evs:
            by_part[part].append((us, ok))
        for part, occ in by_part.items():
            for (u0, k0), (u1, k1) in zip(occ, occ[1:]):
                mids = {
                    p
                    for (u, k, p) in evs
                    if p != part
                    and ((u > u0) or (u == u0 and k > k0))
                    and ((u < u1) or (u == u1 and k < k1))
                }
                rd = len(mids)
                n_reuses += 1
                s_rd += rd
                h4 += rd < 4
                h16 += rd < 16
    assert row["n_reuses"] == n_reuses
    assert abs(row["mean_reuse_distance"] - s_rd / n_reuses) < 1e-6
    assert abs(row["hit_rate_c4"] - h4 / n_reuses) < 1e-6
    assert abs(row["hit_rate_c16"] - h16 / n_reuses) < 1e-6


def test_forecast_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_forecast_baselines

    got = {r["fc_method"]: r for r in q_forecast_baselines(spark, SF_DIR).collect()}

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    daily = sorted(Counter(o["o_orderdate"].dt.date).items())
    ys = [y for _, y in daily]
    n = len(ys)
    # training prefix: 1-based i < n - 27 with a defined lag, i.e.
    # 0-based diff indices 1..n-29
    tr_abs = [abs(ys[i] - ys[i - 1]) for i in range(1, n - 28)]
    s = sum(tr_abs) / len(tr_abs)
    test_idx = list(range(n - 28, n))
    preds = {
        "naive": [(ys[i], float(ys[i - 1])) for i in test_idx],
        "snaive": [(ys[i], float(ys[i - 7])) for i in test_idx],
        "drift": [
            (ys[i], ys[i - 1] + (ys[i - 1] - ys[0]) / (i + 1 - 2))
            for i in test_idx
        ],
    }
    for name, ps in preds.items():
        mae = sum(_rnd(abs(y - p) * 1e6) for y, p in ps) / (len(ps) * 1e6)
        g = got[name]
        assert abs(g["mae"] - round(mae, 6)) < 1e-9
        assert abs(g["mase"] - round(round(mae, 6) / s, 6)) < 1e-9


def test_l_diversity_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_l_diversity

    row = q_l_diversity(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nt = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        nt, left_on="c_nationkey", right_on="n_nationkey"
    )
    cents = [_rnd(p * 100) for p in m["o_totalprice"]]
    mc = max(cents)
    groups = defaultdict(set)
    ks = defaultdict(int)
    for nat, pri, cc in zip(m["n_name"], m["o_orderpriority"], cents):
        sens = min(9, cc * 10 // (mc + 1))
        groups[(nat, pri)].add(sens)
        ks[(nat, pri)] += 1
    ls = {k: len(v) for k, v in groups.items()}
    assert row["n_groups"] == len(ls)
    assert row["min_k"] == min(ks.values())
    assert row["min_l"] == min(ls.values())
    assert abs(row["mean_l"] - sum(ls.values()) / len(ls)) < 1e-6
    below = sum(1 for v in ls.values() if v < 3)
    assert abs(row["share_below_l3"] - below / len(ls)) < 1e-6


def test_bland_altman_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_bland_altman

    row = q_bland_altman(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    d2 = [
        len(_tokens(r.text)) * 11 - int(r.n_chars) * 2 for r in d.itertuples()
    ]
    n = len(d2)
    s = sum(d2)
    ss = sum(x * x for x in d2)
    mean_d = s / n / 2
    sd = math.sqrt((ss * n - s * s) / (n * (n - 1)) / 4)
    lo, hi = round(mean_d - 1.96 * sd, 6), round(mean_d + 1.96 * sd, 6)
    outside = sum(1 for x in d2 if x / 2 < lo or x / 2 > hi)
    assert row["n_docs"] == n
    assert abs(row["mean_diff"] - mean_d) < 1e-6
    assert row["loa_lower"] == lo and row["loa_upper"] == hi
    assert abs(row["share_outside"] - outside / n) < 1e-6


def test_erlang_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_erlang_c_staffing

    got = {r["servers"]: r for r in q_erlang_c_staffing(spark, SF_DIR).collect()}

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    us = e["ts"].astype("datetime64[ns]").astype("int64") // 1000
    n = len(us)
    lam = n / ((int(us.max()) - int(us.min())) / 1e6)
    a = lam * 60.0
    b = 1.0
    bs = {}
    for cc in (1, 2, 3, 4):
        b = a * b / (cc + a * b)
        bs[cc] = b
    for cc in (2, 4):
        rho = a / cc
        ec = bs[cc] / (1 - rho * (1 - bs[cc])) if rho < 1 else 1.0
        ec = min(max(ec, 0.0), 1.0)
        g = got[cc]
        assert abs(g["offered_load"] - a) < 1e-5
        assert abs(g["utilization"] - rho) < 1e-6
        assert abs(g["erlang_b"] - bs[cc]) < 1e-6
        assert abs(g["erlang_c"] - ec) < 1e-6
