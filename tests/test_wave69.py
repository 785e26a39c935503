"""Plan pins, partition invariance, and python twins for the round-69
wave (Kuiper 2-sample / Cucconi / Mood scale / Bartlett variance /
Cox–Stuart trend / G-test crosstab).
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _daily_counts():
    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    per_day = Counter(d.date() for d in o["o_orderdate"])
    return [per_day[d] for d in sorted(per_day)]


def _rn_hists():
    import pandas as pd

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    hr: Counter = Counter()
    hn: Counter = Counter()
    for fl, q in zip(li["l_returnflag"], li["l_quantity"]):
        if fl == "R":
            hr[_rnd(q)] += 1
        elif fl == "N":
            hn[_rnd(q)] += 1
    return hr, hn


# ---------------------------------------------------------------------------
# structural properties


def test_kuiper_structure(spark):
    from llmaix_spark.plans.queries import q_kuiper_two_sample

    row = q_kuiper_two_sample(spark, SF_DIR).collect()[0]
    assert row["d_plus"] >= 0 and row["d_minus"] >= 0
    # V is the sum of the one-sided deviations, each a sub-unit ECDF gap
    assert abs(row["kuiper_v"] - (row["d_plus"] + row["d_minus"])) < 1e-5
    assert 0 <= row["kuiper_v"] <= 2
    assert row["differ_05"] == (row["kuiper_stat"] > 1.747)


def test_cucconi_structure(spark):
    from llmaix_spark.plans.queries import q_cucconi_test

    row = q_cucconi_test(spark, SF_DIR).collect()[0]
    assert row["cucconi_c"] >= 0
    assert row["differ_05"] == (row["cucconi_c"] > 2.995732)


def test_mood_scale_structure(spark):
    from llmaix_spark.plans.queries import q_mood_scale_test

    row = q_mood_scale_test(spark, SF_DIR).collect()[0]
    assert row["t_stat"] > 0
    assert row["scale_differs_05"] == (abs(row["z_stat"]) > 1.96)


def test_bartlett_structure(spark):
    from llmaix_spark.plans.queries import q_bartlett_variance

    row = q_bartlett_variance(spark, SF_DIR).collect()[0]
    assert row["k_groups"] == 3
    assert row["bartlett_t"] >= 0
    assert row["pooled_var"] > 0
    assert row["unequal_var_05"] == (row["bartlett_t"] > 5.991)


def test_cox_stuart_structure(spark):
    from llmaix_spark.plans.queries import q_cox_stuart_trend

    row = q_cox_stuart_trend(spark, SF_DIR).collect()[0]
    assert row["n_positive"] + row["n_negative"] == row["n_pairs"]
    assert row["n_pairs"] <= row["n_days"] // 2
    assert row["trend_05"] == (row["z_stat"] > 1.96)


def test_g_test_structure(spark):
    from llmaix_spark.plans.queries import q_g_test_crosstab

    row = q_g_test_crosstab(spark, SF_DIR).collect()[0]
    assert row["n_cells"] <= 6
    assert row["g_stat"] >= 0
    assert row["freeman_tukey"] >= 0
    assert row["dependent_05"] == (row["g_stat"] > 5.991)


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "kuiper_two_sample",
        "cucconi_test",
        "mood_scale_test",
        "bartlett_variance",
        "cox_stuart_trend",
        "g_test_crosstab",
    ],
)
def test_partition_invariance(spark, qname):
    from llmaix_spark.plans.queries import QUERIES

    fn = QUERIES[qname]
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


def _mid_scores():
    """Combined midranks per distinct value for the R/N pooled sample."""
    hr, hn = _rn_hists()
    vals = sorted(set(hr) | set(hn))
    cum = 0
    mid = {}
    for v in vals:
        t = hr.get(v, 0) + hn.get(v, 0)
        mid[v] = cum + (t + 1) / 2
        cum += t
    return hr, hn, vals, mid, cum


def test_kuiper_matches_python(spark):
    from llmaix_spark.plans.queries import q_kuiper_two_sample

    row = q_kuiper_two_sample(spark, SF_DIR).collect()[0]

    hr, hn = _rn_hists()
    n1, n2 = sum(hr.values()), sum(hn.values())
    cum1 = cum2 = 0
    dp = dm = 0.0
    for v in sorted(set(hr) | set(hn)):
        cum1 += hr.get(v, 0)
        cum2 += hn.get(v, 0)
        gap = cum1 / n1 - cum2 / n2
        dp = max(dp, gap)
        dm = max(dm, -gap)
    ne = n1 * n2 / (n1 + n2)
    stat = (math.sqrt(ne) + 0.155 + 0.24 / math.sqrt(ne)) * (dp + dm)
    assert row["n_r"] == n1 and row["n_n"] == n2
    assert abs(row["d_plus"] - dp) < 1e-5
    assert abs(row["d_minus"] - dm) < 1e-5
    assert abs(row["kuiper_stat"] - stat) < 1e-3


def test_cucconi_matches_python(spark):
    from llmaix_spark.plans.queries import q_cucconi_test

    row = q_cucconi_test(spark, SF_DIR).collect()[0]

    hr, hn, vals, mid, nn = _mid_scores()
    n1 = sum(hr.values())
    n2 = nn - n1
    sumsq = sum(hr.get(v, 0) * mid[v] ** 2 for v in vals)
    contra = sum(hr.get(v, 0) * (nn + 1 - mid[v]) ** 2 for v in vals)
    den = math.sqrt(
        n1 * n2 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5
    )
    u = (6 * sumsq - n1 * (nn + 1) * (2 * nn + 1)) / den
    v = (6 * contra - n1 * (nn + 1) * (2 * nn + 1)) / den
    rho = 2 * (nn * nn - 4) / ((2 * nn + 1) * (8 * nn + 11)) - 1
    c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    assert row["n_r"] == n1 and row["n_n"] == n2
    assert abs(row["u_stat"] - u) < 1e-4
    assert abs(row["v_stat"] - v) < 1e-4
    assert abs(row["cucconi_c"] - c) < 1e-3


def test_mood_scale_matches_python(spark):
    from llmaix_spark.plans.queries import q_mood_scale_test

    row = q_mood_scale_test(spark, SF_DIR).collect()[0]

    hr, hn, vals, mid, nn = _mid_scores()
    n1 = sum(hr.values())
    n2 = nn - n1
    score = {v: (mid[v] - (nn + 1) / 2) ** 2 for v in vals}
    t_stat = sum(hr.get(v, 0) * score[v] for v in vals)
    sbar = sum(
        (hr.get(v, 0) + hn.get(v, 0)) * score[v] for v in vals
    ) / nn
    ss = sum(
        (hr.get(v, 0) + hn.get(v, 0)) * (score[v] - sbar) ** 2
        for v in vals
    )
    var = n1 * n2 * ss / (nn * (nn - 1))
    z = (t_stat - n1 * sbar) / math.sqrt(var)
    assert abs(row["t_stat"] - t_stat) < 0.5
    assert abs(row["z_stat"] - z) < 1e-3


def test_bartlett_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_bartlett_variance

    row = q_bartlett_variance(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    groups: dict = {}
    for fl, q in zip(li["l_returnflag"], li["l_quantity"]):
        groups.setdefault(fl, []).append(_rnd(q * 100) / 100)
    k = len(groups)
    n_tot = sum(len(g) for g in groups.values())
    var = {
        fl: sum((x - sum(g) / len(g)) ** 2 for x in g) / (len(g) - 1)
        for fl, g in groups.items()
    }
    sp2 = sum((len(g) - 1) * var[fl] for fl, g in groups.items()) / (
        n_tot - k
    )
    corr = 1 + (
        sum(1 / (len(g) - 1) for g in groups.values()) - 1 / (n_tot - k)
    ) / (3 * (k - 1))
    t = (
        (n_tot - k) * math.log(sp2)
        - sum((len(g) - 1) * math.log(var[fl]) for fl, g in groups.items())
    ) / corr
    assert row["n_total"] == n_tot
    assert abs(row["pooled_var"] - sp2) < 1e-4
    assert abs(row["bartlett_t"] - t) < 1e-3


def test_cox_stuart_matches_python(spark):
    from llmaix_spark.plans.queries import q_cox_stuart_trend

    row = q_cox_stuart_trend(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    n = len(ys)
    off = n - n // 2
    ds = [
        ys[i + off] - ys[i]
        for i in range(n - off)
        if ys[i + off] != ys[i]
    ]
    m = len(ds)
    pos = sum(1 for d in ds if d > 0)
    z = (abs(pos - m / 2) - 0.5) / (math.sqrt(m) / 2)
    assert row["n_days"] == n
    assert row["n_pairs"] == m
    assert row["n_positive"] == pos
    assert abs(row["z_stat"] - z) < 1e-4


def test_g_test_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_g_test_crosstab

    row = q_g_test_crosstab(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    cells: Counter = Counter(
        zip(li["l_returnflag"], li["l_linestatus"])
    )
    rt: Counter = Counter()
    ct: Counter = Counter()
    for (fl, st), o in cells.items():
        rt[fl] += o
        ct[st] += o
    n = sum(cells.values())
    g = sum(
        2 * o * math.log(o / (rt[fl] * ct[st] / n))
        for (fl, st), o in cells.items()
    )
    ft = sum(
        4 * (math.sqrt(o) - math.sqrt(rt[fl] * ct[st] / n)) ** 2
        for (fl, st), o in cells.items()
    )
    assert row["n_cells"] == len(cells)
    assert row["n_total"] == n
    assert abs(row["g_stat"] - g) < 1e-3
    assert abs(row["freeman_tukey"] - ft) < 1e-3
