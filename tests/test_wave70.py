"""Plan pins, partition invariance, and python twins for the round-70
wave (Deming regression / Lin CCC / Hotelling T² / Mincer–Zarnowitz /
Diebold–Mariano / Pesaran–Timmermann).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _daily_counts():
    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    per_day = Counter(d.date() for d in o["o_orderdate"])
    return [per_day[d] for d in sorted(per_day)]


def _daily_pairs():
    """(order count, distinct customers) per day, date-sorted."""
    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cnt: Counter = Counter()
    custs: defaultdict = defaultdict(set)
    for d, c in zip(o["o_orderdate"], o["o_custkey"]):
        cnt[d.date()] += 1
        custs[d.date()].add(c)
    return [(cnt[d], len(custs[d])) for d in sorted(cnt)]


def _pair_moments(pairs):
    n = len(pairs)
    mx = sum(x for x, _ in pairs) / n
    my = sum(y for _, y in pairs) / n
    cxx = sum((x - mx) ** 2 for x, _ in pairs) / n
    cyy = sum((y - my) ** 2 for _, y in pairs) / n
    cxy = sum((x - mx) * (y - my) for x, y in pairs) / n
    return n, mx, my, cxx, cyy, cxy


# ---------------------------------------------------------------------------
# structural properties


def test_deming_structure(spark):
    from llmaix_spark.plans.queries import q_deming_regression

    row = q_deming_regression(spark, SF_DIR).collect()[0]
    # OLS attenuates relative to the errors-in-variables slope
    assert 0 < row["attenuation"] <= 1.0 + 1e-6
    assert row["deming_slope"] > 0


def test_ccc_structure(spark):
    from llmaix_spark.plans.queries import q_lin_ccc

    row = q_lin_ccc(spark, SF_DIR).collect()[0]
    assert -1 <= row["ccc"] <= 1
    # |ccc| <= |r| (C_b is in (0, 1])
    assert abs(row["ccc"]) <= abs(row["pearson_r"]) + 1e-6
    assert 0 < row["c_b"] <= 1.0 + 1e-6
    assert row["agreement_strong"] == (row["ccc"] > 0.8)


def test_hotelling_structure(spark):
    from llmaix_spark.plans.queries import q_hotelling_t2

    row = q_hotelling_t2(spark, SF_DIR).collect()[0]
    assert row["t2_stat"] >= 0
    assert row["f_stat"] <= row["t2_stat"] / 2 + 1e-6
    assert row["differ_05"] == (row["f_stat"] > 2.996)


def test_mz_structure(spark):
    from llmaix_spark.plans.queries import q_mincer_zarnowitz

    row = q_mincer_zarnowitz(spark, SF_DIR).collect()[0]
    assert row["f_stat"] >= 0
    assert row["biased_05"] == (row["f_stat"] > 2.996)


def test_dm_structure(spark):
    from llmaix_spark.plans.queries import q_diebold_mariano

    row = q_diebold_mariano(spark, SF_DIR).collect()[0]
    # HLN shrinks |DM| at h=1
    assert abs(row["dm_hln"]) <= abs(row["dm_stat"]) + 1e-6
    assert row["naive_worse_05"] == (row["dm_hln"] > 1.96)


def test_pt_structure(spark):
    from llmaix_spark.plans.queries import q_pesaran_timmermann

    row = q_pesaran_timmermann(spark, SF_DIR).collect()[0]
    assert 0 <= row["hit_rate"] <= 1
    assert 0 <= row["expected_rate"] <= 1
    assert row["skill_05"] == (row["pt_stat"] > 1.645)


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "deming_regression",
        "lin_ccc",
        "hotelling_t2",
        "mincer_zarnowitz",
        "diebold_mariano",
        "pesaran_timmermann",
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


def test_deming_matches_python(spark):
    from llmaix_spark.plans.queries import q_deming_regression

    row = q_deming_regression(spark, SF_DIR).collect()[0]

    pairs = _daily_pairs()
    n, mx, my, cxx, cyy, cxy = _pair_moments(pairs)
    dem = (cyy - cxx + math.sqrt((cyy - cxx) ** 2 + 4 * cxy * cxy)) / (
        2 * cxy
    )
    assert row["n_days"] == n
    assert abs(row["deming_slope"] - dem) < 1e-4
    assert abs(row["deming_intercept"] - (my - dem * mx)) < 1e-3
    assert abs(row["ols_slope"] - cxy / cxx) < 1e-4


def test_ccc_matches_python(spark):
    from llmaix_spark.plans.queries import q_lin_ccc

    row = q_lin_ccc(spark, SF_DIR).collect()[0]

    pairs = _daily_pairs()
    n, mx, my, cxx, cyy, cxy = _pair_moments(pairs)
    r = cxy / math.sqrt(cxx * cyy)
    ccc = 2 * cxy / (cxx + cyy + (mx - my) ** 2)
    assert row["n_days"] == n
    assert abs(row["pearson_r"] - r) < 1e-5
    assert abs(row["ccc"] - ccc) < 1e-5
    assert abs(row["c_b"] - ccc / r) < 1e-5


def test_hotelling_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_hotelling_t2

    row = q_hotelling_t2(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    groups: dict = {"R": [], "N": []}
    for fl, q, dc in zip(
        li["l_returnflag"], li["l_quantity"], li["l_discount"]
    ):
        if fl in groups:
            groups[fl].append((_rnd(q * 100), _rnd(dc * 100)))
    n1, n2 = len(groups["R"]), len(groups["N"])
    ntot = n1 + n2

    def _sscp(g):
        n = len(g)
        mx = sum(x for x, _ in g) / n
        my = sum(y for _, y in g) / n
        axx = sum((x - mx) ** 2 for x, _ in g)
        ayy = sum((y - my) ** 2 for _, y in g)
        axy = sum((x - mx) * (y - my) for x, y in g)
        return mx, my, axx, ayy, axy

    mx1, my1, axx1, ayy1, axy1 = _sscp(groups["R"])
    mx2, my2, axx2, ayy2, axy2 = _sscp(groups["N"])
    sxx = (axx1 + axx2) / (ntot - 2)
    syy = (ayy1 + ayy2) / (ntot - 2)
    sxy = (axy1 + axy2) / (ntot - 2)
    det = sxx * syy - sxy * sxy
    dx, dy = mx1 - mx2, my1 - my2
    t2 = (
        n1
        * n2
        / ntot
        * (syy * dx * dx - 2 * sxy * dx * dy + sxx * dy * dy)
        / det
    )
    f = t2 * (ntot - 3) / (2 * (ntot - 2))
    assert row["n_r"] == n1 and row["n_n"] == n2
    assert abs(row["t2_stat"] - t2) < 1e-3
    assert abs(row["f_stat"] - f) < 1e-3
    assert abs(row["mean_diff_qty"] - dx / 100) < 1e-4


def test_mz_matches_python(spark):
    from llmaix_spark.plans.queries import q_mincer_zarnowitz

    row = q_mincer_zarnowitz(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    pairs = [(ys[i - 7], ys[i]) for i in range(7, len(ys))]
    n, mx, my, cxx, cyy, cxy = _pair_moments(pairs)
    b = cxy / cxx
    a = my - b * mx
    rss_u = n * (cyy - b * cxy)
    rss_r = sum((y - f) ** 2 for f, y in pairs)
    fstat = ((rss_r - rss_u) / 2) / (rss_u / (n - 2))
    assert row["n_pairs"] == n
    assert abs(row["intercept"] - a) < 1e-3
    assert abs(row["slope"] - b) < 1e-5
    assert abs(row["f_stat"] - fstat) < 1e-3


def test_dm_matches_python(spark):
    from llmaix_spark.plans.queries import q_diebold_mariano

    row = q_diebold_mariano(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    ds = [
        abs(ys[i] - ys[i - 1]) - abs(ys[i] - ys[i - 7])
        for i in range(7, len(ys))
    ]
    n = len(ds)
    mean_d = sum(ds) / n
    g0 = sum((d - mean_d) ** 2 for d in ds) / n
    dm = mean_d / math.sqrt(g0 / n)
    assert row["n_obs"] == n
    assert abs(row["mean_loss_diff"] - mean_d) < 1e-5
    assert abs(row["dm_stat"] - dm) < 1e-4
    assert abs(row["dm_hln"] - dm * math.sqrt((n - 1) / n)) < 1e-4


def test_pt_matches_python(spark):
    from llmaix_spark.plans.queries import q_pesaran_timmermann

    row = q_pesaran_timmermann(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    obs = [
        (ys[i] > ys[i - 1], ys[i - 7] > ys[i - 8])
        for i in range(8, len(ys))
    ]
    n = len(obs)
    py = sum(1 for a, _ in obs if a) / n
    pf = sum(1 for _, p in obs if p) / n
    ph = sum(1 for a, p in obs if a == p) / n
    pstar = py * pf + (1 - py) * (1 - pf)
    var_ph = pstar * (1 - pstar) / n
    var_ps = (
        (2 * py - 1) ** 2 * pf * (1 - pf)
        + (2 * pf - 1) ** 2 * py * (1 - py)
        + 4 * py * pf * (1 - py) * (1 - pf) / n
    ) / n
    pt = (ph - pstar) / math.sqrt(var_ph - var_ps)
    assert row["n_obs"] == n
    assert abs(row["hit_rate"] - ph) < 1e-5
    assert abs(row["expected_rate"] - pstar) < 1e-5
    assert abs(row["pt_stat"] - pt) < 1e-4
