"""Plan pins, partition invariance, and python twins for the round-71
wave (Hjorth parameters / Katz+Petrosian fractal dims / Higuchi FD /
Newey–West HAC mean / tracking signal / Bartels rank test).
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _daily_counts():
    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    per_day = Counter(d.date() for d in o["o_orderdate"])
    return [per_day[d] for d in sorted(per_day)]


def _var(vals):
    n = len(vals)
    mu = sum(vals) / n
    return sum((v - mu) ** 2 for v in vals) / n


# ---------------------------------------------------------------------------
# structural properties


def test_hjorth_structure(spark):
    from llmaix_spark.plans.queries import q_hjorth_parameters

    row = q_hjorth_parameters(spark, SF_DIR).collect()[0]
    assert row["activity"] > 0
    assert row["mobility"] > 0
    # complexity >= 1 for any real signal (sine achieves 1)
    assert row["complexity"] >= 1.0 - 1e-6


def test_fractal_structure(spark):
    from llmaix_spark.plans.queries import q_fractal_dimensions

    row = q_fractal_dimensions(spark, SF_DIR).collect()[0]
    assert 1.0 <= row["katz_fd"]
    assert 1.0 <= row["petrosian_fd"] <= 1.1
    assert 0 <= row["mean_crossing_rate"] <= 1
    assert row["sign_changes"] <= row["n_days"] - 2


def test_higuchi_structure(spark):
    from llmaix_spark.plans.queries import q_higuchi_fd

    row = q_higuchi_fd(spark, SF_DIR).collect()[0]
    # curve length shrinks with coarser sampling; D in (1, 2] for a
    # noisy 1-D signal
    assert row["l_k4"] < row["l_k1"]
    assert 1.0 <= row["higuchi_d"] <= 2.1


def test_nw_structure(spark):
    from llmaix_spark.plans.queries import q_newey_west_mean

    row = q_newey_west_mean(spark, SF_DIR).collect()[0]
    assert row["se_naive"] > 0
    assert row["se_newey_west"] > 0
    assert abs(
        row["se_inflation"] - row["se_newey_west"] / row["se_naive"]
    ) < 1e-4
    assert row["autocorr_material"] == (row["se_inflation"] > 1.2)


def test_ts_structure(spark):
    from llmaix_spark.plans.queries import q_tracking_signal

    row = q_tracking_signal(spark, SF_DIR).collect()[0]
    assert abs(row["final_ts"]) <= row["max_abs_ts"] + 1e-6
    assert 0 <= row["n_alarm"] <= row["n_obs"]


def test_bartels_structure(spark):
    from llmaix_spark.plans.queries import q_bartels_rank_test

    row = q_bartels_rank_test(spark, SF_DIR).collect()[0]
    assert 0 < row["rvn"] < 4
    assert row["positive_autocorr_05"] == (row["z_stat"] < -1.96)


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "hjorth_parameters",
        "fractal_dimensions",
        "higuchi_fd",
        "newey_west_mean",
        "tracking_signal",
        "bartels_rank_test",
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


def test_hjorth_matches_python(spark):
    from llmaix_spark.plans.queries import q_hjorth_parameters

    row = q_hjorth_parameters(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    d1 = [ys[i] - ys[i - 1] for i in range(1, len(ys))]
    d2 = [d1[i] - d1[i - 1] for i in range(1, len(d1))]
    act = _var(ys)
    mob = math.sqrt(_var(d1) / act)
    comp = math.sqrt(_var(d2) / _var(d1)) / mob
    assert row["n_days"] == len(ys)
    assert abs(row["activity"] - act) < 1e-4
    assert abs(row["mobility"] - mob) < 1e-5
    assert abs(row["complexity"] - comp) < 1e-5


def test_fractal_matches_python(spark):
    from llmaix_spark.plans.queries import q_fractal_dimensions

    row = q_fractal_dimensions(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    n = len(ys)
    curve = sum(
        math.sqrt(1 + (ys[i] - ys[i - 1]) ** 2) for i in range(1, n)
    )
    dmax = max(
        math.sqrt(i * i + (ys[i] - ys[0]) ** 2) for i in range(n)
    )
    katz = math.log10(n - 1) / (
        math.log10(n - 1) + math.log10(dmax / curve)
    )
    d1 = [ys[i] - ys[i - 1] for i in range(1, n)]
    nd = sum(
        1 for i in range(1, len(d1)) if d1[i - 1] * d1[i] < 0
    )
    pet = math.log10(n) / (
        math.log10(n) + math.log10(n / (n + 0.4 * nd))
    )
    mu = sum(ys) / n
    crossings = sum(
        1
        for i in range(n - 1)
        if (ys[i] - mu) * (ys[i + 1] - mu) < 0
    )
    assert row["n_days"] == n
    assert abs(row["katz_fd"] - katz) < 1e-4
    assert abs(row["petrosian_fd"] - pet) < 1e-5
    assert row["sign_changes"] == nd
    assert abs(row["mean_crossing_rate"] - crossings / (n - 1)) < 1e-5


def test_higuchi_matches_python(spark):
    from llmaix_spark.plans.queries import q_higuchi_fd

    row = q_higuchi_fd(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    n = len(ys)
    lks = {}
    for k in (1, 2, 3, 4):
        lms = []
        for m in range(1, k + 1):
            idx = list(range(m - 1, n, k))
            s = sum(
                abs(ys[idx[j]] - ys[idx[j - 1]])
                for j in range(1, len(idx))
            )
            cnt = len(idx) - 1
            lms.append(s * (n - 1) / (cnt * k * k))
        lks[k] = sum(lms) / len(lms)
    xs = [-math.log(k) for k in lks]
    zs = [math.log(lks[k]) for k in lks]
    mx = sum(xs) / 4
    mz = sum(zs) / 4
    slope = sum(
        (x - mx) * (z - mz) for x, z in zip(xs, zs)
    ) / sum((x - mx) ** 2 for x in xs)
    assert row["n_days"] == n
    assert abs(row["l_k1"] - lks[1]) < 1e-4
    assert abs(row["l_k4"] - lks[4]) < 1e-4
    assert abs(row["higuchi_d"] - slope) < 1e-4


def test_nw_matches_python(spark):
    from llmaix_spark.plans.queries import q_newey_west_mean

    row = q_newey_west_mean(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    n = len(ys)
    mu = sum(ys) / n
    g = {
        lag: sum(
            (ys[t] - mu) * (ys[t - lag] - mu) for t in range(lag, n)
        )
        / n
        for lag in range(5)
    }
    lrv = g[0] + 2 * sum((1 - lag / 5) * g[lag] for lag in (1, 2, 3, 4))
    assert row["n_days"] == n
    assert abs(row["mean_daily"] - mu) < 1e-5
    assert abs(row["se_naive"] - math.sqrt(g[0] / n)) < 1e-6
    assert abs(row["se_newey_west"] - math.sqrt(lrv / n)) < 1e-6


def test_ts_matches_python(spark):
    from llmaix_spark.plans.queries import q_tracking_signal

    row = q_tracking_signal(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    es = [ys[i] - ys[i - 7] for i in range(7, len(ys))]
    cume = cuma = 0
    sigs = []
    for i, e in enumerate(es, 1):
        cume += e
        cuma += abs(e)
        sigs.append(0.0 if cuma == 0 else cume * i / cuma)
    assert row["n_obs"] == len(es)
    assert abs(row["final_ts"] - sigs[-1]) < 1e-5
    assert abs(row["max_abs_ts"] - max(abs(s) for s in sigs)) < 1e-5
    assert row["n_alarm"] == sum(1 for s in sigs if abs(s) > 4)


def test_bartels_matches_python(spark):
    from llmaix_spark.plans.queries import q_bartels_rank_test

    row = q_bartels_rank_test(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    n = len(ys)
    svals = sorted(ys)
    rank = {}
    for v in set(ys):
        lo = svals.index(v)
        cnt = svals.count(v)
        rank[v] = lo + 1 + (cnt - 1) / 2
    rs = [rank[y] for y in ys]
    rbar = (n + 1) / 2
    num = sum((rs[i] - rs[i + 1]) ** 2 for i in range(n - 1))
    den = sum((r - rbar) ** 2 for r in rs)
    rvn = num / den
    var = (
        4
        * (n - 2)
        * (5 * n * n - 2 * n - 9)
        / (5 * n * (n + 1) * (n - 1) ** 2)
    )
    z = (rvn - 2) / math.sqrt(var)
    assert row["n_days"] == n
    assert abs(row["rvn"] - rvn) < 1e-5
    assert abs(row["z_stat"] - z) < 1e-4
