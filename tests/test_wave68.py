"""Plan pins, partition invariance, and python twins for the round-68
wave (Lepage / two-sample CvM / Quade / PACF / turning points / sign
test).
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


def test_lepage_structure(spark):
    from llmaix_spark.plans.queries import q_lepage_test

    row = q_lepage_test(spark, SF_DIR).collect()[0]
    assert row["lepage_l"] >= 0
    # L = zW² + zAB² by construction
    l_recon = row["z_wilcoxon"] ** 2 + row["z_ansari"] ** 2
    assert abs(row["lepage_l"] - l_recon) < 1e-3
    assert row["loc_or_scale_05"] == (row["lepage_l"] > 5.991)


def test_cvm_structure(spark):
    from llmaix_spark.plans.queries import q_cvm_two_sample

    row = q_cvm_two_sample(spark, SF_DIR).collect()[0]
    assert row["cvm_t"] >= 0
    assert row["distributions_differ_05"] == (row["cvm_t"] > 0.461)


def test_quade_structure(spark):
    from llmaix_spark.plans.queries import q_quade_test

    row = q_quade_test(spark, SF_DIR).collect()[0]
    assert row["n_years"] >= 5
    assert row["quade_f"] >= 0


def test_pacf_structure(spark):
    from llmaix_spark.plans.queries import q_pacf_daily

    row = q_pacf_daily(spark, SF_DIR).collect()[0]
    for c in ("rho1", "rho2", "rho3", "pacf1", "pacf2", "pacf3"):
        assert -1 <= row[c] <= 1
    assert row["pacf1"] == row["rho1"]


def test_tp_structure(spark):
    from llmaix_spark.plans.queries import q_turning_points

    row = q_turning_points(spark, SF_DIR).collect()[0]
    assert 0 <= row["turning_points"] <= row["n_days"] - 2
    assert abs(
        row["expected"] - 2 * (row["n_days"] - 2) / 3
    ) < 1e-3
    assert row["nonrandom_05"] == (abs(row["z_stat"]) > 1.96)


def test_sign_structure(spark):
    from llmaix_spark.plans.queries import q_sign_test

    row = q_sign_test(spark, SF_DIR).collect()[0]
    assert row["n_positive"] + row["n_negative"] == row["n_pairs"]
    assert row["weekly_drift_05"] == (row["z_stat"] > 1.96)


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "lepage_test",
        "cvm_two_sample",
        "quade_test",
        "pacf_daily",
        "turning_points",
        "sign_test",
    ],
)
def test_wave68_partition_invariance(spark, qname):
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


def test_lepage_matches_python(spark):
    from llmaix_spark.plans.queries import q_lepage_test

    row = q_lepage_test(spark, SF_DIR).collect()[0]

    hr, hn = _rn_hists()
    vals = sorted(set(hr) | set(hn))
    nn = sum(hr.values()) + sum(hn.values())
    n1 = sum(hr.values())
    n2 = nn - n1
    # combined midranks and AB (tie-averaged) scores per value
    cum = 0
    mid = {}
    abavg = {}
    for v in vals:
        t = hr.get(v, 0) + hn.get(v, 0)
        mid[v] = cum + (t + 1) / 2
        abavg[v] = sum(
            min(i, nn + 1 - i) for i in range(cum + 1, cum + t + 1)
        ) / t
        cum += t
    w = sum(hr.get(v, 0) * mid[v] for v in vals)
    a = sum(hr.get(v, 0) * abavg[v] for v in vals)

    def _z(stat, score):
        sbar = sum(
            (hr.get(v, 0) + hn.get(v, 0)) * score[v] for v in vals
        ) / nn
        ss = sum(
            (hr.get(v, 0) + hn.get(v, 0)) * (score[v] - sbar) ** 2
            for v in vals
        )
        var = n1 * n2 * ss / (nn * (nn - 1))
        return (stat - n1 * sbar) / math.sqrt(var)

    zw = _z(w, mid)
    za = _z(a, abavg)
    assert row["n_r"] == n1 and row["n_n"] == n2
    assert abs(row["z_wilcoxon"] - zw) < 1e-3
    assert abs(row["z_ansari"] - za) < 1e-3
    assert abs(row["lepage_l"] - (zw * zw + za * za)) < 1e-2


def test_cvm_matches_python(spark):
    from llmaix_spark.plans.queries import q_cvm_two_sample

    row = q_cvm_two_sample(spark, SF_DIR).collect()[0]

    hr, hn = _rn_hists()
    n1, n2 = sum(hr.values()), sum(hn.values())
    nn = n1 + n2
    cum1 = cum2 = 0
    t = 0.0
    for v in sorted(set(hr) | set(hn)):
        cum1 += hr.get(v, 0)
        cum2 += hn.get(v, 0)
        tv = hr.get(v, 0) + hn.get(v, 0)
        t += tv * (cum1 / n1 - cum2 / n2) ** 2
    t *= n1 * n2 / (nn * nn)
    assert row["n_r"] == n1 and row["n_n"] == n2
    assert abs(row["cvm_t"] - t) < 1e-5


def test_quade_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_quade_test

    row = q_quade_test(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    ym: Counter = Counter()
    for d in o["o_orderdate"]:
        ym[(d.year, d.month)] += 1
    years = [
        y
        for y in sorted({yy for yy, _ in ym})
        if sum(1 for yy, _ in ym if yy == y) == 12
    ]
    rng = {
        y: max(ym[(y, m)] for m in range(1, 13))
        - min(ym[(y, m)] for m in range(1, 13))
        for y in years
    }
    svals = sorted(rng.values())
    q = {
        y: (svals.index(rng[y]) + 1 + svals.index(rng[y]) + svals.count(rng[y]))
        / 2
        for y in years
    }
    s = defaultdict(float)
    a_sum = 0.0
    for y in years:
        cs = sorted(ym[(y, m)] for m in range(1, 13))
        for m in range(1, 13):
            c = ym[(y, m)]
            r = (cs.index(c) + 1 + cs.index(c) + cs.count(c)) / 2
            sij = q[y] * (r - 6.5)
            s[m] += sij
            a_sum += sij * sij
    b = len(years)
    bsum = sum(v * v for v in s.values()) / b
    t = (b - 1) * bsum / (a_sum - bsum)
    assert row["n_years"] == b
    assert abs(row["quade_f"] - t) < 1e-3


def test_pacf_matches_python(spark):
    from llmaix_spark.plans.queries import q_pacf_daily

    row = q_pacf_daily(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    n = len(ys)
    mu = sum(ys) / n
    den = sum((y - mu) ** 2 for y in ys)
    rho = {
        k: sum((ys[t] - mu) * (ys[t + k] - mu) for t in range(n - k))
        / den
        for k in (1, 2, 3)
    }
    p22 = (rho[2] - rho[1] ** 2) / (1 - rho[1] ** 2)
    p21 = rho[1] * (1 - p22)
    p33 = (rho[3] - p21 * rho[2] - p22 * rho[1]) / (
        1 - p21 * rho[1] - p22 * rho[2]
    )
    assert row["n_days"] == n
    for k in (1, 2, 3):
        assert abs(row[f"rho{k}"] - rho[k]) < 1e-4
    assert abs(row["pacf2"] - p22) < 1e-4
    assert abs(row["pacf3"] - p33) < 1e-4


def test_tp_matches_python(spark):
    from llmaix_spark.plans.queries import q_turning_points

    row = q_turning_points(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    n = len(ys)
    t = sum(
        1
        for i in range(1, n - 1)
        if (ys[i] > ys[i - 1] and ys[i] > ys[i + 1])
        or (ys[i] < ys[i - 1] and ys[i] < ys[i + 1])
    )
    e = 2 * (n - 2) / 3
    z = (t - e) / math.sqrt((16 * n - 29) / 90)
    assert row["n_days"] == n
    assert row["turning_points"] == t
    assert abs(row["z_stat"] - z) < 1e-4


def test_sign_matches_python(spark):
    from llmaix_spark.plans.queries import q_sign_test

    row = q_sign_test(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    ds = [
        ys[i + 7] - ys[i]
        for i in range(len(ys) - 7)
        if ys[i + 7] != ys[i]
    ]
    n = len(ds)
    pos = sum(1 for d in ds if d > 0)
    z = (abs(pos - n / 2) - 0.5) / (math.sqrt(n) / 2)
    assert row["n_pairs"] == n
    assert row["n_positive"] == pos
    assert abs(row["z_stat"] - z) < 1e-4
