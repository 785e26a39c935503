"""Plan pins, partition invariance, and python twins for the round-66
wave (Engle-Granger / Breusch-Godfrey / KPSS / ICC(1,1) / Geary C /
Cook's distance).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _daily_xy():
    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    tot: Counter = Counter()
    urg: Counter = Counter()
    for d, pr in zip(o["o_orderdate"], o["o_orderpriority"]):
        day = d.date()
        tot[day] += 1
        urg[day] += int(pr == "1-URGENT")
    days = sorted(tot)
    return days, [tot[d] for d in days], [urg[d] for d in days]


def _ols(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return (sy - b * sx) / n, b


# ---------------------------------------------------------------------------
# structural properties


def test_eg_structure(spark):
    from llmaix_spark.plans.queries import q_engle_granger

    row = q_engle_granger(spark, SF_DIR).collect()[0]
    assert row["n_pairs"] > 100
    # the residual AR coefficient of a cointegrating regression is
    # negative (mean reversion) for these series
    assert row["eg_stat"] < 0
    assert row["cointegrated_05"] == (row["eg_stat"] < -3.34)


def test_bg_structure(spark):
    from llmaix_spark.plans.queries import q_breusch_godfrey

    row = q_breusch_godfrey(spark, SF_DIR).collect()[0]
    assert row["lm_stat"] >= 0
    assert -1 <= row["rho_hat"] <= 1
    assert row["serial_corr_05"] == (row["lm_stat"] > 3.841)


def test_kpss_structure(spark):
    from llmaix_spark.plans.queries import q_kpss_test

    row = q_kpss_test(spark, SF_DIR).collect()[0]
    assert row["kpss_stat"] > 0
    assert row["longrun_var"] > 0
    assert row["nonstationary_05"] == (row["kpss_stat"] > 0.463)


def test_icc_structure(spark):
    from llmaix_spark.plans.queries import q_icc_oneway

    row = q_icc_oneway(spark, SF_DIR).collect()[0]
    assert row["n_customers"] > 0
    assert row["n_orders"] >= 2 * row["n_customers"]
    assert -1 <= row["icc_11"] <= 1
    assert 2 <= row["k0"] <= row["n_orders"]


def test_geary_structure(spark):
    from llmaix_spark.plans.queries import q_geary_c

    row = q_geary_c(spark, SF_DIR).collect()[0]
    assert row["n_nations"] == 25
    assert row["w_pairs"] == 100
    assert 0 <= row["geary_c"] <= 3
    assert row["expected_c"] == 1.0


def test_cooks_structure(spark):
    from llmaix_spark.plans.queries import q_cooks_distance

    row = q_cooks_distance(spark, SF_DIR).collect()[0]
    assert row["cooks_d"] > 0
    assert row["day_count"] >= 0
    assert row["influential_4_over_n"] == (
        row["cooks_d"] > round(4.0 / row["n_days"], 6)
    )


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "engle_granger",
        "breusch_godfrey",
        "kpss_test",
        "icc_oneway",
        "geary_c",
        "cooks_distance",
    ],
)
def test_wave66_partition_invariance(spark, qname):
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


def test_eg_matches_python(spark):
    from llmaix_spark.plans.queries import q_engle_granger

    row = q_engle_granger(spark, SF_DIR).collect()[0]

    _, ys, xs = _daily_xy()
    a, b = _ols(xs, ys)
    es = [y - a - b * x for x, y in zip(xs, ys)]
    pairs = [(es[i - 1], es[i] - es[i - 1]) for i in range(1, len(es))]
    m = len(pairs)
    pxx = sum(e * e for e, _ in pairs)
    pxy = sum(e * de for e, de in pairs)
    pyy = sum(de * de for _, de in pairs)
    rho = pxy / pxx
    se = math.sqrt((pyy - rho * pxy) / (m - 1) / pxx)
    assert row["n_pairs"] == m
    assert abs(row["beta"] - b) < 1e-5
    assert abs(row["eg_stat"] - rho / se) < 1e-3


def test_bg_matches_python(spark):
    from llmaix_spark.plans.queries import q_breusch_godfrey

    row = q_breusch_godfrey(spark, SF_DIR).collect()[0]

    _, ys, _ = _daily_xy()
    ts = list(range(len(ys)))
    a, b = _ols(ts, ys)
    es = [y - a - b * t for t, y in zip(ts, ys)]
    trip = [
        (ts[i], es[i - 1], es[i]) for i in range(1, len(es))
    ]
    m = len(trip)

    def c(u, v):
        return sum(a_ * b_ for a_, b_ in zip(u, v)) - sum(u) * sum(
            v
        ) / m

    x1 = [t for t, _, _ in trip]
    x2 = [e for _, e, _ in trip]
    z = [e for _, _, e in trip]
    c11, c22, c12 = c(x1, x1), c(x2, x2), c(x1, x2)
    cz1, cz2, czz = c(z, x1), c(z, x2), c(z, z)
    det = c11 * c22 - c12 * c12
    b1 = (cz1 * c22 - cz2 * c12) / det
    b2 = (c11 * cz2 - c12 * cz1) / det
    r2 = 1 - (czz - b1 * cz1 - b2 * cz2) / czz
    assert row["n_pairs"] == m
    assert abs(row["rho_hat"] - b2) < 1e-3
    assert abs(row["lm_stat"] - m * r2) < 1e-2


def test_kpss_matches_python(spark):
    from llmaix_spark.plans.queries import q_kpss_test

    row = q_kpss_test(spark, SF_DIR).collect()[0]

    _, ys, _ = _daily_xy()
    n = len(ys)
    mu = sum(ys) / n
    s = 0.0
    sp2 = 0.0
    for y in ys:
        s += y - mu
        sp2 += s * s
    g = {}
    for k in range(0, 8):
        g[k] = sum(
            (ys[t] - mu) * (ys[t + k] - mu) for t in range(n - k)
        ) / n
    sig2 = g[0] + 2 * sum((1 - k / 8.0) * g[k] for k in range(1, 8))
    kpss = sp2 / (n * n * sig2)
    assert row["n_days"] == n
    assert abs(row["longrun_var"] - sig2) / sig2 < 1e-3
    assert abs(row["kpss_stat"] - kpss) / kpss < 1e-3


def test_icc_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_icc_oneway

    row = q_icc_oneway(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    per: dict[int, list] = defaultdict(list)
    for k, p in zip(o["o_custkey"], o["o_totalprice"]):
        per[int(k)].append(_rnd(p * 100))
    per = {k: v for k, v in per.items() if len(v) >= 2}
    gg = len(per)
    nn = sum(len(v) for v in per.values())
    grand = sum(sum(v) for v in per.values()) / nn
    ssb = sum(
        len(v) * (sum(v) / len(v) - grand) ** 2 for v in per.values()
    )
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v)
        for v in per.values()
    )
    msb = ssb / (gg - 1)
    msw = ssw / (nn - gg)
    k0 = (nn - sum(len(v) ** 2 for v in per.values()) / nn) / (gg - 1)
    icc = (msb - msw) / (msb + (k0 - 1) * msw)
    assert row["n_customers"] == gg
    assert row["n_orders"] == nn
    assert abs(row["k0"] - k0) < 1e-4
    assert abs(row["icc_11"] - icc) < 1e-4


def test_geary_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_geary_c

    row = q_geary_c(spark, SF_DIR).collect()[0]

    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    s: dict[int, int] = defaultdict(int)
    cnt: Counter = Counter()
    for nk, bal in zip(c["c_nationkey"], c["c_acctbal"]):
        s[int(nk)] += _rnd(bal * 100)
        cnt[int(nk)] += 1
    nat = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    reg = {
        int(k): int(r)
        for k, r in zip(nat["n_nationkey"], nat["n_regionkey"])
    }
    xs = {k: s[k] / cnt[k] for k in s}
    nn = len(xs)
    mu = sum(xs.values()) / nn
    num = sum(
        (xs[i] - xs[j]) ** 2
        for i in xs
        for j in xs
        if i != j and reg[i] == reg[j]
    )
    den = sum((v - mu) ** 2 for v in xs.values())
    wp = sum(
        1 for i in xs for j in xs if i != j and reg[i] == reg[j]
    )
    gc = (nn - 1) * num / (2 * wp * den)
    assert row["n_nations"] == nn
    assert row["w_pairs"] == wp
    assert abs(row["geary_c"] - gc) < 1e-4


def test_cooks_matches_python(spark):
    from llmaix_spark.plans.queries import q_cooks_distance

    row = q_cooks_distance(spark, SF_DIR).collect()[0]

    days, ys, _ = _daily_xy()
    ts = list(range(len(ys)))
    n = len(ys)
    a, b = _ols(ts, ys)
    tbar = sum(ts) / n
    sxx = sum((t - tbar) ** 2 for t in ts)
    ssr = sum((y - a - b * t) ** 2 for t, y in zip(ts, ys))
    s2 = ssr / (n - 2)
    best = (-1.0, None, None)
    for t, y, dd in zip(ts, ys, days):
        e = y - a - b * t
        h = 1.0 / n + (t - tbar) ** 2 / sxx
        dc = e * e * h / (2 * s2 * (1 - h) ** 2)
        if dc > best[0]:
            best = (dc, dd, y)
    assert row["n_days"] == n
    assert row["influential_date"] == best[1]
    assert row["day_count"] == best[2]
    assert abs(row["cooks_d"] - best[0]) < 1e-4
