"""Plan pins, partition invariance, and python twins for the round-64
wave (Cohen's d / Kendall W / Moran I / Dickey-Fuller / Weibull fit /
Cramér's V).
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


# ---------------------------------------------------------------------------
# structural properties


def test_cohens_d_structure(spark):
    from llmaix_spark.plans.queries import q_cohens_d

    row = q_cohens_d(spark, SF_DIR).collect()[0]
    assert row["n_urgent"] > 0 and row["n_low"] > 0
    # Hedges correction shrinks |d|
    assert abs(row["hedges_g"]) <= abs(row["cohens_d"]) + 1e-9
    lut = [(0.2, "negligible"), (0.5, "small"), (0.8, "medium")]
    mag = next(
        (m for thr, m in lut if abs(row["cohens_d"]) < thr), "large"
    )
    assert row["magnitude"] == mag


def test_kendall_w_structure(spark):
    from llmaix_spark.plans.queries import q_kendall_w

    row = q_kendall_w(spark, SF_DIR).collect()[0]
    assert 0 <= row["kendall_w"] <= 1
    assert row["df"] == 11
    assert abs(
        row["chi2_stat"] - row["n_years"] * 11 * row["kendall_w"]
    ) < 1e-3


def test_moran_structure(spark):
    from llmaix_spark.plans.queries import q_moran_i

    row = q_moran_i(spark, SF_DIR).collect()[0]
    assert row["n_nations"] == 25
    # 5 regions x 5 nations -> 5*4 ordered pairs per region
    assert row["w_pairs"] == 100
    assert -1.1 <= row["moran_i"] <= 1.1
    assert abs(row["expected_i"] - (-1.0 / 24)) < 1e-6


def test_df_structure(spark):
    from llmaix_spark.plans.queries import q_dickey_fuller

    row = q_dickey_fuller(spark, SF_DIR).collect()[0]
    # rho in (-2, 0) for any mean-reverting-or-walk series
    assert -2 < row["rho"] <= 0.5
    assert row["stationary_05"] == (row["df_stat"] < -2.86)


def test_weibull_structure(spark):
    from llmaix_spark.plans.queries import q_weibull_fit

    row = q_weibull_fit(spark, SF_DIR).collect()[0]
    assert row["n_points"] > 100
    assert row["weibull_shape"] > 0
    assert row["weibull_scale_s"] > 0
    assert 0 <= row["r2"] <= 1
    assert row["bursty"] == (row["weibull_shape"] < 1.0)


def test_cramers_v_structure(spark):
    from llmaix_spark.plans.queries import q_cramers_v

    row = q_cramers_v(spark, SF_DIR).collect()[0]
    assert 0 <= row["cramers_v_corrected"] <= row["cramers_v"] + 1e-9
    assert row["cramers_v"] <= 1
    assert row["chi2"] >= 0
    assert row["df"] > 0


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "cohens_d",
        "kendall_w",
        "moran_i",
        "dickey_fuller",
        "weibull_fit",
        "cramers_v",
    ],
)
def test_wave64_partition_invariance(spark, qname):
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


def test_cohens_d_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_cohens_d

    row = q_cohens_d(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    grp: dict[int, list] = {0: [], 1: []}
    for pr, p in zip(o["o_orderpriority"], o["o_totalprice"]):
        if pr == "1-URGENT":
            grp[1].append(_rnd(p * 100))
        elif pr == "5-LOW":
            grp[0].append(_rnd(p * 100))
    n1, n0 = len(grp[1]), len(grp[0])
    m1, m0 = sum(grp[1]) / n1, sum(grp[0]) / n0
    q1 = sum((x - m1) ** 2 for x in grp[1])
    q0 = sum((x - m0) ** 2 for x in grp[0])
    sp = math.sqrt((q1 + q0) / (n1 + n0 - 2))
    d = (m1 - m0) / sp
    g = d * (1 - 3 / (4 * (n1 + n0) - 9))
    assert row["n_urgent"] == n1 and row["n_low"] == n0
    assert abs(row["cohens_d"] - d) < 1e-5
    assert abs(row["hedges_g"] - g) < 1e-5


def _month_rank_r2():
    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    ym: Counter = Counter()
    for d in o["o_orderdate"]:
        ym[(d.year, d.month)] += 1
    years = [
        y
        for y in sorted({yy for yy, _ in ym})
        if sum(1 for yy, _ in ym if yy == y) == 12
    ]
    r2 = {}
    for y in years:
        cs = [(ym[(y, m)], m) for m in range(1, 13)]
        svals = sorted(c for c, _ in cs)
        for c, m in cs:
            r2[(y, m)] = 2 * (svals.index(c) + 1) + svals.count(c) - 1
    return years, r2


def test_kendall_w_matches_python(spark):
    from llmaix_spark.plans.queries import q_kendall_w

    row = q_kendall_w(spark, SF_DIR).collect()[0]

    years, r2 = _month_rank_r2()
    n = len(years)
    s4 = 0
    for m in range(1, 13):
        r2j = sum(r2[(y, m)] for y in years)
        s4 += (r2j - 13 * n) ** 2
    w = 3 * s4 / (n * n * 12 * 143)
    assert row["n_years"] == n
    assert abs(row["kendall_w"] - w) < 1e-5
    assert abs(row["chi2_stat"] - n * 11 * w) < 1e-3


def test_moran_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_moran_i

    row = q_moran_i(spark, SF_DIR).collect()[0]

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
    zz = {k: v - mu for k, v in xs.items()}
    num = sum(
        zz[i] * zz[j]
        for i in zz
        for j in zz
        if i != j and reg[i] == reg[j]
    )
    den = sum(v * v for v in zz.values())
    wp = sum(
        1 for i in zz for j in zz if i != j and reg[i] == reg[j]
    )
    moran = nn / wp * num / den
    assert row["n_nations"] == nn
    assert row["w_pairs"] == wp
    assert abs(row["moran_i"] - moran) < 1e-4


def test_df_matches_python(spark):
    from llmaix_spark.plans.queries import q_dickey_fuller

    row = q_dickey_fuller(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    pairs = [(ys[i - 1], ys[i] - ys[i - 1]) for i in range(1, len(ys))]
    m = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    sxy = sum(x * y for x, y in pairs)
    syy = sum(y * y for _, y in pairs)
    cxx = sxx - sx * sx / m
    cxy = sxy - sx * sy / m
    cyy = syy - sy * sy / m
    rho = cxy / cxx
    ssr = cyy - cxy * cxy / cxx
    se = math.sqrt(ssr / (m - 2) / cxx)
    assert row["n_pairs"] == m
    assert abs(row["rho"] - rho) < 1e-5
    assert abs(row["df_stat"] - rho / se) < 1e-3


def test_weibull_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_weibull_fit

    row = q_weibull_fit(spark, SF_DIR).collect()[0]

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev.sort_values(["user_id", "ts"])
    gaps: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        ts = [int(t.timestamp()) for t in g["ts"]]
        for i in range(1, len(ts)):
            gap = ts[i] - ts[i - 1]
            if gap > 0:
                gaps[gap] += 1
    n = sum(gaps.values())
    cum = 0
    xs, ys = [], []
    for g in sorted(gaps):
        cum += gaps[g]
        f = cum / (n + 1)
        xs.append(math.log(g))
        ys.append(math.log(-math.log(1 - f)))
    npts = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    shape = (npts * sxy - sx * sy) / (npts * sxx - sx * sx)
    inter = (sy - shape * sx) / npts
    scale = math.exp(-inter / shape)
    assert row["n_points"] == npts
    assert abs(row["weibull_shape"] - shape) < 1e-4
    assert abs(row["weibull_scale_s"] - scale) / scale < 1e-3


def test_cramers_v_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_cramers_v

    row = q_cramers_v(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    cells: Counter = Counter(zip(d["lang"], d["source"]))
    nn = sum(cells.values())
    rt: Counter = Counter()
    ct: Counter = Counter()
    for (x, y), c in cells.items():
        rt[x] += c
        ct[y] += c
    chi2 = sum(
        (c - rt[x] * ct[y] / nn) ** 2 / (rt[x] * ct[y] / nn)
        for (x, y), c in cells.items()
    )
    r, c_ = len(rt), len(ct)
    phi2 = chi2 / nn
    v = math.sqrt(phi2 / min(r - 1, c_ - 1))
    phi2c = max(0.0, phi2 - (r - 1) * (c_ - 1) / (nn - 1))
    rc = r - (r - 1) ** 2 / (nn - 1)
    cc = c_ - (c_ - 1) ** 2 / (nn - 1)
    vc = math.sqrt(phi2c / min(rc - 1, cc - 1))
    assert row["n_docs"] == nn
    assert row["df"] == (r - 1) * (c_ - 1)
    assert abs(row["chi2"] - chi2) < 1e-3
    assert abs(row["cramers_v"] - v) < 1e-4
    assert abs(row["cramers_v_corrected"] - vc) < 1e-4
