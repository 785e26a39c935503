"""Plan pins, partition invariance, and python twins for the round-61
wave (Durbin-Watson / Breusch-Pagan / Chow / Granger lag-1 /
Cochran-Armitage / Taylor's law).
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


def _ols(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    return a, b


# ---------------------------------------------------------------------------
# structural properties


def test_durbin_watson_structure(spark):
    from llmaix_spark.plans.queries import q_durbin_watson

    row = q_durbin_watson(spark, SF_DIR).collect()[0]
    assert row["n_days"] > 100
    # DW lives in [0, 4] by construction
    assert 0 <= row["dw_stat"] <= 4
    assert row["positive_autocorr"] == (row["dw_stat"] < 1.5)


def test_breusch_pagan_structure(spark):
    from llmaix_spark.plans.queries import q_breusch_pagan

    row = q_breusch_pagan(spark, SF_DIR).collect()[0]
    assert 0 <= row["r2_aux"] <= 1
    assert row["bp_stat"] >= 0
    # BP = n * R² exactly (both sides 6dp-rounded)
    assert abs(row["bp_stat"] - row["n_days"] * row["r2_aux"]) < 1e-1


def test_chow_structure(spark):
    from llmaix_spark.plans.queries import q_chow_test

    row = q_chow_test(spark, SF_DIR).collect()[0]
    # splitting can only reduce the residual sum of squares
    assert row["ssr_split"] <= row["ssr_pooled"] + 1e-6
    assert row["f_stat"] >= 0
    assert row["break_at_mid_05"] == (row["f_stat"] > 2.996)


def test_granger_structure(spark):
    from llmaix_spark.plans.queries import q_granger_lag1

    row = q_granger_lag1(spark, SF_DIR).collect()[0]
    assert row["n_pairs"] > 100
    # adding a regressor cannot hurt fit, so F >= 0
    assert row["f_stat"] >= -1e-9
    assert row["granger_causal_05"] == (row["f_stat"] > 3.842)


def test_cochran_armitage_structure(spark):
    from llmaix_spark.plans.queries import q_cochran_armitage

    row = q_cochran_armitage(spark, SF_DIR).collect()[0]
    assert 0 < row["p_finished"] < 1
    assert abs(row["chi2_trend"] - row["z_stat"] ** 2) < 1e-3
    assert row["trend_05"] == (abs(row["z_stat"]) > 1.96)


def test_taylors_law_structure(spark):
    from llmaix_spark.plans.queries import q_taylors_law

    row = q_taylors_law(spark, SF_DIR).collect()[0]
    assert row["n_parts"] > 10
    assert 0 <= row["r2"] <= 1
    # demand variance grows with the mean: slope must be positive
    assert row["tl_slope"] > 0


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "durbin_watson",
        "breusch_pagan",
        "chow_test",
        "granger_lag1",
        "cochran_armitage",
        "taylors_law",
    ],
)
def test_wave61_partition_invariance(spark, qname):
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


def test_durbin_watson_matches_python(spark):
    from llmaix_spark.plans.queries import q_durbin_watson

    row = q_durbin_watson(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    ts = list(range(len(ys)))
    a, b = _ols(ts, ys)
    es = [y - a - b * t for t, y in zip(ts, ys)]
    dw = sum(
        (es[i] - es[i - 1]) ** 2 for i in range(1, len(es))
    ) / sum(e * e for e in es)
    assert row["n_days"] == len(ys)
    assert abs(row["slope"] - b) < 1e-5
    assert abs(row["dw_stat"] - dw) < 1e-4


def test_breusch_pagan_matches_python(spark):
    from llmaix_spark.plans.queries import q_breusch_pagan

    row = q_breusch_pagan(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    ts = list(range(len(ys)))
    a, b = _ols(ts, ys)
    hs = [(y - a - b * t) ** 2 for t, y in zip(ts, ys)]
    n = len(ts)
    sx, sh = sum(ts), sum(hs)
    sxx = sum(t * t for t in ts)
    sxh = sum(t * h for t, h in zip(ts, hs))
    shh = sum(h * h for h in hs)
    num = n * sxh - sx * sh
    r2 = (num / (n * sxx - sx * sx)) * (num / (n * shh - sh * sh))
    assert row["n_days"] == n
    assert abs(row["r2_aux"] - r2) < 1e-4
    assert abs(row["bp_stat"] - n * r2) < 1e-1


def test_chow_matches_python(spark):
    from llmaix_spark.plans.queries import q_chow_test

    row = q_chow_test(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    n = len(ys)

    def ssr(pairs):
        a, b = _ols([t for t, _ in pairs], [y for _, y in pairs])
        return sum((y - a - b * t) ** 2 for t, y in pairs)

    allp = list(enumerate(ys))
    lo = [(t, y) for t, y in allp if 2 * t < n]
    hi = [(t, y) for t, y in allp if 2 * t >= n]
    ssr_p = ssr(allp)
    ssr_12 = ssr(lo) + ssr(hi)
    f = ((ssr_p - ssr_12) / 2.0) / (ssr_12 / (n - 4.0))
    assert row["n_days"] == n
    assert abs(row["ssr_pooled"] - ssr_p) / max(ssr_p, 1.0) < 1e-6
    assert abs(row["ssr_split"] - ssr_12) / max(ssr_12, 1.0) < 1e-6
    assert abs(row["f_stat"] - f) < 1e-4


def test_granger_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_granger_lag1

    row = q_granger_lag1(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    tot: Counter = Counter()
    urg: Counter = Counter()
    for d, pr in zip(o["o_orderdate"], o["o_orderpriority"]):
        day = d.date()
        tot[day] += 1
        urg[day] += int(pr == "1-URGENT")
    days = sorted(tot)
    yt = [tot[d] for d in days[1:]]
    y1 = [tot[d] for d in days[:-1]]
    x1 = [urg[d] for d in days[:-1]]
    m = len(yt)

    def c(u, v):
        return sum(a * b for a, b in zip(u, v)) - sum(u) * sum(v) / m

    cyy, cxx, cxy = c(y1, y1), c(x1, x1), c(y1, x1)
    cay, cax, ctt = c(yt, y1), c(yt, x1), c(yt, yt)
    ssr_r = ctt - cay * cay / cyy
    det = cyy * cxx - cxy * cxy
    b1 = (cay * cxx - cax * cxy) / det
    b2 = (cyy * cax - cxy * cay) / det
    ssr_u = ctt - b1 * cay - b2 * cax
    f = (ssr_r - ssr_u) / (ssr_u / (m - 3.0))
    assert row["n_pairs"] == m
    assert abs(row["beta_x"] - b2) < 1e-4
    assert abs(row["f_stat"] - f) < 1e-3


def test_cochran_armitage_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_cochran_armitage

    row = q_cochran_armitage(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    n_i: Counter = Counter()
    r_i: Counter = Counter()
    for pr, st in zip(o["o_orderpriority"], o["o_orderstatus"]):
        s = int(pr[0])
        n_i[s] += 1
        r_i[s] += int(st == "F")
    nn = sum(n_i.values())
    rr = sum(r_i.values())
    ssn = sum(s * n_i[s] for s in n_i)
    ss2n = sum(s * s * n_i[s] for s in n_i)
    ssr = sum(s * r_i[s] for s in r_i)
    p = rr / nn
    z = (ssr - p * ssn) / math.sqrt(
        p * (1 - p) * (ss2n - ssn * ssn / nn)
    )
    assert row["n_orders"] == nn
    assert abs(row["p_finished"] - p) < 1e-6
    assert abs(row["z_stat"] - z) < 1e-4


def test_taylors_law_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_taylors_law

    row = q_taylors_law(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    monthly: dict = defaultdict(int)
    months = set()
    for pk, dt, q in zip(
        li["l_partkey"], li["l_shipdate"], li["l_quantity"]
    ):
        mi = dt.year * 12 + dt.month
        months.add(mi)
        monthly[(int(pk), mi)] += _rnd(q)
    tm = max(months) - min(months) + 1
    per: dict[int, list] = defaultdict(list)
    for (pk, _), q in monthly.items():
        per[pk].append(q)
    xs, ys = [], []
    for qs in per.values():
        s = sum(qs)
        ss = sum(q * q for q in qs)
        if s > 0 and tm * ss - s * s > 0:
            xs.append(math.log(s / tm))
            ys.append(math.log((tm * ss - s * s) / (tm * tm)))
    a, b = _ols(xs, ys)
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    num = n * sxy - sx * sy
    r2 = (num / (n * sxx - sx * sx)) * (num / (n * syy - sy * sy))
    assert row["n_parts"] == n
    assert abs(row["tl_slope"] - b) < 1e-4
    assert abs(row["tl_intercept"] - a) < 1e-3
    assert abs(row["r2"] - r2) < 1e-4
