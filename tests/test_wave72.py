"""Plan pins, partition invariance, and python twins for the round-72
wave (Foster–Stuart records / Mahalanobis outliers / ordinal
association / seasonal Mann–Kendall / Cronbach alpha / Rayleigh DOW).
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
    return [(d, per_day[d]) for d in sorted(per_day)]


# ---------------------------------------------------------------------------
# structural properties


def test_fs_structure(spark):
    from llmaix_spark.plans.queries import q_foster_stuart_records

    row = q_foster_stuart_records(spark, SF_DIR).collect()[0]
    assert row["upper_records"] >= 1
    assert row["lower_records"] >= 0
    assert row["s_stat"] == row["upper_records"] - row["lower_records"]
    assert row["trend_05"] == (abs(row["z_stat"]) > 1.96)


def test_mahalanobis_structure(spark):
    from llmaix_spark.plans.queries import q_mahalanobis_outliers

    row = q_mahalanobis_outliers(spark, SF_DIR).collect()[0]
    # mean D² over the population covariance is exactly p = 2
    assert abs(row["mean_d2"] - 2.0) < 1e-3
    assert row["max_d2"] > 2.0
    assert 0 <= row["n_outliers"] < row["n_rows"] * 0.05


def test_ordinal_structure(spark):
    from llmaix_spark.plans.queries import q_ordinal_association

    row = q_ordinal_association(spark, SF_DIR).collect()[0]
    assert -1 <= row["gamma"] <= 1
    # |d_yx| <= |gamma| (extra tie mass in the denominator)
    assert abs(row["somers_d_yx"]) <= abs(row["gamma"]) + 1e-9
    assert -1 <= row["tau_c"] <= 1


def test_smk_structure(spark):
    from llmaix_spark.plans.queries import q_seasonal_mann_kendall

    row = q_seasonal_mann_kendall(spark, SF_DIR).collect()[0]
    assert row["n_seasons"] == 7
    assert row["var_s"] > 0
    assert row["trend_05"] == (abs(row["z_stat"]) > 1.96)


def test_cronbach_structure(spark):
    from llmaix_spark.plans.queries import q_cronbach_alpha

    row = q_cronbach_alpha(spark, SF_DIR).collect()[0]
    assert row["k_items"] == 12
    assert row["cronbach_alpha"] <= 1.0
    assert row["reliable_07"] == (row["cronbach_alpha"] > 0.7)


def test_rayleigh_structure(spark):
    from llmaix_spark.plans.queries import q_rayleigh_dow

    row = q_rayleigh_dow(spark, SF_DIR).collect()[0]
    assert 0 <= row["resultant_length"] <= 1
    assert row["rayleigh_z"] >= 0
    assert row["nonuniform_05"] == (row["p_value"] < 0.05)


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "foster_stuart_records",
        "mahalanobis_outliers",
        "ordinal_association",
        "seasonal_mann_kendall",
        "cronbach_alpha",
        "rayleigh_dow",
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


def test_fs_matches_python(spark):
    from llmaix_spark.plans.queries import q_foster_stuart_records

    row = q_foster_stuart_records(spark, SF_DIR).collect()[0]

    ys = [y for _, y in _daily_counts()]
    n = len(ys)
    u = lo = 0
    for i in range(1, n):
        if ys[i] > max(ys[:i]):
            u += 1
        if ys[i] < min(ys[:i]):
            lo += 1
    var = 2 * sum(1 / t for t in range(2, n + 1))
    z = (u - lo) / math.sqrt(var)
    assert row["n_days"] == n
    assert row["upper_records"] == u
    assert row["lower_records"] == lo
    assert abs(row["z_stat"] - z) < 1e-4


def test_mahalanobis_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_mahalanobis_outliers

    row = q_mahalanobis_outliers(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    pts = [
        (_rnd(q * 100), _rnd(d * 100))
        for q, d in zip(li["l_quantity"], li["l_discount"])
    ]
    n = len(pts)
    mx = sum(x for x, _ in pts) / n
    my = sum(y for _, y in pts) / n
    cxx = sum((x - mx) ** 2 for x, _ in pts) / n
    cyy = sum((y - my) ** 2 for _, y in pts) / n
    cxy = sum((x - mx) * (y - my) for x, y in pts) / n
    det = cxx * cyy - cxy * cxy
    d2s = [
        (
            cyy * (x - mx) ** 2
            - 2 * cxy * (x - mx) * (y - my)
            + cxx * (y - my) ** 2
        )
        / det
        for x, y in pts
    ]
    assert row["n_rows"] == n
    assert row["n_outliers"] == sum(1 for d in d2s if d > 13.8155)
    assert abs(row["max_d2"] - max(d2s)) < 1e-4
    assert abs(row["mean_d2"] - 2.0) < 1e-6


def test_ordinal_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_ordinal_association

    row = q_ordinal_association(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    nli = Counter(li["l_orderkey"])
    cells: Counter = Counter()
    for k, tp in zip(o["o_orderkey"], o["o_totalprice"]):
        if k in nli:
            cells[(min(int(tp // 100000), 3), nli[k])] += 1
    conc = disc = ty = 0
    items = list(cells.items())
    for (x1, y1), o1 in items:
        for (x2, y2), o2 in items:
            if x2 > x1 and y2 > y1:
                conc += o1 * o2
            elif x2 > x1 and y2 < y1:
                disc += o1 * o2
            elif x2 > x1 and y2 == y1:
                ty += o1 * o2
    n = sum(cells.values())
    m = min(
        len({x for x, _ in cells}), len({y for _, y in cells})
    )
    assert row["n_orders"] == n
    assert row["concordant"] == conc
    assert row["discordant"] == disc
    assert abs(row["gamma"] - (conc - disc) / (conc + disc)) < 1e-5
    assert (
        abs(row["somers_d_yx"] - (conc - disc) / (conc + disc + ty))
        < 1e-5
    )
    assert (
        abs(row["tau_c"] - 2 * m * (conc - disc) / (n * n * (m - 1)))
        < 1e-5
    )


def test_smk_matches_python(spark):
    from llmaix_spark.plans.queries import q_seasonal_mann_kendall

    row = q_seasonal_mann_kendall(spark, SF_DIR).collect()[0]

    seasons: defaultdict = defaultdict(list)
    for d, y in _daily_counts():
        seasons[(d - __import__("datetime").date(1970, 1, 1)).days % 7].append(y)
    s = 0
    var = 0.0
    for ys in seasons.values():
        ng = len(ys)
        for i in range(ng):
            for j in range(i + 1, ng):
                s += (ys[j] > ys[i]) - (ys[j] < ys[i])
        var += ng * (ng - 1) * (2 * ng + 5) / 18
        for t in Counter(ys).values():
            var -= t * (t - 1) * (2 * t + 5) / 18
    z = (s - 1) / math.sqrt(var) if s > 0 else (
        (s + 1) / math.sqrt(var) if s < 0 else 0.0
    )
    assert row["s_stat"] == s
    assert abs(row["var_s"] - var) < 1e-3
    assert abs(row["z_stat"] - z) < 1e-4


def test_cronbach_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_cronbach_alpha

    row = q_cronbach_alpha(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    ym: Counter = Counter()
    for d in o["o_orderdate"]:
        ym[(d.year, d.month)] += 1
    years = sorted(
        y
        for y in {yy for yy, _ in ym}
        if sum(1 for yy, _ in ym if yy == y) == 12
    )

    def _svar(vals):
        n = len(vals)
        mu = sum(vals) / n
        return sum((v - mu) ** 2 for v in vals) / (n - 1)

    item_vars = [
        _svar([ym[(y, m)] for y in years]) for m in range(1, 13)
    ]
    tot_var = _svar([sum(ym[(y, m)] for m in range(1, 13)) for y in years])
    alpha = 12 / 11 * (1 - sum(item_vars) / tot_var)
    assert row["n_years"] == len(years)
    assert abs(row["sum_item_var"] - sum(item_vars)) < 1e-3
    assert abs(row["total_var"] - tot_var) < 1e-3
    assert abs(row["cronbach_alpha"] - alpha) < 1e-4


def test_rayleigh_matches_python(spark):
    import datetime

    from llmaix_spark.plans.queries import q_rayleigh_dow

    row = q_rayleigh_dow(spark, SF_DIR).collect()[0]

    epoch = datetime.date(1970, 1, 1)
    per: Counter = Counter()
    for d, y in _daily_counts():
        per[(d - epoch).days % 7] += y
    n = sum(per.values())
    cs = sum(c * math.cos(dow * (2 * math.pi / 7)) for dow, c in per.items())
    sn = sum(c * math.sin(dow * (2 * math.pi / 7)) for dow, c in per.items())
    rbar = math.sqrt(cs * cs + sn * sn) / n
    z = n * rbar * rbar
    p = math.exp(-z) * (1 + (2 * z - z * z) / (4 * n))
    assert row["n_orders"] == n
    assert abs(row["resultant_length"] - rbar) < 1e-5
    assert abs(row["rayleigh_z"] - z) < 1e-3
    assert abs(row["p_value"] - p) < 1e-4
