"""Plan pins, partition invariance, and python twins for the round-73
wave (Gwet AC1 / Fligner–Policello / ANCOVA / Blomqvist beta / White
heteroskedasticity / Hoeffding D).
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


def _qd_points():
    import pandas as pd

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    return [
        (_rnd(q * 100), _rnd(d * 100))
        for q, d in zip(li["l_quantity"], li["l_discount"])
    ]


# ---------------------------------------------------------------------------
# structural properties


def test_gwet_structure(spark):
    from llmaix_spark.plans.queries import q_gwet_ac1

    row = q_gwet_ac1(spark, SF_DIR).collect()[0]
    assert 0 <= row["p_observed"] <= 1
    assert row["gwet_ac1"] <= 1 and row["cohen_kappa"] <= 1
    assert row["ac1_above_kappa"] == (
        row["gwet_ac1"] > row["cohen_kappa"]
    )


def test_fp_structure(spark):
    from llmaix_spark.plans.queries import q_fligner_policello

    row = q_fligner_policello(spark, SF_DIR).collect()[0]
    # the two placement sums partition the n1·n2 cross pairs
    # (ties counted half on each side)
    assert (
        abs(
            row["n_r"] * row["mean_placement_r"]
            + row["n_n"] * row["mean_placement_n"]
            - row["n_r"] * row["n_n"]
        )
        < 1.0
    )
    assert row["differ_05"] == (abs(row["u_stat"]) > 1.96)


def test_ancova_structure(spark):
    from llmaix_spark.plans.queries import q_ancova_returnflag

    row = q_ancova_returnflag(spark, SF_DIR).collect()[0]
    assert row["k_groups"] == 3
    # adding group dummies can only reduce the residual SS
    assert row["sse_within"] <= row["sse_covariate_only"] + 1e-6
    assert row["f_adjusted"] >= 0
    assert row["group_effect_05"] == (row["f_adjusted"] > 2.996)


def test_blomqvist_structure(spark):
    from llmaix_spark.plans.queries import q_blomqvist_beta

    row = q_blomqvist_beta(spark, SF_DIR).collect()[0]
    assert -1 <= row["blomqvist_beta"] <= 1
    assert 0 <= row["n_excluded"] < row["n_rows"]
    assert row["n_concordant"] <= row["n_rows"] - row["n_excluded"]


def test_white_structure(spark):
    from llmaix_spark.plans.queries import q_white_heteroskedasticity

    row = q_white_heteroskedasticity(spark, SF_DIR).collect()[0]
    assert 0 <= row["aux_r2"] <= 1
    assert abs(row["white_lm"] - row["n_obs"] * row["aux_r2"]) < 0.01
    assert row["hetero_05"] == (row["white_lm"] > 5.991)


def test_hoeffding_structure(spark):
    from llmaix_spark.plans.queries import q_hoeffding_d

    row = q_hoeffding_d(spark, SF_DIR).collect()[0]
    # D is bounded by 1/30 above; heavy ties can push it slightly
    # negative under independence
    assert -0.5 <= row["hoeffding_d"] <= 1 / 30 + 1e-9
    assert row["positive_dependence"] == (row["hoeffding_d"] > 0)


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "gwet_ac1",
        "fligner_policello",
        "ancova_returnflag",
        "blomqvist_beta",
        "white_heteroskedasticity",
        "hoeffding_d",
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


def test_gwet_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_gwet_ac1

    row = q_gwet_ac1(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    ra = [tp > 150000 for tp in o["o_totalprice"]]
    rb = [p in ("1-URGENT", "2-HIGH") for p in o["o_orderpriority"]]
    n = len(ra)
    pa, pb = sum(ra) / n, sum(rb) / n
    po = sum(1 for a, b in zip(ra, rb) if a == b) / n
    pibar = (pa + pb) / 2
    ac1 = (po - 2 * pibar * (1 - pibar)) / (1 - 2 * pibar * (1 - pibar))
    pek = pa * pb + (1 - pa) * (1 - pb)
    kappa = (po - pek) / (1 - pek)
    assert row["n_orders"] == n
    assert abs(row["p_observed"] - po) < 1e-6
    assert abs(row["gwet_ac1"] - ac1) < 1e-5
    assert abs(row["cohen_kappa"] - kappa) < 1e-5


def test_fp_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_fligner_policello

    row = q_fligner_policello(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    xs, ys = [], []
    for fl, q in zip(li["l_returnflag"], li["l_quantity"]):
        if fl == "R":
            xs.append(_rnd(q))
        elif fl == "N":
            ys.append(_rnd(q))
    hy = Counter(ys)
    hx = Counter(xs)

    def _placements(vals, other):
        oc = Counter(other)
        keys = sorted(oc)
        out = []
        for v in vals:
            below = sum(c for k, c in oc.items() if k < v)
            out.append(below + oc.get(v, 0) / 2)
        return out

    px = _placements(xs, ys)
    py = _placements(ys, xs)
    mpx = sum(px) / len(px)
    mpy = sum(py) / len(py)
    ssx = sum((p - mpx) ** 2 for p in px)
    ssy = sum((p - mpy) ** 2 for p in py)
    u = (sum(py) - sum(px)) / (2 * math.sqrt(ssx + ssy + mpx * mpy))
    assert row["n_r"] == len(xs) and row["n_n"] == len(ys)
    assert abs(row["mean_placement_r"] - mpx) < 1e-4
    assert abs(row["mean_placement_n"] - mpy) < 1e-4
    assert abs(row["u_stat"] - u) < 1e-4
    del hx, hy


def test_ancova_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_ancova_returnflag

    row = q_ancova_returnflag(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    groups: dict = {}
    for fl, q, d in zip(
        li["l_returnflag"], li["l_quantity"], li["l_discount"]
    ):
        groups.setdefault(fl, []).append((_rnd(d * 100), _rnd(q * 100)))

    def _cent(pts):
        n = len(pts)
        mx = sum(x for x, _ in pts) / n
        my = sum(y for _, y in pts) / n
        return (
            sum((x - mx) ** 2 for x, _ in pts),
            sum((y - my) ** 2 for _, y in pts),
            sum((x - mx) * (y - my) for x, y in pts),
        )

    wxx = wyy = wxy = 0.0
    allpts = []
    for pts in groups.values():
        a, b, c = _cent(pts)
        wxx += a
        wyy += b
        wxy += c
        allpts.extend(pts)
    txx, tyy, txy = _cent(allpts)
    sse_t = tyy - txy * txy / txx
    sse_w = wyy - wxy * wxy / wxx
    k = len(groups)
    n = len(allpts)
    f = ((sse_t - sse_w) / (k - 1)) / (sse_w / (n - k - 1))
    assert row["n_rows"] == n
    assert abs(row["common_slope"] - wxy / wxx) < 1e-5
    assert abs(row["f_adjusted"] - f) < 1e-3


def test_blomqvist_matches_python(spark):
    from llmaix_spark.plans.queries import q_blomqvist_beta

    row = q_blomqvist_beta(spark, SF_DIR).collect()[0]

    pts = _qd_points()
    n = len(pts)

    def _lower_median(vals):
        sv = sorted(vals)
        return sv[(n + 1) // 2 - 1]

    mx = _lower_median([x for x, _ in pts])
    my = _lower_median([y for _, y in pts])
    on = sum(1 for x, y in pts if x == mx or y == my)
    same = sum(
        1
        for x, y in pts
        if x != mx and y != my and ((x > mx) == (y > my))
    )
    used = n - on
    beta = (2 * same - used) / used
    assert row["n_rows"] == n
    assert row["n_excluded"] == on
    assert row["n_concordant"] == same
    assert abs(row["blomqvist_beta"] - beta) < 1e-6


def test_white_matches_python(spark):
    from llmaix_spark.plans.queries import q_white_heteroskedasticity

    row = q_white_heteroskedasticity(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    pairs = [(ys[i - 7], ys[i]) for i in range(7, len(ys))]
    n = len(pairs)
    sf1 = sum(f for f, _ in pairs)
    sf2 = sum(f * f for f, _ in pairs)
    sy = sum(y for _, y in pairs)
    sfy = sum(f * y for f, y in pairs)
    b = (sfy - sf1 * sy / n) / (sf2 - sf1 * sf1 / n)
    a = (sy - b * sf1) / n
    ws = [(y - a - b * f) ** 2 for f, y in pairs]
    m1, m2 = sf1 / n, sf2 / n
    c11 = sf2 / n - m1 * m1
    c12 = sum(f ** 3 for f, _ in pairs) / n - m1 * m2
    c22 = sum(f ** 4 for f, _ in pairs) / n - m2 * m2
    mw = sum(ws) / n
    g1 = sum(w * f for (f, _), w in zip(pairs, ws)) / n - m1 * mw
    g2 = sum(w * f * f for (f, _), w in zip(pairs, ws)) / n - m2 * mw
    det = c11 * c22 - c12 * c12
    expl = (g1 * (c22 * g1 - c12 * g2) + g2 * (c11 * g2 - c12 * g1)) / det
    varw = sum(w * w for w in ws) / n - mw * mw
    r2 = expl / varw
    assert row["n_obs"] == n
    assert abs(row["aux_r2"] - r2) < 1e-5
    assert abs(row["white_lm"] - n * r2) < 1e-2


def test_hoeffding_matches_python(spark):
    from llmaix_spark.plans.queries import q_hoeffding_d

    row = q_hoeffding_d(spark, SF_DIR).collect()[0]

    pts = _qd_points()
    n = len(pts)
    cells = Counter(pts)
    xs = Counter(x for x, _ in pts)
    ys = Counter(y for _, y in pts)

    def _midrank(hist):
        out = {}
        cum = 0
        for v in sorted(hist):
            out[v] = cum + (hist[v] + 1) / 2
            cum += hist[v]
        return out

    rx = _midrank(xs)
    ry = _midrank(ys)
    d1 = d2 = d3 = 0.0
    items = list(cells.items())
    for (x, y), c in items:
        blo = sum(
            c2 for (x2, y2), c2 in items if x2 < x and y2 < y
        )
        ex = sum(c2 for (x2, y2), c2 in items if x2 == x and y2 < y)
        ey = sum(c2 for (x2, y2), c2 in items if x2 < x and y2 == y)
        q = 1 + blo + ex / 2 + ey / 2 + (c - 1) / 4
        r, s = rx[x], ry[y]
        d1 += c * (q - 1) * (q - 2)
        d2 += c * (r - 1) * (r - 2) * (s - 1) * (s - 2)
        d3 += c * (r - 2) * (s - 2) * (q - 1)
    d = (
        30
        * ((n - 2) * (n - 3) * d1 + d2 - 2 * (n - 2) * d3)
        / (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    )
    assert row["n_rows"] == n
    assert abs(row["hoeffding_d"] - d) < 1e-7
