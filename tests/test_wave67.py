"""Plan pins, partition invariance, and python twins for the round-67
wave (Wilcoxon signed-rank / Hodges-Lehmann / Yuen trimmed /
Brunner-Munzel / Mantel-Haenszel / hash bootstrap CI).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


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


def test_wsr_structure(spark):
    from llmaix_spark.plans.queries import q_wilcoxon_signed_rank

    row = q_wilcoxon_signed_rank(spark, SF_DIR).collect()[0]
    assert row["n_pairs"] > 100
    # 2W+ is bounded by 2*n(n+1)/2
    n = row["n_pairs"]
    assert 0 <= row["w_plus_x2"] <= n * (n + 1)
    assert row["weekly_drift_05"] == (abs(row["z_stat"]) > 1.96)


def test_hl_structure(spark):
    from llmaix_spark.plans.queries import q_hodges_lehmann

    row = q_hodges_lehmann(spark, SF_DIR).collect()[0]
    assert -49 <= row["hl_shift"] <= 49
    assert row["n_pairs"] > 0
    assert row["shift_nonzero"] == (row["hl_shift"] != 0)


def test_yuen_structure(spark):
    from llmaix_spark.plans.queries import q_yuen_trimmed

    row = q_yuen_trimmed(spark, SF_DIR).collect()[0]
    assert 1 <= row["trimmed_mean_r"] <= 50
    assert 1 <= row["trimmed_mean_n"] <= 50
    assert row["differ_05"] == (abs(row["yuen_t"]) > 1.96)


def test_bm_structure(spark):
    from llmaix_spark.plans.queries import q_brunner_munzel

    row = q_brunner_munzel(spark, SF_DIR).collect()[0]
    assert 0 <= row["relative_effect"] <= 1
    assert row["stochastic_dominance_05"] == (
        abs(row["bm_stat"]) > 1.96
    )


def test_mh_structure(spark):
    from llmaix_spark.plans.queries import q_mantel_haenszel

    row = q_mantel_haenszel(spark, SF_DIR).collect()[0]
    assert row["n_strata"] >= 5
    assert row["or_mh"] > 0
    assert row["cmh_chi2"] >= 0
    assert row["associated_05"] == (row["cmh_chi2"] > 3.841)


def test_bootstrap_structure(spark):
    from llmaix_spark.plans.queries import q_bootstrap_ci

    row = q_bootstrap_ci(spark, SF_DIR).collect()[0]
    assert row["b_reps"] == 200
    assert row["ci_lo"] <= row["ci_hi"]
    # a 95% bootstrap CI of the mean should bracket the sample mean
    assert row["ci_lo"] <= row["mean_daily"] <= row["ci_hi"]
    assert row["mean_inside_ci"]


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "wilcoxon_signed_rank",
        "hodges_lehmann",
        "yuen_trimmed",
        "brunner_munzel",
        "mantel_haenszel",
        "bootstrap_ci",
    ],
)
def test_wave67_partition_invariance(spark, qname):
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


def test_wsr_matches_python(spark):
    from llmaix_spark.plans.queries import q_wilcoxon_signed_rank

    row = q_wilcoxon_signed_rank(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    ds = [
        ys[i + 7] - ys[i] for i in range(len(ys) - 7) if ys[i + 7] != ys[i]
    ]
    n = len(ds)
    ranked = sorted((abs(d), d > 0) for d in ds)
    # average ranks with ties
    wplus = 0.0
    i = 0
    tie3 = 0
    while i < n:
        j = i
        while j < n and ranked[j][0] == ranked[i][0]:
            j += 1
        t = j - i
        avg = (i + 1 + j) / 2
        wplus += avg * sum(1 for k in range(i, j) if ranked[k][1])
        tie3 += t**3 - t
        i = j
    ew = n * (n + 1) / 4
    var = n * (n + 1) * (2 * n + 1) / 24 - tie3 / 48
    z = (wplus - ew) / math.sqrt(var)
    assert row["n_pairs"] == n
    assert row["w_plus_x2"] == int(round(2 * wplus))
    assert abs(row["z_stat"] - z) < 1e-4


def test_hl_matches_python(spark):
    from llmaix_spark.plans.queries import q_hodges_lehmann

    row = q_hodges_lehmann(spark, SF_DIR).collect()[0]

    hr, hn = _rn_hists()
    diffs: Counter = Counter()
    for qr, cr in hr.items():
        for qn, cn in hn.items():
            diffs[qr - qn] += cr * cn
    tot = sum(diffs.values())
    cum = 0
    hl = None
    for d in sorted(diffs):
        cum += diffs[d]
        if cum * 2 >= tot:
            hl = d
            break
    assert row["hl_shift"] == hl
    assert row["n_pairs"] == tot


def _trim_stats(hist):
    vals = sorted(hist)
    n = sum(hist.values())
    g = int(n * 0.2)
    # expanded order statistics, positionally trimmed/winsorized
    expanded = []
    for v in vals:
        expanded += [v] * hist[v]
    kept = expanded[g : n - g]
    tm = sum(kept) / len(kept)
    vlo, vhi = expanded[g], expanded[n - g - 1]
    wins = [min(max(x, vlo), vhi) for x in expanded]
    wmean = sum(wins) / n
    wvar = sum((x - wmean) ** 2 for x in wins) / (n - 1)
    h = n - 2 * g
    d = wvar * (n - 1) / (h * (h - 1))
    return n, tm, d


def test_yuen_matches_python(spark):
    from llmaix_spark.plans.queries import q_yuen_trimmed

    row = q_yuen_trimmed(spark, SF_DIR).collect()[0]

    hr, hn = _rn_hists()
    n_r, tm_r, d_r = _trim_stats(hr)
    n_n, tm_n, d_n = _trim_stats(hn)
    t = (tm_r - tm_n) / math.sqrt(d_r + d_n)
    assert row["n_r"] == n_r and row["n_n"] == n_n
    assert abs(row["trimmed_mean_r"] - tm_r) < 1e-4
    assert abs(row["trimmed_mean_n"] - tm_n) < 1e-4
    assert abs(row["yuen_t"] - t) < 1e-3


def test_bm_matches_python(spark):
    from llmaix_spark.plans.queries import q_brunner_munzel

    row = q_brunner_munzel(spark, SF_DIR).collect()[0]

    hr, hn = _rn_hists()
    xs = []
    for v, c in hr.items():
        xs += [(v, "R")] * c
    for v, c in hn.items():
        xs += [(v, "N")] * c
    xs.sort()
    nn = len(xs)
    # combined midranks
    mid = {}
    i = 0
    while i < nn:
        j = i
        while j < nn and xs[j][0] == xs[i][0]:
            j += 1
        mid[xs[i][0]] = (i + 1 + j) / 2
        i = j
    grp = {"R": hr, "N": hn}
    stats = {}
    for fl, h in grp.items():
        n_g = sum(h.values())
        # within-group midranks
        gmid = {}
        cum = 0
        for v in sorted(h):
            gmid[v] = cum + (h[v] + 1) / 2
            cum += h[v]
        rbar = sum(c * mid[v] for v, c in h.items()) / n_g
        s2 = sum(
            c * (mid[v] - gmid[v] - rbar + (n_g + 1) / 2) ** 2
            for v, c in h.items()
        ) / (n_g - 1)
        stats[fl] = (n_g, rbar, s2)
    n1, m1, s1 = stats["R"]
    n2, m2, s2 = stats["N"]
    w = n1 * n2 * (m2 - m1) / ((n1 + n2) * math.sqrt(n1 * s1 + n2 * s2))
    p = (m2 - m1) / (n1 + n2) + 0.5
    assert row["n_r"] == n1 and row["n_n"] == n2
    assert abs(row["relative_effect"] - p) < 1e-4
    assert abs(row["bm_stat"] - w) < 1e-3


def test_mh_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_mantel_haenszel

    row = q_mantel_haenszel(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    strata: dict[int, list] = defaultdict(lambda: [0, 0, 0, 0])
    for d, pr, stt in zip(
        o["o_orderdate"], o["o_orderpriority"], o["o_orderstatus"]
    ):
        exp = pr == "1-URGENT"
        out = stt == "F"
        cell = strata[d.year]
        cell[(0 if exp else 2) + (0 if out else 1)] += 1
    sadn = sbcn = se = sv = sa = 0.0
    for a, b, c, d in strata.values():
        n = a + b + c + d
        sa += a
        sadn += a * d / n
        sbcn += b * c / n
        se += (a + b) * (a + c) / n
        sv += (
            (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        )
    or_mh = sadn / sbcn
    cmh = (abs(sa - se) - 0.5) ** 2 / sv
    assert row["n_strata"] == len(strata)
    assert abs(row["or_mh"] - or_mh) < 1e-4
    assert abs(row["cmh_chi2"] - cmh) < 1e-3


def test_bootstrap_matches_python(spark):
    from llmaix_spark.plans.queries import q_bootstrap_ci

    row = q_bootstrap_ci(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    n = len(ys)
    means = []
    for b in range(200):
        s = 0
        for i in range(n):
            s += ys[_h(f"{b}:{i}:boot") % n]
        means.append((round(s / n, 6), b))
    means.sort()
    assert row["n_days"] == n
    assert abs(row["mean_daily"] - sum(ys) / n) < 1e-5
    assert abs(row["ci_lo"] - means[4][0]) < 1e-6
    assert abs(row["ci_hi"] - means[195][0]) < 1e-6
