"""Plan pins, partition invariance, and python twins for the round-54
wave (Horvitz-Thompson / Holm-Bonferroni / bullwhip / nucleus cutoff /
E-value / variance-reduction comparison).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rnd(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().strip().split(" ") if t]


# ---------------------------------------------------------------------------
# structural properties


def test_ht_pps_optimality(spark):
    """pps-by-price makes the revenue HT estimator near-exact while
    the urgent-count estimator (a different total) carries real
    sampling error — the design lesson in one row."""
    from llmaix_spark.plans.queries import q_horvitz_thompson

    row = q_horvitz_thompson(spark, SF_DIR).collect()[0]
    assert 0 < row["n_sampled"] < row["n"]
    assert row["rev_rel_err"] < 0.05
    assert row["urgent_rel_err"] >= 0


def test_holm_conservative_vs_bh(spark):
    """Holm (FWER) never rejects more than Benjamini-Hochberg (FDR)
    on the same p-values."""
    from llmaix_spark.plans.queries import (
        q_holm_bonferroni,
        q_multiple_testing_fdr,
    )

    holm = sum(
        1 for r in q_holm_bonferroni(spark, SF_DIR).collect()
        if r["rejected_holm"]
    )
    bh = sum(
        1 for r in q_multiple_testing_fdr(spark, SF_DIR).collect()
        if r["rejected"]
    )
    assert holm <= bh


def test_bullwhip_positive(spark):
    from llmaix_spark.plans.queries import q_bullwhip_effect

    row = q_bullwhip_effect(spark, SF_DIR).collect()[0]
    assert row["cv2_orders"] > 0 and row["cv2_demand"] > 0
    assert row["bullwhip_ratio"] > 0


def test_nucleus_widens_with_temperature(spark):
    from llmaix_spark.plans.queries import q_nucleus_cutoff

    rows = {r["temperature"]: r for r in q_nucleus_cutoff(spark, SF_DIR).collect()}
    assert set(rows) == {0.5, 1.0, 2.0}
    # hotter sampling needs more words to cover 90% of the mass
    assert (
        rows[0.5]["nucleus_size"]
        <= rows[1.0]["nucleus_size"]
        <= rows[2.0]["nucleus_size"]
    )
    for r in rows.values():
        assert r["nucleus_mass"] >= 0.9 - 1e-9
        assert r["nucleus_size"] <= r["vocab_size"]


def test_e_value_bounds(spark):
    from llmaix_spark.plans.queries import q_e_value_sensitivity

    row = q_e_value_sensitivity(spark, SF_DIR).collect()[0]
    assert row["rr_ci_lo"] <= row["risk_ratio"] <= row["rr_ci_hi"]
    # E-values are at least 1, and the CI E-value is the weaker claim
    assert row["e_value"] >= 1
    assert 1 <= row["e_value_ci"] <= row["e_value"] + 1e-9


def test_variance_reduction_sane(spark):
    from llmaix_spark.plans.queries import q_variance_reduction_compare

    row = q_variance_reduction_compare(spark, SF_DIR).collect()[0]
    # both adjustments can only reduce variance (CUPED by identity,
    # stratification by the law of total variance)
    assert 0 <= row["cuped_reduction"] <= 1
    assert 0 <= row["strat_reduction"] <= 1
    assert row["var_cuped"] <= row["var_raw"] + 1e-6
    assert row["var_strat"] <= row["var_raw"] + 1e-6


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "horvitz_thompson",
        "holm_bonferroni",
        "bullwhip_effect",
        "nucleus_cutoff",
        "e_value_sensitivity",
        "variance_reduction_compare",
    ],
)
def test_wave54_partition_invariance(spark, qname):
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


def test_ht_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_horvitz_thompson

    row = q_horvitz_thompson(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cs = [_rnd(p * 100) for p in o["o_totalprice"]]
    ys = [1 if p == "1-URGENT" else 0 for p in o["o_orderpriority"]]
    ks = [int(k) for k in o["o_orderkey"]]
    mc = max(cs)
    n_s = ht_rev = ht_u = 0
    for c, y, k in zip(cs, ys, ks):
        u = _h60(f"{k}:ht") % 1_048_576
        if u * mc < c * 1_048_576:
            n_s += 1
            ht_rev += mc
            if y:
                ht_u += _rnd(mc * 1e6 / c)
    assert row["n_sampled"] == n_s
    assert abs(row["ht_revenue"] - ht_rev / 100) < 1e-4
    assert abs(row["ht_urgent"] - ht_u / 1e6) < 1e-6


def test_holm_matches_python(spark):
    from llmaix_spark.plans.queries import q_holm_bonferroni

    rows = sorted(
        q_holm_bonferroni(spark, SF_DIR).collect(), key=lambda r: r["p_rank"]
    )
    m = len(rows)
    running = True
    for i, r in enumerate(rows, start=1):
        thr = round(0.05 / (m - i + 1), 8)
        assert abs(r["holm_threshold"] - thr) < 1e-9
        running = running and (r["p_value"] <= thr)
        assert r["rejected_holm"] == running


def test_bullwhip_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_bullwhip_effect

    row = q_bullwhip_effect(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    up = list(Counter(o["o_orderdate"].dt.date).values())
    down_c = defaultdict(int)
    for d, q in zip(li["l_shipdate"].dt.date, li["l_quantity"]):
        down_c[d] += _rnd(q)
    down = list(down_c.values())

    def cv2(vs):
        n = len(vs)
        mu = sum(vs) / n
        return (sum(v * v for v in vs) / n - mu * mu) / (mu * mu)

    assert abs(row["cv2_orders"] - cv2(up)) < 1e-6
    assert abs(row["cv2_demand"] - cv2(down)) < 1e-6
    assert abs(row["bullwhip_ratio"] - cv2(up) / cv2(down)) < 1e-5


def test_nucleus_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_nucleus_cutoff

    got = {r["temperature"]: r for r in q_nucleus_cutoff(spark, SF_DIR).collect()}

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    cnt: Counter = Counter()
    for r in d.itertuples():
        cnt.update(_tokens(r.text))
    for t_ in (0.5, 1.0, 2.0):
        wu = sorted(
            ((_rnd(math.exp(math.log(c) / t_) * 1e6), w) for w, c in cnt.items()),
            key=lambda x: (-x[0], x[1]),
        )
        tot = sum(v for v, _ in wu)
        cum = 0
        for i, (v, _) in enumerate(wu, start=1):
            cum += v
            if cum * 10 >= tot * 9:
                break
        g = got[t_]
        assert g["nucleus_size"] == i
        assert g["vocab_size"] == len(wu)
        assert abs(g["nucleus_mass"] - cum / tot) < 1e-6


def test_e_value_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_e_value_sensitivity

    row = q_e_value_sensitivity(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    t = [int(n) % 2 for n in m["c_nationkey"]]
    y = [1 if p == "1-URGENT" else 0 for p in m["o_orderpriority"]]
    a = sum(ti * yi for ti, yi in zip(t, y))
    n1 = sum(t)
    cc = sum((1 - ti) * yi for ti, yi in zip(t, y))
    n0 = len(t) - n1
    p1, p0 = a / n1, cc / n0
    rr = p1 / p0
    se = math.sqrt((1 - p1) / (n1 * p1) + (1 - p0) / (n0 * p0))
    lo = math.exp(math.log(rr) - 1.96 * se)
    hi = math.exp(math.log(rr) + 1.96 * se)
    rs = max(rr, 1 / rr)
    ev = rs + math.sqrt(rs * (rs - 1))
    cs = lo if rr >= 1 else 1 / hi
    evc = 1.0 if cs <= 1 else cs + math.sqrt(cs * (cs - 1))
    assert abs(row["risk_ratio"] - rr) < 1e-6
    assert abs(row["e_value"] - ev) < 1e-5
    assert abs(row["e_value_ci"] - evc) < 1e-5


def test_vr_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_variance_reduction_compare

    row = q_variance_reduction_compare(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    us = o["o_orderdate"].astype("datetime64[ns]").astype("int64") // 1000
    mid = int((int(us.min()) + int(us.max())) / 2)
    cust = defaultdict(lambda: [0, 0])
    for k, u, p in zip(o["o_custkey"], us, o["o_totalprice"]):
        cc = _rnd(p * 100)
        if int(u) < mid:
            cust[int(k)][0] += cc
        else:
            cust[int(k)][1] += cc
    xs = [x for x, _ in cust.values()]
    ys = [y for _, y in cust.values()]
    n = len(xs)
    mx = max(xs)

    def var(vs):
        mu = sum(vs) / n
        return sum(v * v for v in vs) / n - mu * mu

    var_y = var(ys)
    cov = sum(x * y for x, y in zip(xs, ys)) / n - (sum(xs) / n) * (
        sum(ys) / n
    )
    theta = cov / var(xs)
    var_cuped = var_y - theta * theta * var(xs)
    strata = defaultdict(list)
    for x, y in zip(xs, ys):
        strata[min(9, x * 10 // (mx + 1))].append(y)
    ssw = sum(
        _rnd((sum(y * y for y in v) - sum(v) * (sum(v) / len(v))) / 1e4)
        for v in strata.values()
    ) * 1e4
    var_strat = ssw / n
    assert row["n_customers"] == n
    assert abs(row["var_raw"] - var_y / 1e4) < 1e-3
    assert abs(row["var_cuped"] - var_cuped / 1e4) < 1e-3
    assert abs(row["var_strat"] - var_strat / 1e4) < 1e-3
