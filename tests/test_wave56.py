"""Plan pins, partition invariance, and python twins for the round-56
wave (Theil decomposition / Friedman test / DFT seasonality / SPRT /
Gorilla compression / auction revenue).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


# ---------------------------------------------------------------------------
# structural properties


def test_theil_additivity(spark):
    from llmaix_spark.plans.queries import q_theil_decomposition

    row = q_theil_decomposition(spark, SF_DIR).collect()[0]
    assert row["theil_total"] >= 0
    assert row["theil_between"] >= -1e-6
    assert abs(
        row["theil_total"]
        - (row["theil_between"] + row["theil_within"])
    ) < 2e-6
    assert 0 <= row["between_share"] <= 1


def test_friedman_bounds(spark):
    from llmaix_spark.plans.queries import q_friedman_test

    row = q_friedman_test(spark, SF_DIR).collect()[0]
    k, n = row["k_treatments"], row["n_blocks"]
    assert row["friedman_chi2"] >= -1e-9
    # chi2 is bounded by the all-agree extreme n·(k-1) ... sanity only
    assert row["friedman_chi2"] <= n * (k - 1) + 1e-6
    assert row["significant_05"] == (row["friedman_chi2"] > 9.488)


def test_dft_shares_bounded(spark):
    from llmaix_spark.plans.queries import q_dft_seasonality

    rows = {r["period_days"]: r for r in q_dft_seasonality(spark, SF_DIR).collect()}
    assert set(rows) == {7, 30, 91}
    for r in rows.values():
        # a single bin carries at most all the variance (leakage slack)
        assert 0 <= r["power_share"] <= 1.2


def test_sprt_monotone_decision(spark):
    from llmaix_spark.plans.queries import q_sprt_trajectory

    rows = sorted(
        q_sprt_trajectory(spark, SF_DIR).collect(),
        key=lambda r: r["month_idx"],
    )
    decided = False
    for r in rows:
        assert not (r["crossed_upper"] and r["crossed_lower"])
        decided = decided or r["crossed_upper"] or r["crossed_lower"]
        assert r["decided_by_now"] == decided


def test_gorilla_compresses(spark):
    from llmaix_spark.plans.queries import q_gorilla_compression

    row = q_gorilla_compression(spark, SF_DIR).collect()[0]
    assert 1 <= row["avg_bits"] <= 36
    assert row["compression_ratio"] > 1  # beats raw 64-bit


def test_auction_second_below_first(spark):
    from llmaix_spark.plans.queries import q_auction_revenue

    row = q_auction_revenue(spark, SF_DIR).collect()[0]
    assert row["second_price_total"] <= row["first_price_total"]
    assert 0 < row["revenue_ratio"] <= 1


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "theil_decomposition",
        "friedman_test",
        "dft_seasonality",
        "sprt_trajectory",
        "gorilla_compression",
        "auction_revenue",
    ],
)
def test_wave56_partition_invariance(spark, qname):
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


def _cust_spend(sf_dir):
    import pandas as pd

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    spend = defaultdict(lambda: [None, 0])
    for k, nat, p in zip(m["o_custkey"], m["n_name"], m["o_totalprice"]):
        st = spend[int(k)]
        st[0] = nat
        st[1] += _rnd(p * 100)
    return spend


def test_theil_matches_python(spark):
    from llmaix_spark.plans.queries import q_theil_decomposition

    row = q_theil_decomposition(spark, SF_DIR).collect()[0]

    spend = _cust_spend(SF_DIR)
    ys = [(nat, y) for nat, y in spend.values()]
    n = len(ys)
    s = sum(y for _, y in ys)
    t_total = sum(
        _rnd((y * n / s) * math.log(y * n / s) * 1e9) for _, y in ys
    ) / 1e9 / n
    grp = defaultdict(lambda: [0, 0])
    for nat, y in ys:
        grp[nat][0] += 1
        grp[nat][1] += y
    t_between = sum(
        _rnd(
            ng * (sg * n / (ng * s)) * math.log(sg * n / (ng * s)) * 1e9
        )
        for ng, sg in grp.values()
    ) / 1e9 / n
    assert abs(row["theil_total"] - t_total) < 1e-6
    assert abs(row["theil_between"] - t_between) < 1e-6


def test_friedman_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_friedman_test

    row = q_friedman_test(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e.assign(mo=e["ts"].dt.to_period("M"))
    cell = defaultdict(lambda: [0, 0])
    for mo, a, v in zip(e["mo"], e["event_type"], e["value"]):
        st = cell[(mo, a)]
        st[0] += _rnd(v * 100)
        st[1] += 1
    mos = sorted({m for m, _ in cell})
    rsum: Counter = Counter()
    for mo in mos:
        vals = sorted(
            (( _rnd(cell[(mo, a)][0] * 1e6 / cell[(mo, a)][1]), a))
            for a in {x for m_, x in cell if m_ == mo}
        )
        for r, (_, a) in enumerate(vals, start=1):
            rsum[a] += r
    k = len(rsum)
    n = len(mos)
    r2 = sum(v * v for v in rsum.values())
    chi2 = 12 * r2 / (n * k * (k + 1)) - 3 * n * (k + 1)
    assert (row["n_blocks"], row["k_treatments"]) == (n, k)
    assert abs(row["friedman_chi2"] - chi2) < 1e-5


def test_sprt_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_sprt_trajectory

    got = {r["month_idx"]: r for r in q_sprt_trajectory(spark, SF_DIR).collect()}

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o = o.assign(mo=o["o_orderdate"].dt.to_period("M"))
    l1 = _rnd(math.log(0.22 / 0.18) * 1e9)
    l0 = -_rnd(-math.log(0.78 / 0.82) * 1e9)
    llr = 0
    for i, (mo, g) in enumerate(sorted(o.groupby("mo"), key=lambda kv: kv[0]), start=1):
        n = len(g)
        u = (g["o_orderpriority"] == "1-URGENT").sum()
        llr += u * l1 + (n - u) * l0
        r = got[i]
        assert abs(r["llr"] - round(llr / 1e9, 6)) < 1e-9
        assert r["crossed_upper"] == (llr / 1e9 > math.log(19))
        assert r["crossed_lower"] == (llr / 1e9 < -math.log(19))


def test_gorilla_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_gorilla_compression

    row = q_gorilla_compression(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e.assign(
        us=e["ts"].astype("datetime64[ns]").astype("int64") // 1000,
        d=e["ts"].dt.date,
    )
    n_enc = 0
    total = 0
    for _, g in e.groupby("d"):
        seq = sorted(zip(g["us"].astype(int), g["event_id"].astype(int)))
        dts = [b[0] - a[0] for a, b in zip(seq, seq[1:])]
        for d1, d2 in zip(dts, dts[1:]):
            dod = d2 - d1
            n_enc += 1
            if dod == 0:
                total += 1
            elif abs(dod) < 64:
                total += 9
            elif abs(dod) < 512:
                total += 12
            elif abs(dod) < 4096:
                total += 16
            else:
                total += 36
    assert row["n_encoded"] == n_enc
    assert abs(row["avg_bits"] - total / n_enc) < 1e-6


def test_auction_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_auction_revenue

    row = q_auction_revenue(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    n_a = fp = sp = 0
    for _, g in li.groupby("l_orderkey"):
        bids = sorted(
            (_rnd(p * 100) for p in g["l_extendedprice"]), reverse=True
        )
        if len(bids) >= 2:
            n_a += 1
            fp += bids[0]
            sp += bids[1]
    assert row["n_auctions"] == n_a
    assert abs(row["first_price_total"] - fp / 100) < 1e-4
    assert abs(row["second_price_total"] - sp / 100) < 1e-4


def test_dft_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_dft_seasonality

    got = {r["period_days"]: r["power_share"] for r in q_dft_seasonality(spark, SF_DIR).collect()}

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    daily = sorted(Counter(o["o_orderdate"].dt.date).items())
    ys = [y for _, y in daily]
    n = len(ys)
    s = sum(ys)
    ss = sum(y * y for y in ys)
    var = ss / n - (s / n) ** 2
    for period in (7, 30, 91):
        yc = sum(
            _rnd(y * math.cos(2 * math.pi * t / period) * 1e6)
            for t, y in enumerate(ys)
        )
        ysn = sum(
            _rnd(y * math.sin(2 * math.pi * t / period) * 1e6)
            for t, y in enumerate(ys)
        )
        cc = sum(
            _rnd(math.cos(2 * math.pi * t / period) * 1e6)
            for t in range(n)
        )
        sc = sum(
            _rnd(math.sin(2 * math.pi * t / period) * 1e6)
            for t in range(n)
        )
        a = yc / 1e6 - (s / n) * (cc / 1e6)
        b = ysn / 1e6 - (s / n) * (sc / 1e6)
        share = 2 * (a * a + b * b) / (n * n * var)
        assert abs(got[period] - share) < 1e-5
