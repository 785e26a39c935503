"""Plan pins, partition invariance, and python twins for the round-58
wave (capture-recapture / word adaptation / DOW homogeneity / cluster
design effect / extremal index / Brown-Forsythe).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().strip().split(" ") if t]


# ---------------------------------------------------------------------------
# structural properties


def test_capture_estimates_sane(spark):
    from llmaix_spark.plans.queries import q_capture_recapture

    row = q_capture_recapture(spark, SF_DIR).collect()[0]
    assert row["overlap"] <= min(row["n1"], row["n2"])
    # Chapman is finite and in a plausible band around the truth
    # NOTE: the two sightings are positively correlated (big spenders
    # order more), so the estimate is biased LOW — it still must be
    # at least the observed union
    union = row["n1"] + row["n2"] - row["overlap"]
    assert row["chapman"] >= union - 1
    assert row["chapman_rel_err"] < 1


def test_adaptation_bursty(spark):
    """Real text repeats words beyond Poisson — every top word's
    adaptation ratio should exceed ~1 or sit near it, never crash."""
    from llmaix_spark.plans.queries import q_word_adaptation

    rows = q_word_adaptation(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["p_repeat"] <= 1
        assert 0 < r["poisson_expected"] < 1
        assert r["adaptation_ratio"] > 0


def test_dow_chi2_nonnegative(spark):
    from llmaix_spark.plans.queries import q_dow_homogeneity

    row = q_dow_homogeneity(spark, SF_DIR).collect()[0]
    assert row["chi2"] >= 0
    assert row["df"] == 18
    assert row["heterogeneous_05"] == (row["chi2"] > 28.869)


def test_deff_bounds(spark):
    from llmaix_spark.plans.queries import q_cluster_design_effect

    row = q_cluster_design_effect(spark, SF_DIR).collect()[0]
    assert row["n_clusters"] <= row["n_orders"]
    assert -1 <= row["icc"] <= 1
    assert row["deff"] > 0
    # DEFF ≈ 1 + (m0-1)·ICC by construction
    assert abs(row["deff"] - (1 + (row["m0"] - 1) * row["icc"])) < 1e-4


def test_extremal_index_bounds(spark):
    from llmaix_spark.plans.queries import q_extremal_index

    row = q_extremal_index(spark, SF_DIR).collect()[0]
    assert row["n_clusters"] <= row["n_exceed"]
    assert 0 < row["extremal_index"] <= 1


def test_bf_nonnegative(spark):
    from llmaix_spark.plans.queries import q_brown_forsythe

    row = q_brown_forsythe(spark, SF_DIR).collect()[0]
    assert row["bf_statistic"] >= 0
    assert row["variance_differs_05"] == (row["bf_statistic"] > 3.841)


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "capture_recapture",
        "word_adaptation",
        "dow_homogeneity",
        "cluster_design_effect",
        "extremal_index",
        "brown_forsythe",
    ],
)
def test_wave58_partition_invariance(spark, qname):
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


def test_capture_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_capture_recapture

    row = q_capture_recapture(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    s1 = set()
    s2 = set()
    allc = set()
    for k, pr, p in zip(o["o_custkey"], o["o_orderpriority"], o["o_totalprice"]):
        k = int(k)
        allc.add(k)
        if pr == "1-URGENT":
            s1.add(k)
        if _rnd(p * 100) >= 15_000_000:
            s2.add(k)
    m = len(s1 & s2)
    assert (row["n1"], row["n2"], row["overlap"]) == (len(s1), len(s2), m)
    assert row["true_n"] == len(allc)
    assert abs(row["lincoln_petersen"] - len(s1) * len(s2) / m) < 1e-4
    assert abs(
        row["chapman"] - ((len(s1) + 1) * (len(s2) + 1) / (m + 1) - 1)
    ) < 1e-4


def test_adaptation_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_word_adaptation

    got = {r["w"]: r for r in q_word_adaptation(spark, SF_DIR).collect()}

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    per: Counter = Counter()
    df1: Counter = Counter()
    df2: Counter = Counter()
    for r in d.itertuples():
        c = Counter(_tokens(r.text))
        for w, n in c.items():
            per[w] += n
            df1[w] += 1
            if n >= 2:
                df2[w] += 1
    nd = len(d)
    top = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    for w, tot in top:
        lam = tot / nd
        pois = (1 - math.exp(-lam) - lam * math.exp(-lam)) / (
            1 - math.exp(-lam)
        )
        g = got[w]
        assert (g["tot"], g["df1"], g["df2"]) == (tot, df1[w], df2[w])
        assert abs(g["p_repeat"] - df2[w] / df1[w]) < 1e-6
        assert abs(g["poisson_expected"] - pois) < 1e-6


def test_dow_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_dow_homogeneity

    row = q_dow_homogeneity(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cells: Counter = Counter()
    for d in o["o_orderdate"]:
        dw = (d.dayofweek + 1) % 7 + 1  # Spark convention
        cells[(dw, (d.month - 1) // 3 + 1)] += 1
    rt: Counter = Counter()
    ct: Counter = Counter()
    for (dw, qt), n in cells.items():
        rt[dw] += n
        ct[qt] += n
    t = sum(cells.values())
    chi2 = sum(
        _rnd((n - rt[dw] * ct[qt] / t) ** 2 / (rt[dw] * ct[qt] / t) * 1e9)
        for (dw, qt), n in cells.items()
    ) / 1e9
    assert abs(row["chi2"] - chi2) < 1e-6


def test_deff_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_cluster_design_effect

    row = q_cluster_design_effect(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cl = defaultdict(lambda: [0, 0])
    for k, p in zip(o["o_custkey"], o["o_totalprice"]):
        st = cl[int(k)]
        st[0] += 1
        st[1] += _rnd(p * 100)
    k = len(cl)
    n = sum(m for m, _ in cl.values())
    m2 = sum(m * m for m, _ in cl.values())
    bs_u = sum(_rnd(s * (s / m) / 1e4) for m, s in cl.values())
    ts = sum(s for _, s in cl.values())
    tss = sum(
        _rnd(p * 100) ** 2
        for p in o["o_totalprice"]
    )
    ssb = bs_u * 1e4 - ts * (ts / n)
    ssw = tss - bs_u * 1e4
    msb = ssb / (k - 1)
    msw = ssw / (n - k)
    m0 = (n - m2 / n) / (k - 1)
    icc = (msb - msw) / (msb + (m0 - 1) * msw)
    assert (row["n_clusters"], row["n_orders"]) == (k, n)
    assert abs(row["m0"] - m0) < 1e-4
    assert abs(row["icc"] - icc) < 1e-5
    assert abs(row["deff"] - (1 + (m0 - 1) * icc)) < 1e-4


def test_extremal_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_extremal_index

    row = q_extremal_index(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    daily = sorted(Counter(o["o_orderdate"].dt.date).items())
    n = len(daily)
    k = math.ceil(0.95 * n)
    u = sorted(y for _, y in daily)[k - 1]
    exc = [d for d, y in daily if y > u]
    clusters = sum(
        1
        for i, d in enumerate(exc)
        if i == 0 or (d - exc[i - 1]).days > 2
    )
    assert row["threshold"] == u
    assert row["n_exceed"] == len(exc)
    assert row["n_clusters"] == clusters


def test_bf_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_brown_forsythe

    row = q_brown_forsythe(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    daily = defaultdict(int)
    for d in o["o_orderdate"]:
        daily[d.date()] += 1
    groups = {0: [], 1: []}
    for d, y in sorted(daily.items()):
        spark_dw = (pd.Timestamp(d).dayofweek + 1) % 7 + 1
        groups[1 if spark_dw in (1, 7) else 0].append((y, d))

    def lower_median(pairs):
        s = sorted(pairs)
        return s[(len(s) + 1) // 2 - 1][0]

    zs = {}
    for g, pairs in groups.items():
        med = lower_median(pairs)
        zs[g] = [abs(y - med) for y, _ in pairs]
    n = sum(len(v) for v in zs.values())
    ts = sum(sum(v) for v in zs.values())
    bsum = sum(_rnd(sum(v) * (sum(v) / len(v))) for v in zs.values())
    tss = sum(sum(x * x for x in v) for v in zs.values())
    ssb = bsum - ts * (ts / n)
    ssw = tss - bsum
    f = (ssb / 1) / (ssw / (n - 2))
    assert row["n_days"] == n
    assert abs(row["bf_statistic"] - f) < 1e-4
