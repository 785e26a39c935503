"""Plan pins, partition invariance, and python twins for the round-59
wave (Kruskal-Wallis / Jarque-Bera / McNemar / Hurst exponent /
average precision / t-closeness).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rnd(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


# ---------------------------------------------------------------------------
# structural properties


def test_kruskal_structure(spark):
    from llmaix_spark.plans.queries import q_kruskal_wallis

    row = q_kruskal_wallis(spark, SF_DIR).collect()[0]
    assert row["k_groups"] == 3
    assert row["df"] == 2
    assert row["h_statistic"] >= 0
    # tie correction divides by C <= 1, so corrected H >= raw H
    assert row["h_corrected"] >= row["h_statistic"]
    assert row["significant_05"] == (row["h_corrected"] > 5.991)


def test_jb_structure(spark):
    from llmaix_spark.plans.queries import q_jarque_bera

    row = q_jarque_bera(spark, SF_DIR).collect()[0]
    assert row["jb_statistic"] >= 0
    assert row["reject_normal_05"] == (row["jb_statistic"] > 5.991)


def test_mcnemar_structure(spark):
    from llmaix_spark.plans.queries import q_mcnemar_test

    row = q_mcnemar_test(spark, SF_DIR).collect()[0]
    assert row["chi2"] >= 0
    assert row["chi2_corrected"] >= 0
    # continuity correction shrinks the statistic when |b-c| >= 1
    if abs(row["b_only_x"] - row["c_only_y"]) >= 1:
        assert row["chi2_corrected"] <= row["chi2"] + 1e-9


def test_hurst_structure(spark):
    from llmaix_spark.plans.queries import q_hurst_exponent

    row = q_hurst_exponent(spark, SF_DIR).collect()[0]
    # R/S grows with block size; slope of a positive-increment series
    assert row["rs_8"] > 0
    assert row["rs_64"] > row["rs_8"]
    assert -0.5 < row["hurst"] < 1.5


def test_ap_bounds(spark):
    from llmaix_spark.plans.queries import q_average_precision

    rows = q_average_precision(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["avg_precision"] <= 1
        assert 0 <= r["p_at_10"] <= 1
        assert r["n_rel"] > 0


def test_tcloseness_bounds(spark):
    from llmaix_spark.plans.queries import q_t_closeness

    rows = q_t_closeness(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        # ordered EMD over (m-1)-normalized cumulative mass is in [0,1]
        assert 0 <= r["emd"] <= 1
        assert r["violates_t02"] == (r["emd"] > 0.2)


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "kruskal_wallis",
        "jarque_bera",
        "mcnemar_test",
        "hurst_exponent",
        "average_precision",
        "t_closeness",
    ],
)
def test_wave59_partition_invariance(spark, qname):
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


def test_kruskal_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_kruskal_wallis

    row = q_kruskal_wallis(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    vals = [
        (flag, _rnd(q))
        for flag, q in zip(li["l_returnflag"], li["l_quantity"])
    ]
    n = len(vals)
    totals = Counter(v for _, v in vals)
    # midrank of value v = (# strictly less) + (t_v + 1) / 2
    order = sorted(totals)
    less = {}
    run = 0
    for v in order:
        less[v] = run
        run += totals[v]
    rank_sums: dict[str, float] = defaultdict(float)
    counts: Counter = Counter()
    for flag, v in vals:
        rank_sums[flag] += less[v] + (totals[v] + 1) / 2.0
        counts[flag] += 1
    h = 12.0 / (n * (n + 1)) * sum(
        rank_sums[g] ** 2 / counts[g] for g in rank_sums
    ) - 3 * (n + 1)
    c_corr = 1.0 - sum(t**3 - t for t in totals.values()) / (n**3 - n)
    assert row["n_all"] == n
    assert abs(row["h_statistic"] - h) < 1e-3
    assert abs(row["h_corrected"] - h / c_corr) < 1e-3


def test_jb_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_jarque_bera

    row = q_jarque_bera(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    xs = [_rnd(p * 100) / 1e5 for p in o["o_totalprice"]]
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum((x - mu) ** 2 for x in xs) / n
    m3 = sum((x - mu) ** 3 for x in xs) / n
    m4 = sum((x - mu) ** 4 for x in xs) / n
    skew = m3 / (m2 * math.sqrt(m2))
    kurtx = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (skew**2 + kurtx**2 / 4.0)
    assert row["n"] == n
    assert abs(row["skewness"] - skew) < 1e-3
    assert abs(row["excess_kurtosis"] - kurtx) < 1e-3
    assert abs(row["jb_statistic"] - jb) / max(jb, 1.0) < 1e-3


def test_mcnemar_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_mcnemar_test

    row = q_mcnemar_test(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    x: dict[int, int] = defaultdict(int)
    y: dict[int, int] = defaultdict(int)
    for k, pr, st in zip(
        o["o_custkey"], o["o_orderpriority"], o["o_orderstatus"]
    ):
        k = int(k)
        x[k] = max(x[k], int(pr == "1-URGENT"))
        y[k] = max(y[k], int(st == "F"))
    b = sum(1 for k in x if x[k] == 1 and y[k] == 0)
    c = sum(1 for k in x if x[k] == 0 and y[k] == 1)
    assert row["b_only_x"] == b
    assert row["c_only_y"] == c
    exp = (abs(b - c) - 1.0) ** 2 / (b + c)
    assert abs(row["chi2_corrected"] - exp) < 1e-6


def test_hurst_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_hurst_exponent

    row = q_hurst_exponent(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    per_day = Counter(d.date() for d in o["o_orderdate"])
    series = [per_day[d] for d in sorted(per_day)]
    t = len(series)
    assert row["t_days"] == t
    ys = {}
    for m in (8, 16, 32, 64):
        rss = []
        for b in range(t // m):
            blk = series[b * m : (b + 1) * m]
            mu = sum(blk) / m
            cum = 0.0
            zs = []
            for v in blk:
                cum += v - mu
                zs.append(cum)
            r = max(zs) - min(zs)
            s2 = sum((v - mu) ** 2 for v in blk) / m
            if s2 > 0:
                rss.append(r / math.sqrt(s2))
        ys[m] = sum(rss) / len(rss)
        assert abs(row[f"rs_{m}"] - ys[m]) < 1e-3
    xs = {8: 3, 16: 4, 32: 5, 64: 6}
    sxy = sum(xs[m] * math.log2(ys[m]) for m in ys)
    sy = sum(math.log2(ys[m]) for m in ys)
    slope = (4 * sxy - 18 * sy) / 20.0
    assert abs(row["hurst"] - slope) < 1e-3


def test_ap_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_average_precision

    rows = {
        r["source"]: r for r in q_average_precision(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    by_src: dict[str, list] = defaultdict(list)
    for did, src, nc in zip(d["doc_id"], d["source"], d["n_chars"]):
        rel = _hash60(f"{int(did)}:rel") % 4 >= 2
        by_src[src].append((-int(nc), int(did), rel))
    for src, docs in by_src.items():
        docs.sort()
        cum = 0
        terms = []
        for k, (_, _, rel) in enumerate(docs, start=1):
            if rel:
                cum += 1
                terms.append(cum / k)
        ap = sum(terms) / cum
        assert abs(rows[src]["avg_precision"] - ap) < 1e-6
        assert rows[src]["n_rel"] == cum


def test_tcloseness_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_t_closeness

    rows = {
        (r["c_mktsegment"], r["nation_bucket"]): r
        for r in q_t_closeness(spark, SF_DIR).collect()
    }

    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    cells: Counter = Counter()
    for seg, nk, bal in zip(
        c["c_mktsegment"], c["c_nationkey"], c["c_acctbal"]
    ):
        band = int(math.floor((bal + 1000.0) / 2000.0))
        cells[(seg, int(nk) % 5, band)] += 1
    bands = sorted({b for _, _, b in cells})
    n_all = sum(cells.values())
    q = {b: sum(v for (s, nb, bb), v in cells.items() if bb == b) / n_all
         for b in bands}
    groups = {(s, nb) for s, nb, _ in cells}
    for g in groups:
        n_grp = sum(v for (s, nb, _), v in cells.items() if (s, nb) == g)
        cum = 0.0
        acc = 0.0
        for b in bands:
            p = cells.get((g[0], g[1], b), 0) / n_grp
            cum += p - q[b]
            acc += abs(cum)
        emd = acc / (len(bands) - 1)
        assert abs(rows[g]["emd"] - emd) < 1e-6
        assert rows[g]["group_size"] == n_grp
