"""Plan pins, partition invariance, and python twins for the round-60
wave (Ljung-Box / IV-Wald / RDD / spectral entropy / ERR /
Syntetos-Boylan).
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


def test_ljung_box_structure(spark):
    from llmaix_spark.plans.queries import q_ljung_box

    row = q_ljung_box(spark, SF_DIR).collect()[0]
    assert row["q_stat"] >= 0
    assert row["df"] == 7
    assert -1 <= row["rho_1"] <= 1
    assert row["white_noise_rejected_05"] == (row["q_stat"] > 14.067)


def test_iv_wald_structure(spark):
    from llmaix_spark.plans.queries import q_iv_wald

    row = q_iv_wald(spark, SF_DIR).collect()[0]
    assert row["n0"] > 0 and row["n1"] > 0
    assert -1 <= row["first_stage"] <= 1
    # Wald = ITT / first-stage by construction; both sides are rounded
    # to 6dp, and a weak instrument (tiny first stage) amplifies that
    # rounding in the ratio — scale the tolerance accordingly
    fs = row["first_stage"]
    tol = (1.0 + abs(row["wald_late_kusd"])) * 2e-6 / abs(fs)
    assert abs(row["wald_late_kusd"] - row["itt_kusd"] / fs) < tol


def test_rdd_structure(spark):
    from llmaix_spark.plans.queries import q_rdd_estimator

    row = q_rdd_estimator(spark, SF_DIR).collect()[0]
    assert row["n_left"] > 0 and row["n_right"] > 0
    assert abs(
        row["rdd_effect_usd"]
        - (row["right_intercept_usd"] - row["left_intercept_usd"])
    ) < 1e-3


def test_spectral_entropy_bounds(spark):
    from llmaix_spark.plans.queries import q_spectral_entropy

    row = q_spectral_entropy(spark, SF_DIR).collect()[0]
    assert 0 <= row["spectral_entropy"] <= 1.0 + 1e-9
    assert 1 <= row["peak_k"] <= 32
    assert 0 < row["peak_share"] <= 1


def test_err_bounds(spark):
    from llmaix_spark.plans.queries import q_err_ranking

    rows = q_err_ranking(spark, SF_DIR).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["err_at_10"] <= r["err"] + 1e-9
        assert r["err"] <= 1


def test_sb_quadrants(spark):
    from llmaix_spark.plans.queries import q_syntetos_boylan

    rows = q_syntetos_boylan(spark, SF_DIR).collect()
    seen = {r["demand_class"] for r in rows}
    assert seen <= {"smooth", "intermittent", "erratic", "lumpy"}
    for r in rows:
        assert r["mean_adi"] >= 1.0 - 1e-9
        assert r["mean_cv2"] >= 0
        if r["demand_class"] == "smooth":
            assert r["mean_adi"] < 1.32 and r["mean_cv2"] < 0.49


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "ljung_box",
        "iv_wald",
        "rdd_estimator",
        "spectral_entropy",
        "err_ranking",
        "syntetos_boylan",
    ],
)
def test_wave60_partition_invariance(spark, qname):
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


def _daily_counts():
    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    per_day = Counter(d.date() for d in o["o_orderdate"])
    return [per_day[d] for d in sorted(per_day)]


def test_ljung_box_matches_python(spark):
    from llmaix_spark.plans.queries import q_ljung_box

    row = q_ljung_box(spark, SF_DIR).collect()[0]

    xs = _daily_counts()
    n = len(xs)
    mu = sum(xs) / n
    den = sum((x - mu) ** 2 for x in xs)
    q = 0.0
    for k in range(1, 8):
        num = sum(
            (xs[t] - mu) * (xs[t + k] - mu) for t in range(n - k)
        )
        rho = num / den
        q += rho * rho / (n - k)
        if k == 1:
            assert abs(row["rho_1"] - rho) < 1e-4
    q *= n * (n + 2)
    assert row["n_days"] == n
    assert abs(row["q_stat"] - q) / max(q, 1.0) < 1e-3


def test_iv_wald_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_iv_wald

    row = q_iv_wald(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    spend: dict[int, int] = defaultdict(int)
    treated: dict[int, int] = defaultdict(int)
    for k, pr, p in zip(
        o["o_custkey"], o["o_orderpriority"], o["o_totalprice"]
    ):
        k = int(k)
        spend[k] += _rnd(p * 100)
        treated[k] = max(treated[k], int(pr == "1-URGENT"))
    arms: dict[int, list] = {0: [0, 0, 0], 1: [0, 0, 0]}
    for k in spend:
        z = _hash60(f"{k}:iv") % 2
        arms[z][0] += 1
        arms[z][1] += spend[k]
        arms[z][2] += treated[k]
    y0 = arms[0][1] / arms[0][0] / 1e5
    y1 = arms[1][1] / arms[1][0] / 1e5
    d0 = arms[0][2] / arms[0][0]
    d1 = arms[1][2] / arms[1][0]
    assert row["n0"] == arms[0][0] and row["n1"] == arms[1][0]
    assert abs(row["itt_kusd"] - (y1 - y0)) < 1e-4
    assert abs(row["wald_late_kusd"] - (y1 - y0) / (d1 - d0)) < 1e-3


def test_rdd_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_rdd_estimator

    row = q_rdd_estimator(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    spend: dict[int, int] = defaultdict(int)
    for k, p in zip(o["o_custkey"], o["o_totalprice"]):
        spend[int(k)] += _rnd(p * 100)
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    sides: dict[str, list] = {"L": [], "R": []}
    for k, bal in zip(c["c_custkey"], c["c_acctbal"]):
        x = _rnd(bal * 100) - 500000
        if -200000 <= x <= 200000:
            sides["L" if x < 0 else "R"].append(
                (x, spend.get(int(k), 0))
            )
    b0 = {}
    for s, pts in sides.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        b0[s] = (sy - slope * sx) / n
    eff = (b0["R"] - b0["L"]) / 100.0
    assert row["n_left"] == len(sides["L"])
    assert row["n_right"] == len(sides["R"])
    assert abs(row["rdd_effect_usd"] - eff) < 0.01


def test_spectral_entropy_matches_python(spark):
    from llmaix_spark.plans.queries import q_spectral_entropy

    row = q_spectral_entropy(spark, SF_DIR).collect()[0]

    xs = _daily_counts()
    n = len(xs)
    mu = sum(xs) / n
    powers = {}
    for k in range(1, 33):
        a = sum(
            (x - mu) * math.cos(2 * math.pi * k * t / n)
            for t, x in enumerate(xs)
        )
        b = sum(
            (x - mu) * math.sin(2 * math.pi * k * t / n)
            for t, x in enumerate(xs)
        )
        powers[k] = a * a + b * b
    ptot = sum(powers.values())
    ent = -sum(
        (p / ptot) * math.log(p / ptot)
        for p in powers.values()
        if p > 0
    ) / math.log(32.0)
    peak = max(powers, key=lambda k: (powers[k], -k))
    assert row["n_days"] == n
    assert abs(row["spectral_entropy"] - ent) < 1e-3
    assert row["peak_k"] == peak
    assert abs(row["peak_share"] - powers[peak] / ptot) < 1e-3


def test_err_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_err_ranking

    rows = {
        r["source"]: r for r in q_err_ranking(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    by_src: dict[str, list] = defaultdict(list)
    rmap = {0: 0.0, 1: 0.125, 2: 0.375, 3: 0.875}
    for did, src, nc in zip(d["doc_id"], d["source"], d["n_chars"]):
        g = _hash60(f"{int(did)}:grade") % 4
        by_src[src].append((-int(nc), int(did), rmap[g]))
    for src, docs in by_src.items():
        docs.sort()
        keep = 1.0
        err = 0.0
        err10 = 0.0
        for k, (_, _, rr) in enumerate(docs, start=1):
            term = rr / k * keep
            err += term
            if k <= 10:
                err10 += term
            keep *= 1.0 - rr
        assert abs(rows[src]["err"] - err) < 1e-5
        assert abs(rows[src]["err_at_10"] - err10) < 1e-5


def test_sb_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_syntetos_boylan

    rows = {
        r["demand_class"]: r
        for r in q_syntetos_boylan(spark, SF_DIR).collect()
    }

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
    agg: dict[str, list] = defaultdict(lambda: [0, 0.0, 0.0])
    for pk, qs in per.items():
        k = len(qs)
        s = sum(qs)
        ss = sum(q * q for q in qs)
        adi = tm / k
        cv2 = (k * ss - s * s) / (s * s)
        if adi < 1.32 and cv2 < 0.49:
            c = "smooth"
        elif adi >= 1.32 and cv2 < 0.49:
            c = "intermittent"
        elif adi < 1.32 and cv2 >= 0.49:
            c = "erratic"
        else:
            c = "lumpy"
        agg[c][0] += 1
        agg[c][1] += adi
        agg[c][2] += cv2
    assert set(rows) == set(agg)
    for c, (n, sa, sc) in agg.items():
        assert rows[c]["n_parts"] == n
        assert abs(rows[c]["mean_adi"] - sa / n) < 1e-4
        assert abs(rows[c]["mean_cv2"] - sc / n) < 1e-4
