"""Plan pins, partition invariance, and python twins for the round-57
wave (Markov order test / median polish / safety stock / quantization
recall / C2ST drift / session hazard).
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


def test_markov_order_nonnegative(spark):
    from llmaix_spark.plans.queries import q_markov_order_test

    row = q_markov_order_test(spark, SF_DIR).collect()[0]
    # G² is a likelihood ratio: nonnegative up to term rounding
    assert row["g2"] >= -1e-6
    assert row["df"] == 16


def test_polish_reduces_residual(spark):
    from llmaix_spark.plans.queries import q_median_polish

    row = q_median_polish(spark, SF_DIR).collect()[0]
    assert row["abs_resid_polished"] <= row["abs_resid_meaned"]
    assert 0 <= row["resid_reduction"] <= 1


def test_safety_stock_nonnegative(spark):
    from llmaix_spark.plans.queries import q_safety_stock

    row = q_safety_stock(spark, SF_DIR).collect()[0]
    # p95 of a distribution sits above its mean for right-skewed
    # demand; at minimum the buffer is bounded sanely
    assert row["p95_7d_demand"] > 0
    assert row["safety_units"] > -row["mean_7d_demand"]


def test_quantization_recall_high(spark):
    """8-bit symmetric quantization of near-isotropic embeddings
    keeps most neighbors."""
    from llmaix_spark.plans.queries import q_quantization_recall

    row = q_quantization_recall(spark, SF_DIR).collect()[0]
    assert 0.8 <= row["recall_at_3"] <= 1
    assert row["n_perfect"] <= row["n_queries"]


def test_c2st_null_case(spark):
    """The fixture's value distribution is stationary: the classifier
    cannot beat the majority baseline by more than noise."""
    from llmaix_spark.plans.queries import q_c2st_drift

    row = q_c2st_drift(spark, SF_DIR).collect()[0]
    assert not row["drift_detected"]
    assert row["accuracy"] <= row["majority_share"] + 0.02 + 1e-9


def test_hazard_bounds(spark):
    from llmaix_spark.plans.queries import q_session_hazard

    rows = sorted(
        q_session_hazard(spark, SF_DIR).collect(), key=lambda r: r["k"]
    )
    assert [r["k"] for r in rows] == list(range(1, 11))
    # at-risk counts are non-increasing in k
    for a, b in zip(rows, rows[1:]):
        assert b["at_risk"] <= a["at_risk"]
    for r in rows:
        if r["hazard"] is not None:
            assert 0 <= r["hazard"] <= 1
        assert r["ended"] <= r["at_risk"]


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "markov_order_test",
        "median_polish",
        "safety_stock",
        "quantization_recall",
        "c2st_drift",
        "session_hazard",
    ],
)
def test_wave57_partition_invariance(spark, qname):
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


def test_markov_order_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_markov_order_test

    row = q_markov_order_test(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e.assign(
        us=e["ts"].astype("datetime64[ns]").astype("int64") // 1000
    ).sort_values(["user_id", "us", "event_id"])
    pairs: Counter = Counter()
    for _, g in e.groupby("user_id"):
        ts = list(g["event_type"])
        for a, b in zip(ts, ts[1:]):
            pairs[(a, b)] += 1
    ri: Counter = Counter()
    cj: Counter = Counter()
    for (a, b), n in pairs.items():
        ri[a] += n
        cj[b] += n
    t = sum(pairs.values())
    g2 = sum(
        _rnd(2 * n * math.log(n * t / (ri[a] * cj[b])) * 1e9)
        for (a, b), n in pairs.items()
    ) / 1e9
    assert abs(row["g2"] - g2) < 1e-6


def test_polish_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_median_polish

    row = q_median_polish(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cells: Counter = Counter()
    for d in o["o_orderdate"]:
        dw = d.dayofweek  # pandas: Monday=0
        # Spark dayofweek: Sunday=1..Saturday=7
        spark_dw = (d.dayofweek + 1) % 7 + 1
        cells[(spark_dw, d.month)] += 1
    grid = dict(cells)

    def lower_median(vals):
        s = sorted(vals)
        return s[(len(s) + 1) // 2 - 1]

    cur = dict(grid)
    for _ in range(2):
        for dw in {k[0] for k in cur}:
            med = lower_median([v for k, v in cur.items() if k[0] == dw])
            for k in list(cur):
                if k[0] == dw:
                    cur[k] -= med
        for mth in {k[1] for k in cur}:
            med = lower_median([v for k, v in cur.items() if k[1] == mth])
            for k in list(cur):
                if k[1] == mth:
                    cur[k] -= med
    fin = sum(abs(v) for v in cur.values())
    s = sum(grid.values())
    n = len(grid)
    gm = _rnd(s / n)
    base = sum(abs(v - gm) for v in grid.values())
    assert row["abs_resid_meaned"] == base
    assert row["abs_resid_polished"] == fin


def test_safety_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_safety_stock

    row = q_safety_stock(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    dem = defaultdict(int)
    for d, q in zip(li["l_shipdate"].dt.date, li["l_quantity"]):
        dem[d] += _rnd(q)
    days = sorted(dem)
    q7 = []
    for i in range(6, len(days)):
        q7.append(sum(dem[days[j]] for j in range(i - 6, i + 1)))
    n = len(q7)
    k = math.ceil(0.95 * n)
    p95 = sorted(q7)[k - 1]
    m7 = sum(q7) / n
    assert row["n_windows"] == n
    assert row["p95_7d_demand"] == p95
    assert abs(row["mean_7d_demand"] - m7) < 1e-6
    assert abs(row["safety_units"] - (p95 - m7)) < 1e-6


def test_hazard_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_session_hazard

    got = {r["k"]: r for r in q_session_hazard(spark, SF_DIR).collect()}

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e.assign(
        us=e["ts"].astype("datetime64[ns]").astype("int64") // 1000
    )
    lens = []
    for _, g in e.groupby("user_id"):
        seq = sorted(zip(g["us"].astype(int), g["event_id"].astype(int)))
        cur = 1
        for (t0, _), (t1, _) in zip(seq, seq[1:]):
            if t1 - t0 > 1_800_000_000:
                lens.append(cur)
                cur = 1
            else:
                cur += 1
        lens.append(cur)
    for k in range(1, 11):
        at_risk = sum(1 for l_ in lens if l_ >= k)
        ended = sum(1 for l_ in lens if l_ == k)
        g = got[k]
        assert (g["at_risk"], g["ended"]) == (at_risk, ended)
        if at_risk:
            assert abs(g["hazard"] - ended / at_risk) < 1e-6


def test_c2st_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_c2st_drift

    row = q_c2st_drift(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    us = e["ts"].astype("datetime64[ns]").astype("int64") // 1000
    mid = int((int(us.min()) + int(us.max())) / 2)
    xs = [min(_rnd(v * 100), 50000) / 50000.0 for v in e["value"]]
    ys = [1 if int(u) >= mid else 0 for u in us]

    def step(b0, b1):
        g0 = g1 = h00 = h01 = h11 = 0
        for x, y in zip(xs, ys):
            p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
            w = p * (1.0 - p)
            g0 += _rnd((y - p) * 1e9)
            g1 += _rnd((y - p) * x * 1e9)
            h00 += _rnd(w * 1e9)
            h01 += _rnd(w * x * 1e9)
            h11 += _rnd(w * x * x * 1e9)
        g0, g1, h00, h01, h11 = (v / 1e9 for v in (g0, g1, h00, h01, h11))
        det = h00 * h11 - h01 * h01
        return (
            round(b0 + (h11 * g0 - h01 * g1) / det, 9),
            round(b1 + (h00 * g1 - h01 * g0) / det, 9),
        )

    b0, b1 = step(0.0, 0.0)
    b0, b1 = step(b0, b1)
    correct = sum(
        1 for x, y in zip(xs, ys) if (1 if b0 + b1 * x > 0 else 0) == y
    )
    n = len(xs)
    assert row["n"] == n
    assert abs(row["beta1"] - round(b1, 6)) < 1e-9
    assert abs(row["accuracy"] - correct / n) < 1e-6
