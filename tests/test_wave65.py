"""Plan pins, partition invariance, and python twins for the round-65
wave (Fleiss kappa / Gumbel fit / Pettitt / Tukey HSD / Mood median /
Bowker symmetry).
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


def _daily():
    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    per_day = Counter(d.date() for d in o["o_orderdate"])
    return [(d, per_day[d]) for d in sorted(per_day)]


# ---------------------------------------------------------------------------
# structural properties


def test_fleiss_structure(spark):
    from llmaix_spark.plans.queries import q_fleiss_kappa

    row = q_fleiss_kappa(spark, SF_DIR).collect()[0]
    assert 0 < row["p_observed"] <= 1
    assert 0 < row["p_expected"] < 1
    assert row["fleiss_kappa"] <= 1
    k = (row["p_observed"] - row["p_expected"]) / (
        1 - row["p_expected"]
    )
    assert abs(row["fleiss_kappa"] - k) < 1e-4


def test_gumbel_structure(spark):
    from llmaix_spark.plans.queries import q_gumbel_fit

    row = q_gumbel_fit(spark, SF_DIR).collect()[0]
    assert row["n_months"] >= 60
    assert row["gumbel_scale"] > 0
    assert row["gumbel_loc"] > 0
    assert 0 <= row["r2"] <= 1


def test_pettitt_structure(spark):
    from llmaix_spark.plans.queries import q_pettitt_test

    row = q_pettitt_test(spark, SF_DIR).collect()[0]
    assert row["k_stat"] >= 0
    assert 0 <= row["p_approx"] <= 2
    assert row["changepoint_05"] == (row["p_approx"] < 0.05)


def test_tukey_structure(spark):
    from llmaix_spark.plans.queries import q_tukey_hsd

    rows = q_tukey_hsd(spark, SF_DIR).collect()
    assert len(rows) == 10
    assert [(r["g1"], r["g2"]) for r in rows] == [
        (i, j) for i in range(1, 6) for j in range(i + 1, 6)
    ]
    for r in rows:
        assert r["q_stat"] >= 0
        assert r["significant_05"] == (r["q_stat"] > 3.858)


def test_mood_structure(spark):
    from llmaix_spark.plans.queries import q_mood_median

    row = q_mood_median(spark, SF_DIR).collect()[0]
    assert 1 <= row["grand_median_qty"] <= 50
    assert row["chi2_stat"] >= 0
    assert row["df"] == 4


def test_bowker_structure(spark):
    from llmaix_spark.plans.queries import q_bowker_symmetry

    row = q_bowker_symmetry(spark, SF_DIR).collect()[0]
    # 5 event types -> at most 10 unordered off-diagonal cells
    assert 1 <= row["df"] <= 10
    assert row["chi2_stat"] >= 0


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "fleiss_kappa",
        "gumbel_fit",
        "pettitt_test",
        "tukey_hsd",
        "mood_median",
        "bowker_symmetry",
    ],
)
def test_wave65_partition_invariance(spark, qname):
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


def test_fleiss_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_fleiss_kappa

    row = q_fleiss_kappa(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    units = []
    for did, lang in zip(d["doc_id"], d["lang"]):
        did = int(did)
        ha, hb = _h(f"{did}:kra"), _h(f"{did}:krb")
        if hb % 7 == 0:
            continue
        units.append(
            [
                lang,
                "zz" if ha % 5 == 0 else lang,
                "yy" if hb % 11 == 0 else lang,
            ]
        )
    n = len(units)
    cls: Counter = Counter()
    psum = 0.0
    for vals in units:
        cnt = Counter(vals)
        cls.update(cnt)
        psum += (sum(c * c for c in cnt.values()) - 3) / 6
    pbar = psum / n
    pe = sum(c * c for c in cls.values()) / (9 * n * n)
    kappa = (pbar - pe) / (1 - pe)
    assert row["n_units"] == n
    assert abs(row["p_observed"] - pbar) < 1e-5
    assert abs(row["fleiss_kappa"] - kappa) < 1e-4


def test_gumbel_matches_python(spark):
    from llmaix_spark.plans.queries import q_gumbel_fit

    row = q_gumbel_fit(spark, SF_DIR).collect()[0]

    bym: dict[int, int] = defaultdict(int)
    for d, c in _daily():
        mi = d.year * 12 + d.month
        bym[mi] = max(bym[mi], c)
    mx = sorted((v, mi) for mi, v in bym.items())
    n = len(mx)
    xs = [-math.log(-math.log(i / (n + 1))) for i in range(1, n + 1)]
    ys = [float(v) for v, _ in mx]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    mu = (sy - beta * sx) / n
    assert row["n_months"] == n
    assert abs(row["gumbel_scale"] - beta) < 0.05
    assert abs(row["gumbel_loc"] - mu) < 0.05


def test_pettitt_matches_python(spark):
    from llmaix_spark.plans.queries import q_pettitt_test

    row = q_pettitt_test(spark, SF_DIR).collect()[0]

    days = _daily()
    ys = [c for _, c in days]
    n = len(ys)
    u = 0
    best = (-1, None)
    for t in range(n):
        v = sum(
            1 if ys[t] > ys[j] else (-1 if ys[t] < ys[j] else 0)
            for j in range(n)
        )
        u += v
        if abs(u) > best[0]:
            best = (abs(u), days[t][0])
    k = best[0]
    p = 2 * math.exp(-6 * k * k / (n**3 + n**2))
    assert row["n_days"] == n
    assert row["k_stat"] == k
    assert row["change_date"] == best[1]
    assert abs(row["p_approx"] - p) < 1e-5


def test_tukey_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_tukey_hsd

    rows = {
        (r["g1"], r["g2"]): r
        for r in q_tukey_hsd(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    grp: dict[int, list] = defaultdict(list)
    for pr, p in zip(o["o_orderpriority"], o["o_totalprice"]):
        grp[int(pr[0])].append(_rnd(p * 100))
    means = {g: sum(v) / len(v) for g, v in grp.items()}
    nn = sum(len(v) for v in grp.values())
    sq = sum(
        sum((x - means[g]) ** 2 for x in v) for g, v in grp.items()
    )
    mse = sq / (nn - 5)
    for i in range(1, 6):
        for j in range(i + 1, 6):
            q = abs(means[i] - means[j]) / math.sqrt(
                mse / 2 * (1 / len(grp[i]) + 1 / len(grp[j]))
            )
            r = rows[(i, j)]
            assert abs(r["q_stat"] - q) < 1e-3
            assert (
                abs(r["mean_diff_usd"] - (means[i] - means[j]) / 100)
                < 0.02
            )


def test_mood_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_mood_median

    row = q_mood_median(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    pri = {
        int(k): int(p[0])
        for k, p in zip(o["o_orderkey"], o["o_orderpriority"])
    }
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    pts = [
        (pri[int(k)], _rnd(q))
        for k, q in zip(li["l_orderkey"], li["l_quantity"])
    ]
    vals = sorted(q for _, q in pts)
    n = len(vals)
    # smallest q whose cumulative count covers half the data
    cum = Counter(vals)
    run = 0
    med = None
    for q in sorted(cum):
        run += cum[q]
        if run * 2 >= n:
            med = q
            break
    above: Counter = Counter()
    below: Counter = Counter()
    for s, q in pts:
        if q > med:
            above[s] += 1
        else:
            below[s] += 1
    ta, tb = sum(above.values()), sum(below.values())
    chi2 = 0.0
    for s in range(1, 6):
        ni = above[s] + below[s]
        ea = ni * ta / (ta + tb)
        eb = ni * tb / (ta + tb)
        chi2 += (above[s] - ea) ** 2 / ea + (below[s] - eb) ** 2 / eb
    assert row["grand_median_qty"] == med
    assert abs(row["chi2_stat"] - chi2) < 1e-3


def test_bowker_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_bowker_symmetry

    row = q_bowker_symmetry(spark, SF_DIR).collect()[0]

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    tr: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        types = list(g["event_type"])
        for i in range(1, len(types)):
            if types[i - 1] != types[i]:
                tr[(types[i - 1], types[i])] += 1
    seen = set()
    chi2 = 0.0
    df = 0
    for (a, b) in list(tr) + [(b, a) for a, b in tr]:
        i, j = min(a, b), max(a, b)
        if (i, j) in seen:
            continue
        seen.add((i, j))
        nij, nji = tr.get((i, j), 0), tr.get((j, i), 0)
        df += 1
        chi2 += (nij - nji) ** 2 / (nij + nji)
    assert row["df"] == df
    assert abs(row["chi2_stat"] - chi2) < 1e-3
