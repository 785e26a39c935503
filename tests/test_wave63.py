"""Plan pins, partition invariance, and python twins for the round-63
wave (Hill tail index / Allan variance / sample entropy / Lorenz
asymmetry / Page trend / Theil's U).
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
    return [per_day[d] for d in sorted(per_day)]


# ---------------------------------------------------------------------------
# structural properties


def test_hill_structure(spark):
    from llmaix_spark.plans.queries import q_hill_tail_index

    row = q_hill_tail_index(spark, SF_DIR).collect()[0]
    assert row["k"] == 200
    assert row["hill_alpha"] > 0
    assert row["xmin_usd"] > 0
    # alpha = 1 / mean-log-excess by construction
    assert (
        abs(row["hill_alpha"] * row["hill_mean_log_excess"] - 1.0) < 1e-3
    )


def test_allan_structure(spark):
    from llmaix_spark.plans.queries import q_allan_variance

    rows = q_allan_variance(spark, SF_DIR).collect()
    assert [r["tau"] for r in rows] == [1, 2, 4]
    for r in rows:
        assert r["allan_var"] > 0
    # block counts halve (to within truncation) as tau doubles
    assert rows[0]["m_blocks"] >= 2 * rows[1]["m_blocks"] - 2
    assert rows[1]["m_blocks"] >= 2 * rows[2]["m_blocks"] - 2


def test_sampen_structure(spark):
    from llmaix_spark.plans.queries import q_sample_entropy

    row = q_sample_entropy(spark, SF_DIR).collect()[0]
    # A-matches are a subset of B-matches, so SampEn >= 0
    assert 0 < row["a_count"] <= row["b_count"]
    assert row["sampen"] >= 0


def test_lorenz_asym_structure(spark):
    from llmaix_spark.plans.queries import q_lorenz_asymmetry

    row = q_lorenz_asymmetry(spark, SF_DIR).collect()[0]
    assert 0 < row["f_mu"] < 1
    assert 0 < row["l_mu"] < 1
    # by definition the below-mean group holds less than its head-count
    # share of revenue
    assert row["l_mu"] < row["f_mu"]
    assert abs(
        row["lorenz_asymmetry"] - (row["f_mu"] + row["l_mu"])
    ) < 2e-6


def test_page_structure(spark):
    from llmaix_spark.plans.queries import q_page_trend_test

    row = q_page_trend_test(spark, SF_DIR).collect()[0]
    assert row["n_years"] >= 5
    # sum of doubled rank*month over one block is bounded by the
    # perfectly ordered arrangement
    n, k = row["n_years"], 12
    lmax = 2 * n * sum(m * m for m in range(1, 13))
    lmin = 2 * n * sum(m * (13 - m) for m in range(1, 13))
    assert lmin <= row["l2"] <= lmax
    assert row["increasing_trend_05"] == (row["z_stat"] > 1.645)


def test_theils_u_structure(spark):
    from llmaix_spark.plans.queries import q_theils_u

    row = q_theils_u(spark, SF_DIR).collect()[0]
    for c in (
        "u_status_given_priority",
        "u_priority_given_status",
        "u_symmetric",
    ):
        assert -1e-6 <= row[c] <= 1
    assert row["h_status"] > 0 and row["h_priority"] > 0


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "hill_tail_index",
        "allan_variance",
        "sample_entropy",
        "lorenz_asymmetry",
        "page_trend_test",
        "theils_u",
    ],
)
def test_wave63_partition_invariance(spark, qname):
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


def test_hill_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_hill_tail_index

    row = q_hill_tail_index(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    vals = sorted(
        (
            (-_rnd(p * 100), int(k))
            for k, p in zip(o["o_orderkey"], o["o_totalprice"])
        ),
    )
    top = [-v for v, _ in vals[:201]]
    h = sum(math.log(x) - math.log(top[200]) for x in top[:200]) / 200
    assert abs(row["xmin_usd"] - top[200] / 100.0) < 0.005
    assert abs(row["hill_mean_log_excess"] - h) < 1e-4
    assert abs(row["hill_alpha"] - 1.0 / h) < 1e-2


def test_allan_matches_python(spark):
    from llmaix_spark.plans.queries import q_allan_variance

    rows = {r["tau"]: r for r in q_allan_variance(spark, SF_DIR).collect()}

    ys = _daily_counts()
    for tau in (1, 2, 4):
        nb = len(ys) // tau
        means = [
            sum(ys[i * tau : (i + 1) * tau]) / tau for i in range(nb)
        ]
        avar = sum(
            (means[i + 1] - means[i]) ** 2 for i in range(nb - 1)
        ) / (2 * (nb - 1))
        assert rows[tau]["m_blocks"] == nb
        assert abs(rows[tau]["allan_var"] - avar) < 1e-4


def test_sampen_matches_python(spark):
    from llmaix_spark.plans.queries import q_sample_entropy

    row = q_sample_entropy(spark, SF_DIR).collect()[0]

    ys = _daily_counts()
    tmpl = [
        (ys[i], ys[i + 1], ys[i + 2]) for i in range(len(ys) - 2)
    ]
    n = len(tmpl)
    mu = sum(y for y, _, _ in tmpl) / n
    sd = math.sqrt(sum((y - mu) ** 2 for y, _, _ in tmpl) / n)
    r = 0.2 * sd
    b = a = 0
    for i in range(n):
        for j in range(i + 1, n):
            ti, tj = tmpl[i], tmpl[j]
            if abs(ti[0] - tj[0]) <= r and abs(ti[1] - tj[1]) <= r:
                b += 1
                if abs(ti[2] - tj[2]) <= r:
                    a += 1
    assert row["n_templates"] == n
    assert row["b_count"] == b
    assert row["a_count"] == a
    assert abs(row["sampen"] - math.log(b / a)) < 1e-5


def test_lorenz_asym_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_lorenz_asymmetry

    row = q_lorenz_asymmetry(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    per: dict[int, int] = defaultdict(int)
    for k, p in zip(o["o_custkey"], o["o_totalprice"]):
        per[int(k)] += _rnd(p * 100)
    xs = list(per.values())
    n, s = len(xs), sum(xs)
    low = [x for x in xs if x * n < s]
    assert row["n_customers"] == n
    assert row["m_below"] == len(low)
    assert abs(
        row["lorenz_asymmetry"] - (len(low) / n + sum(low) / s)
    ) < 1e-5


def test_page_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_page_trend_test

    row = q_page_trend_test(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    ym: Counter = Counter()
    for d in o["o_orderdate"]:
        ym[(d.year, d.month)] += 1
    years = [
        y
        for y in sorted({yy for yy, _ in ym})
        if sum(1 for yy, _ in ym if yy == y) == 12
    ]
    l2 = 0
    for y in years:
        cs = [(ym[(y, m)], m) for m in range(1, 13)]
        svals = sorted(c for c, _ in cs)
        for c, m in cs:
            lo = svals.index(c) + 1
            ties = svals.count(c)
            l2 += m * (2 * lo + ties - 1)
    nb, k = len(years), 12
    e2 = nb * k * 13 * 13 / 2
    var = nb * k * k * 13 * (k * k - 1) / 144
    z = (l2 - e2) / (2 * math.sqrt(var))
    assert row["n_years"] == nb
    assert row["l2"] == l2
    assert abs(row["z_stat"] - z) < 1e-4


def test_theils_u_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_theils_u

    row = q_theils_u(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    jt: Counter = Counter(
        zip(o["o_orderpriority"], o["o_orderstatus"])
    )
    nn = sum(jt.values())
    nx: Counter = Counter()
    ny: Counter = Counter()
    for (x, y), c in jt.items():
        nx[x] += c
        ny[y] += c
    hy = -sum(c / nn * math.log(c / nn) for c in ny.values())
    hx = -sum(c / nn * math.log(c / nn) for c in nx.values())
    hyx = -sum(
        c / nn * math.log(c / nx[x]) for (x, _), c in jt.items()
    )
    hxy = -sum(
        c / nn * math.log(c / ny[y]) for (_, y), c in jt.items()
    )
    assert abs(row["h_status"] - hy) < 1e-4
    assert abs(row["h_priority"] - hx) < 1e-4
    assert abs(row["u_status_given_priority"] - (hy - hyx) / hy) < 1e-3
    assert abs(row["u_priority_given_status"] - (hx - hxy) / hx) < 1e-3
    assert abs(row["u_symmetric"] - 2 * (hy - hyx) / (hx + hy)) < 1e-3
