"""Plan pins, partition invariance, and python twins for the round-62
wave (Krippendorff alpha / Cliff's delta / Cochran Q /
Jonckheere-Terpstra / Grubbs / Atkinson).
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
    return [(d, per_day[d]) for d in sorted(per_day)]


# ---------------------------------------------------------------------------
# structural properties


def test_krippendorff_structure(spark):
    from llmaix_spark.plans.queries import q_krippendorff_alpha

    row = q_krippendorff_alpha(spark, SF_DIR).collect()[0]
    # alpha <= 1; corrupted raters guarantee imperfect agreement
    assert row["kripp_alpha"] < 1.0
    assert row["kripp_alpha"] > 0.0  # raters mostly copy the label
    # 2 or 3 ratings per unit
    assert 2 * row["n_units"] <= row["n_ratings"] <= 3 * row["n_units"]


def test_cliffs_delta_structure(spark):
    from llmaix_spark.plans.queries import q_cliffs_delta

    row = q_cliffs_delta(spark, SF_DIR).collect()[0]
    assert -1 <= row["cliffs_delta"] <= 1
    assert row["n_r"] > 0 and row["n_n"] > 0
    lut = [(0.147, "negligible"), (0.33, "small"), (0.474, "medium")]
    mag = next(
        (m for thr, m in lut if abs(row["cliffs_delta"]) < thr), "large"
    )
    assert row["magnitude"] == mag


def test_cochran_q_structure(spark):
    from llmaix_spark.plans.queries import q_cochran_q

    row = q_cochran_q(spark, SF_DIR).collect()[0]
    assert row["q_stat"] >= 0
    assert row["df"] == 2
    for c in ("c1", "c2", "c3"):
        assert 0 <= row[c] <= row["n_subjects"]


def test_jt_structure(spark):
    from llmaix_spark.plans.queries import q_jonckheere_terpstra

    row = q_jonckheere_terpstra(spark, SF_DIR).collect()[0]
    assert row["jt2"] >= 0
    assert row["increasing_trend_05"] == (row["z_stat"] > 1.645)


def test_grubbs_structure(spark):
    from llmaix_spark.plans.queries import q_grubbs_test

    row = q_grubbs_test(spark, SF_DIR).collect()[0]
    assert row["g_stat"] > 0
    assert row["outlier_count"] >= 0
    assert row["outlier_4sigma"] == (row["g_stat"] > 4.0)


def test_atkinson_structure(spark):
    from llmaix_spark.plans.queries import q_atkinson_index

    row = q_atkinson_index(spark, SF_DIR).collect()[0]
    # Atkinson lives in [0, 1); 0 only under perfect equality
    assert 0 <= row["atkinson_05"] < 1
    assert row["mean_rev_usd"] > 0


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "krippendorff_alpha",
        "cliffs_delta",
        "cochran_q",
        "jonckheere_terpstra",
        "grubbs_test",
        "atkinson_index",
    ],
)
def test_wave62_partition_invariance(spark, qname):
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


def test_krippendorff_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_krippendorff_alpha

    row = q_krippendorff_alpha(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    units: dict[int, list] = defaultdict(list)
    for did, lang in zip(d["doc_id"], d["lang"]):
        did = int(did)
        ha = _h(f"{did}:kra")
        hb = _h(f"{did}:krb")
        units[did].append(lang)
        units[did].append("zz" if ha % 5 == 0 else lang)
        if hb % 7 != 0:
            units[did].append("yy" if hb % 11 == 0 else lang)
    nn = 0
    do_num = 0.0
    cls_tot: Counter = Counter()
    for vals in units.values():
        m = len(vals)
        cnt = Counter(vals)
        nn += m
        cls_tot.update(cnt)
        do_num += (m * m - sum(c * c for c in cnt.values())) / (m - 1)
    se = sum(c * c for c in cls_tot.values())
    alpha = 1.0 - do_num * (nn - 1) / (nn * nn - se)
    assert row["n_units"] == len(units)
    assert row["n_ratings"] == nn
    assert abs(row["kripp_alpha"] - alpha) < 1e-5


def test_cliffs_delta_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_cliffs_delta

    row = q_cliffs_delta(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    hr: Counter = Counter()
    hn: Counter = Counter()
    for fl, q in zip(li["l_returnflag"], li["l_quantity"]):
        if fl == "R":
            hr[_rnd(q)] += 1
        elif fl == "N":
            hn[_rnd(q)] += 1
    gt = sum(
        cr * cn for qr, cr in hr.items() for qn, cn in hn.items() if qr > qn
    )
    lt = sum(
        cr * cn for qr, cr in hr.items() for qn, cn in hn.items() if qr < qn
    )
    n_r, n_n = sum(hr.values()), sum(hn.values())
    assert row["n_r"] == n_r and row["n_n"] == n_n
    assert abs(row["cliffs_delta"] - (gt - lt) / (n_r * n_n)) < 1e-6


def test_cochran_q_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_cochran_q

    row = q_cochran_q(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    per: dict[int, set] = defaultdict(set)
    for k, dt in zip(o["o_custkey"], o["o_orderdate"]):
        if dt.year in (1995, 1996, 1997):
            per[int(k)].add(dt.year)
    per = {k: v for k, v in per.items() if v}
    c = Counter(y for ys in per.values() for y in ys)
    t = sum(len(v) for v in per.values())
    sr2 = sum(len(v) ** 2 for v in per.values())
    sc2 = c[1995] ** 2 + c[1996] ** 2 + c[1997] ** 2
    q = 2 * (3 * sc2 - t * t) / (3 * t - sr2)
    assert row["n_subjects"] == len(per)
    assert (row["c1"], row["c2"], row["c3"]) == (
        c[1995],
        c[1996],
        c[1997],
    )
    assert abs(row["q_stat"] - q) < 1e-4


def test_jt_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_jonckheere_terpstra

    row = q_jonckheere_terpstra(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    pri = {
        int(k): int(p[0])
        for k, p in zip(o["o_orderkey"], o["o_orderpriority"])
    }
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    hist: Counter = Counter()
    for ok, q in zip(li["l_orderkey"], li["l_quantity"]):
        hist[(pri[int(ok)], _rnd(q))] += 1
    jt2 = 0
    for (sa, qa), ca in hist.items():
        for (sb, qb), cb in hist.items():
            if sa < sb:
                jt2 += ca * cb * (2 * (qa < qb) + (qa == qb))
    ni = Counter()
    for (s, _), c in hist.items():
        ni[s] += c
    nn = sum(ni.values())
    s2 = sum(v * v for v in ni.values())
    s23 = sum(v * v * (2 * v + 3) for v in ni.values())
    d4 = 2 * jt2 - (nn * nn - s2)
    z = d4 / (4.0 * math.sqrt((nn * nn * (2 * nn + 3) - s23) / 72.0))
    assert row["n_items"] == nn
    assert row["jt2"] == jt2
    assert abs(row["z_stat"] - z) < 1e-4


def test_grubbs_matches_python(spark):
    from llmaix_spark.plans.queries import q_grubbs_test

    row = q_grubbs_test(spark, SF_DIR).collect()[0]

    days = _daily_counts()
    ys = [y for _, y in days]
    n = len(ys)
    mean = sum(ys) / n
    sd = math.sqrt(sum((y - mean) ** 2 for y in ys) / (n - 1))
    best = max(days, key=lambda p: (abs(p[1] - mean), -p[0].toordinal()))
    assert row["n_days"] == n
    assert row["outlier_date"] == best[0]
    assert row["outlier_count"] == best[1]
    assert abs(row["g_stat"] - abs(best[1] - mean) / sd) < 1e-4


def test_atkinson_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_atkinson_index

    row = q_atkinson_index(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    per: dict[int, int] = defaultdict(int)
    for k, p in zip(o["o_custkey"], o["o_totalprice"]):
        per[int(k)] += _rnd(p * 100)
    xs = list(per.values())
    n = len(xs)
    ybar = sum(xs) / n
    ede = (sum(math.sqrt(x) for x in xs) / n) ** 2
    a = 1.0 - ede / ybar
    assert row["n_customers"] == n
    assert abs(row["mean_rev_usd"] - ybar / 100.0) < 0.02
    assert abs(row["atkinson_05"] - a) < 1e-5
