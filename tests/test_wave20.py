"""Plan pins, partition invariance, and python twins for the round-20
wave (Kendall τ-b / new-vs-returning / Simpson reversal / aging
buckets / subword fertility / Gini feature ranking).
"""

from __future__ import annotations

import math

import pytest

SF_DIR = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_kendall_pairs_join_at_daily_grain(spark):
    """The quadratic self-join must sit ABOVE the daily aggregate (two
    HashAggregates feed the join), never on the raw fact table."""
    from llmaix_spark.plans.queries import q_kendall_tau

    plan = _phys(q_kendall_tau(spark, SF_DIR))
    assert "Window" not in plan
    # the join input is the aggregated daily table, so a broadcast NLJ
    # over thousands of rows is the expected physical shape
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan


def test_new_vs_returning_no_window(spark):
    from llmaix_spark.plans.queries import q_new_vs_returning

    plan = _phys(q_new_vs_returning(spark, SF_DIR))
    assert "Window" not in plan
    assert "rangepartitioning" not in plan


def test_simpson_pool_broadcasts(spark):
    from llmaix_spark.plans.queries import q_simpson_reversal

    plan = _phys(q_simpson_reversal(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "Window" not in plan


def test_aging_max_broadcasts_no_window(spark):
    from llmaix_spark.plans.queries import q_aging_buckets

    plan = _phys(q_aging_buckets(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "Window" not in plan


def test_fertility_no_join_no_window(spark):
    from llmaix_spark.plans.queries import q_subword_fertility

    plan = _phys(q_subword_fertility(spark, SF_DIR))
    assert "Join" not in plan
    assert "Window" not in plan


def test_gini_dims_broadcast(spark):
    from llmaix_spark.plans.queries import q_gini_features

    plan = _phys(q_gini_features(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "kendall_tau",
        "new_vs_returning",
        "simpson_reversal",
        "aging_buckets",
        "subword_fertility",
        "gini_features",
    ],
)
def test_wave20_partition_invariance(spark, qname):
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


def _orders_pd():
    import numpy as np
    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["d"] = o["o_orderdate"].astype("int64") // DAY_US
    # HALF_UP like the engines (numpy .round() is banker's)
    o["cents"] = np.floor(o["o_totalprice"] * 100 + 0.5).astype(int)
    return o


def test_kendall_matches_python(spark):
    from llmaix_spark.plans.queries import q_kendall_tau

    row = q_kendall_tau(spark, SF_DIR).collect()[0]

    o = _orders_pd()
    daily = o.groupby("d").agg(x=("d", "size"), y=("cents", "sum"))
    pts = list(zip(daily["x"], daily["y"]))
    conc = disc = tx = ty = txy = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
            elif dx == 0 and dy == 0:
                txy += 1
            elif dx == 0:
                tx += 1
            else:
                ty += 1
    n_pairs = len(pts) * (len(pts) - 1) // 2
    assert (
        row["n_pairs"],
        row["concordant"],
        row["discordant"],
        row["ties_x"],
        row["ties_y"],
        row["ties_xy"],
    ) == (n_pairs, conc, disc, tx, ty, txy)
    tau = (conc - disc) / math.sqrt(
        (n_pairs - tx - txy) * (n_pairs - ty - txy)
    )
    assert abs(row["tau_b"] - tau) < 1e-6
    assert -1 <= row["tau_b"] <= 1


def test_new_vs_returning_matches_python(spark):
    from llmaix_spark.plans.queries import q_new_vs_returning

    got = {
        (r["ym"], r["seg"]): (r["n_orders"], r["revenue_cents"])
        for r in q_new_vs_returning(spark, SF_DIR).collect()
    }

    o = _orders_pd()
    o["ym"] = o["o_orderdate"].dt.strftime("%Y-%m")
    first = o.groupby("o_custkey")["ym"].min()
    o["seg"] = [
        "new" if ym == first[ck] else "returning"
        for ck, ym in zip(o["o_custkey"], o["ym"])
    ]
    want = {
        k: (len(g), int(g["cents"].sum()))
        for k, g in o.groupby(["ym", "seg"])
    }
    assert got == want
    # every customer's first month contributes a 'new' row
    assert all(("new" in {s for (_, s) in got}) for _ in [0])


def test_simpson_matches_python_and_reversal_is_real(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_simpson_reversal

    got = {
        r["rf"]: (r["n"], r["group_sign"], r["pooled_sign"], r["reversed"])
        for r in q_simpson_reversal(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["x"] = np.floor(li["l_discount"] * 100 + 0.5).astype(int)
    li["y"] = np.floor(li["l_quantity"] + 0.5).astype(int)
    sums = {}
    for rf, g in li.groupby("l_returnflag"):
        sums[rf] = (
            len(g),
            int(g["x"].sum()),
            int(g["y"].sum()),
            int((g["x"] * g["y"]).sum()),
        )
    pn = sum(s[0] for s in sums.values())
    psx = sum(s[1] for s in sums.values())
    psy = sum(s[2] for s in sums.values())
    psxy = sum(s[3] for s in sums.values())
    pool_sign = (pn * psxy - psx * psy > 0) - (pn * psxy - psx * psy < 0)
    for rf, (n, sx, sy, sxy) in sums.items():
        gsign = (n * sxy - sx * sy > 0) - (n * sxy - sx * sy < 0)
        want_rev = gsign != 0 and pool_sign != 0 and gsign != pool_sign
        assert got[rf] == (n, gsign, pool_sign, want_rev)


def test_aging_matches_python(spark):
    from llmaix_spark.plans.queries import q_aging_buckets

    got = {
        (r["status"], r["bucket"]): (r["n_orders"], r["cents"])
        for r in q_aging_buckets(spark, SF_DIR).collect()
    }

    o = _orders_pd()
    ref = int(o["d"].max())

    def bucket(age):
        if age <= 30:
            return "00-30"
        if age <= 90:
            return "31-90"
        if age <= 365:
            return "91-365"
        return "365+"

    o["bucket"] = [bucket(ref - d) for d in o["d"]]
    want = {
        k: (len(g), int(g["cents"].sum()))
        for k, g in o.groupby(["o_orderstatus", "bucket"])
    }
    assert got == want


def test_fertility_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_subword_fertility

    got = {
        r["lang"]: (r["n_words"], r["n_pieces"], r["fertility"])
        for r in q_subword_fertility(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    for lang, g in d.groupby("lang"):
        words = [
            w
            for t in g["text"]
            for w in t.strip().lower().split()
            if w
        ]
        pieces = sum((len(w) + 3) // 4 for w in words)
        gn, gp, gf = got[lang]
        assert (gn, gp) == (len(words), pieces)
        assert abs(gf - pieces / len(words)) < 1e-6
        assert gf >= 1.0  # every word is at least one piece


def test_gini_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_gini_features

    got = {
        r["feature"]: (r["weighted_gini"], r["n_values"])
        for r in q_gini_features(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    n = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["pos"] = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    total = len(j)
    for feature, col in [
        ("mktsegment", "c_mktsegment"),
        ("nation", "n_name"),
        ("orderstatus", "o_orderstatus"),
    ]:
        wg = 0.0
        n_vals = 0
        for _, g in j.groupby(col):
            p = g["pos"].sum() / len(g)
            wg += (len(g) / total) * (1 - p * p - (1 - p) * (1 - p))
            n_vals += 1
        g_wg, g_nv = got[feature]
        assert g_nv == n_vals
        assert abs(g_wg - wg) < 1e-6
    # gini of any split can't beat the root impurity
    pr = j["pos"].sum() / total
    root = 1 - pr * pr - (1 - pr) * (1 - pr)
    assert all(v[0] <= root + 1e-9 for v in got.values())
