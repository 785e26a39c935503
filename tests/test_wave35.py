"""Plan pins, partition invariance, and python twins for the round-35
wave (Neyman allocation / post-stratified mean / avg neighbor degree /
retention half-life / segment co-movement / supplier scorecard).
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


def test_neyman_scalars_broadcast(spark):
    from llmaix_spark.plans.queries import q_neyman_allocation

    plan = _phys(q_neyman_allocation(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_poststrat_broadcast_assembly(spark):
    from llmaix_spark.plans.queries import q_poststrat_mean

    plan = _phys(q_poststrat_mean(spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_neighbor_degree_broadcast(spark):
    from llmaix_spark.plans.queries import q_avg_neighbor_degree

    plan = _phys(q_avg_neighbor_degree(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_halflife_ages_broadcast(spark):
    from llmaix_spark.plans.queries import q_retention_halflife

    plan = _phys(q_retention_halflife(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_comovement_balanced_panel_join(spark):
    from llmaix_spark.plans.queries import q_segment_comovement

    plan = _phys(q_segment_comovement(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_scorecard_dim_broadcast(spark):
    from llmaix_spark.plans.queries import q_supplier_scorecard

    plan = _phys(q_supplier_scorecard(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "neyman_allocation",
        "poststrat_mean",
        "avg_neighbor_degree",
        "retention_halflife",
        "segment_comovement",
        "supplier_scorecard",
    ],
)
def test_wave35_partition_invariance(spark, qname):
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


def test_neyman_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_neyman_allocation

    got = {
        r["lang"]: (r["n_docs"], r["stddev_chars"], r["quota"], r["allocation"])
        for r in q_neyman_allocation(spark, SF_DIR).collect()
    }
    assert sum(v[3] for v in got.values()) == 100

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    stats = {}
    for lang, g in d.groupby("lang"):
        n = len(g)
        s1 = int(g["n_chars"].sum())
        s2 = int((g["n_chars"] ** 2).sum())
        sh = round(
            math.sqrt(max((s2 - s1 * s1 / n) / (n - 1), 0)), 9
        )
        stats[lang] = (n, sh)
    tw = sum(n * sh for n, sh in stats.values())
    quotas = {
        lang: 100.0 * n * sh / tw for lang, (n, sh) in stats.items()
    }
    base = {lang: int(math.floor(q)) for lang, q in quotas.items()}
    rem = sorted(
        ((quotas[lg] - base[lg], lg) for lg in quotas),
        key=lambda x: (-x[0], x[1]),
    )
    leftover = 100 - sum(base.values())
    for i in range(leftover):
        base[rem[i][1]] += 1
    for lang, (n, sh) in stats.items():
        gn, gsh, gq, ga = got[lang]
        assert gn == n
        assert abs(gsh - sh) < 1e-5
        assert abs(gq - quotas[lang]) < 1e-4
        assert ga == base[lang]


def test_poststrat_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_poststrat_mean

    row = q_poststrat_mean(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["v"] = np.floor(j["o_totalprice"] * 100 + 0.5).astype(int)
    raw = j["v"].mean() / 100
    pop = c.groupby("c_mktsegment").size()
    ps = sum(
        (pop[seg] / len(c)) * (g["v"].mean())
        for seg, g in j.groupby("c_mktsegment")
    ) / 100
    assert row["n_orders"] == len(j)
    assert abs(row["raw_mean_dollars"] - raw) < 1e-4
    assert abs(row["poststrat_mean_dollars"] - ps) < 1e-4


def test_neighbor_degree_matches_python(spark):
    from llmaix_spark.plans.queries import q_avg_neighbor_degree, q_kg_triples

    got = {
        r["degree"]: (r["n_nodes"], r["avg_neighbor_degree"])
        for r in q_avg_neighbor_degree(spark, SF_DIR).collect()
    }

    tri = q_kg_triples(spark, SF_DIR).select("subj", "obj").collect()
    edges = {
        (min(r["subj"], r["obj"]), max(r["subj"], r["obj"]))
        for r in tri
        if r["subj"] != r["obj"]
    }
    adj: dict[str, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    per_deg: dict[int, list] = {}
    for node, nbrs in adj.items():
        knn = sum(len(adj[x]) for x in nbrs) / len(nbrs)
        per_deg.setdefault(len(nbrs), []).append(knn)
    want = {
        d: (len(v), round(sum(v) / len(v), 6))
        for d, v in per_deg.items()
    }
    assert set(got) == set(want)
    for d, (n, k) in want.items():
        gn, gk = got[d]
        assert gn == n
        assert abs(gk - k) < 1e-4


def test_halflife_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_retention_halflife

    row = q_retention_halflife(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["mk"] = o["o_orderdate"].dt.year * 12 + o["o_orderdate"].dt.month
    first = o.groupby("o_custkey")["mk"].min()
    mmax = int(o["mk"].max())
    active = set(zip(o["o_custkey"], o["mk"]))
    pts = []
    for a in range(1, 7):
        elig = [ck for ck, coh in first.items() if coh + 6 <= mmax]
        act = sum(
            1 for ck in elig if (ck, first[ck] + a) in active
        )
        if act > 0:
            pts.append((a, round(math.log(act / len(elig)), 9)))
    k = len(pts)
    sx = sum(a for a, _ in pts)
    sy = sum(v for _, v in pts)
    sxx = sum(a * a for a, _ in pts)
    sxy = sum(a * v for a, v in pts)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert row["k"] == k
    assert abs(row["slope"] - slope) < 1e-5
    assert abs(row["halflife_months"] - (-math.log(2) / slope)) < 1e-2


def test_comovement_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_segment_comovement

    got = {
        (r["seg_a"], r["seg_b"]): (r["n_days"], r["pearson"])
        for r in q_segment_comovement(spark, SF_DIR).collect()
    }
    assert len(got) == 10

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["d"] = j["o_orderdate"].astype("int64") // DAY_US
    j["v"] = np.floor(j["o_totalprice"] * 100 + 0.5).astype(int)
    daily = j.groupby(["c_mktsegment", "d"])["v"].sum().unstack(0)
    segs = sorted(daily.columns)
    for i, sa in enumerate(segs):
        for sb in segs[i + 1 :]:
            pair = daily[[sa, sb]].dropna()
            x, y = pair[sa].to_numpy(float), pair[sb].to_numpy(float)
            r = np.corrcoef(x, y)[0, 1]
            gn, gp = got[(sa, sb)]
            assert gn == len(pair)
            assert abs(gp - r) < 1e-4
            assert -1 <= gp <= 1


def test_scorecard_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_supplier_scorecard

    got = {
        r["supplier"]: (
            r["n_lines"],
            r["revenue_cents"],
            r["mean_latency_days"],
            r["return_rate"],
        )
        for r in q_supplier_scorecard(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    s = pd.read_parquet(f"{SF_DIR}/supplier.parquet")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        s, left_on="l_suppkey", right_on="s_suppkey"
    )
    j["cents"] = np.floor(
        j["l_extendedprice"] * (1 - j["l_discount"]) * 100 + 0.5
    ).astype(int)
    j["lat"] = (
        j["l_shipdate"].astype("int64") // DAY_US
        - j["o_orderdate"].astype("int64") // DAY_US
    )
    j["ret"] = j["l_returnflag"] == "R"
    for name, g in j.groupby("s_name"):
        gn, gr, gl, grr = got[name]
        assert gn == len(g)
        assert gr == int(g["cents"].sum())
        assert abs(gl - g["lat"].mean()) < 1e-4
        assert abs(grr - g["ret"].mean()) < 1e-6
