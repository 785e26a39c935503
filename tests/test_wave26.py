"""Plan pins, partition invariance, and python twins for the round-26
wave (FK cardinality / top-k overlap / dedup rate by source /
segment EMD / Hill tail / promo share trend).
"""

from __future__ import annotations

import math

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_fk_cardinality_no_joins(spark):
    """Pure aggregate legs — the profile never joins the tables."""
    from llmaix_spark.plans.queries import q_fk_cardinality

    plan = _phys(q_fk_cardinality(spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_topk_overlap_customer_grain_windows(spark):
    from llmaix_spark.plans.queries import q_topk_overlap

    plan = _phys(q_topk_overlap(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_dedup_rate_dup_set_broadcasts(spark):
    from llmaix_spark.plans.queries import q_dedup_rate_by_source

    plan = _phys(q_dedup_rate_by_source(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_emd_counts_broadcast(spark):
    from llmaix_spark.plans.queries import q_emd_segments

    plan = _phys(q_emd_segments(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_hill_threshold_broadcasts(spark):
    from llmaix_spark.plans.queries import q_hill_tail

    plan = _phys(q_hill_tail(spark, SF_DIR))
    assert "BroadcastExchange" in plan


def test_promo_trend_no_join_no_window(spark):
    from llmaix_spark.plans.queries import q_promo_share_trend

    plan = _phys(q_promo_share_trend(spark, SF_DIR))
    assert "Join" not in plan
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "fk_cardinality",
        "topk_overlap",
        "dedup_rate_by_source",
        "emd_segments",
        "hill_tail",
        "promo_share_trend",
    ],
)
def test_wave26_partition_invariance(spark, qname):
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


def test_fk_cardinality_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_fk_cardinality

    got = {
        r["fk"]: (
            r["child_rows"],
            r["parents_referenced"],
            r["parents_total"],
            r["parent_coverage"],
            r["max_fan_in"],
        )
        for r in q_fk_cardinality(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    cu = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    pa = pd.read_parquet(f"{SF_DIR}/part.parquet")
    na = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    legs = {
        "orders->customer": (o, "o_custkey", len(cu)),
        "lineitem->orders": (li, "l_orderkey", len(o)),
        "lineitem->part": (li, "l_partkey", len(pa)),
        "customer->nation": (cu, "c_nationkey", len(na)),
    }
    assert set(got) == set(legs)
    for fk, (child, key, ptot) in legs.items():
        refd = child[key].nunique()
        fan = int(child.groupby(key).size().max())
        g = got[fk]
        assert g[:3] == (len(child), refd, ptot)
        assert abs(g[3] - refd / ptot) < 1e-6
        assert g[4] == fan


def test_topk_overlap_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_topk_overlap

    got = {
        r["k"]: (r["n_both"], r["jaccard"])
        for r in q_topk_overlap(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["cents"] = np.floor(o["o_totalprice"] * 100 + 0.5).astype(int)
    per = o.groupby("o_custkey").agg(
        n=("o_orderkey", "size"), cents=("cents", "sum")
    )
    by_rev = list(
        per.sort_values(["cents"], ascending=False)
        .reset_index()
        .sort_values(["cents", "o_custkey"], ascending=[False, True])[
            "o_custkey"
        ]
    )
    by_freq = list(
        per.reset_index().sort_values(
            ["n", "o_custkey"], ascending=[False, True]
        )["o_custkey"]
    )
    for k in (10, 25, 50, 100):
        a, b = set(by_rev[:k]), set(by_freq[:k])
        inter = len(a & b)
        gn, gj = got[k]
        assert gn == inter
        assert abs(gj - inter / (2 * k - inter)) < 1e-6
    # overlap can only add customers as k grows
    assert got[100][0] >= got[10][0]


def _shingles(text: str, n: int = 3) -> set:
    toks = text.strip().split()
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


def test_dedup_rate_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_dedup_rate_by_source

    got = {
        r["lang"]: (r["n_docs"], r["n_dup_members"], r["dup_rate"])
        for r in q_dedup_rate_by_source(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sh = {int(r.doc_id): _shingles(r.text) for r in d.itertuples()}
    lang = dict(zip(d["doc_id"], d["lang"]))
    members = set()
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                members.add(a)
                members.add(b)
    want: dict[str, list[int]] = {}
    for doc, lg in lang.items():
        want.setdefault(lg, [0, 0])
        want[lg][0] += 1
        want[lg][1] += doc in members
    assert set(got) == set(want)
    for lg, (n, nd) in want.items():
        gn, gnd, gr = got[lg]
        assert (gn, gnd) == (n, nd)
        assert abs(gr - nd / n) < 1e-6


def test_emd_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_emd_segments

    row = q_emd_segments(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["v"] = np.floor(j["o_totalprice"] * 100 + 0.5).astype(int)
    a = sorted(j.loc[j["c_mktsegment"] == "BUILDING", "v"])
    b = sorted(j.loc[j["c_mktsegment"] != "BUILDING", "v"])
    na, nb = len(a), len(b)
    values = sorted(set(a) | set(b))
    from bisect import bisect_right

    s = 0
    for v, nxt in zip(values, values[1:]):
        cum_a = bisect_right(a, v)
        cum_b = bisect_right(b, v)
        s += abs(cum_a * nb - cum_b * na) * (nxt - v)
    emd = s / (na * nb) / 100.0
    assert (row["na"], row["nb"]) == (na, nb)
    assert abs(row["emd_dollars"] - emd) < 1e-4
    assert row["emd_dollars"] >= 0


def test_hill_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_hill_tail

    row = q_hill_tail(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    v = sorted(
        np.floor(o["o_totalprice"] * 100 + 0.5).astype(int), reverse=True
    )
    xk = int(v[250])  # rank 251
    logs = [round(math.log(int(x) / xk), 9) for x in v[:250]]
    alpha = 1.0 / (sum(logs) / len(logs))
    assert row["k"] == 250
    assert row["x_k"] == xk
    assert abs(row["hill_alpha"] - alpha) < 1e-3
    assert row["hill_alpha"] > 0


def test_promo_trend_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_promo_share_trend

    got = {
        r["mk"]: (r["total_cents"], r["promo_cents"], r["promo_share"])
        for r in q_promo_share_trend(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["mk"] = li["l_shipdate"].dt.year * 12 + li["l_shipdate"].dt.month
    li["cents"] = np.floor(
        li["l_extendedprice"] * (1 - li["l_discount"]) * 100 + 0.5
    ).astype(int)
    li["promo"] = li["l_discount"] > 0
    for mk, g in li.groupby("mk"):
        total = int(g["cents"].sum())
        promo = int(g.loc[g["promo"], "cents"].sum())
        gt, gp, gs = got[mk]
        assert (gt, gp) == (total, promo)
        assert abs(gs - promo / total) < 1e-6
