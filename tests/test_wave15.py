"""Plan pins, partition invariance, and python twins for the round-15
wave (Adamic–Adar / revenue bridge / engagement CCDF / token-source MI
/ inter-arrival histogram / month seasonal index).
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


def test_adamic_adar_weights_broadcast(spark):
    from llmaix_spark.plans.queries import q_adamic_adar

    plan = _phys(q_adamic_adar(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


def test_revenue_bridge_checkpointed_recombination(spark):
    """The lag+lead state table is localCheckpointed (classes and churn
    both consume it — the plan shows the ExistingRDD barrier, not a
    re-derived window per consumer) and the month summaries recombine
    via broadcast."""
    from llmaix_spark.plans.queries import q_revenue_bridge

    plan = _phys(q_revenue_bridge(spark, SF_DIR))
    assert "Scan ExistingRDD" in plan  # checkpoint barrier, no re-derive
    assert "Window" not in plan  # ...so no window re-executes downstream
    assert plan.count("BroadcastExchange") >= 2
    assert "rangepartitioning" not in plan


def test_engagement_ccdf_no_window(spark):
    from llmaix_spark.plans.queries import q_engagement_ccdf

    plan = _phys(q_engagement_ccdf(spark, SF_DIR))
    assert "Window" not in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_token_source_mi_broadcasts(spark):
    from llmaix_spark.plans.queries import q_token_source_mi

    plan = _phys(q_token_source_mi(spark, SF_DIR))
    assert plan.count("BroadcastExchange") >= 2
    assert "rangepartitioning" not in plan


def test_interarrival_partitioned_window(spark):
    from llmaix_spark.plans.queries import q_interarrival_hist

    plan = _phys(q_interarrival_hist(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert plan.count("Window") == 1


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "adamic_adar",
        "revenue_bridge",
        "engagement_ccdf",
        "token_source_mi",
        "interarrival_hist",
        "month_seasonal_index",
    ],
)
def test_wave15_partition_invariance(spark, qname):
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


def test_adamic_adar_matches_python(spark):
    from llmaix_spark.plans.queries import q_adamic_adar, q_kg_triples

    got = {
        (r["node_a"], r["node_b"]): (r["n_common"], r["aa_score"])
        for r in q_adamic_adar(spark, SF_DIR).collect()
    }

    edges = set()
    for t in q_kg_triples(spark, SF_DIR).collect():
        s, o = t["subj"], t["obj"]
        if s is None or o is None or s == o:
            continue
        edges.add((min(s, o), max(s, o)))
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    nodes = sorted(adj)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1 :]:
            if (x, y) in edges:
                continue
            common = adj[x] & adj[y]
            if not common:
                continue
            mu = sum(
                int(round(1e9 / round(math.log10(len(adj[m])), 6)))
                for m in common
            )
            want[(x, y)] = (len(common), round(mu / 1e9, 6))
    assert set(got) == set(want)
    for k, (nc, sc) in want.items():
        gn, gs = got[k]
        assert gn == nc
        assert abs(gs - sc) < 2e-6


def test_revenue_bridge_identity(spark):
    """Bridge identity: Δ monthly total = new + resurrected +
    expansion − contraction − churned, exactly, for every month."""
    import pandas as pd

    from llmaix_spark.plans.queries import q_revenue_bridge

    got = {
        r["month_key"]: (
            r["new_cents"],
            r["resurrected_cents"],
            r["expansion_cents"],
            r["contraction_cents"],
            r["churned_cents"],
        )
        for r in q_revenue_bridge(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["cents"] = (o["o_totalprice"] * 100).round().astype(int)
    o["mk"] = o["o_orderdate"].dt.year * 12 + o["o_orderdate"].dt.month
    totals = o.groupby("mk")["cents"].sum().to_dict()
    months = sorted(got)
    assert months == sorted(totals)
    for mk in months:
        new, res, exp, con, chu = got[mk]
        delta = totals[mk] - totals.get(mk - 1, 0)
        assert delta == new + res + exp - con - chu, mk
        assert min(new, res, exp, con, chu) >= 0


def test_engagement_ccdf_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_engagement_ccdf

    got = {
        r["k"]: (r["n_users_ge"], r["share"])
        for r in q_engagement_ccdf(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    counts = e.groupby("user_id").size()
    mx = int(counts.max())
    n_users = len(counts)
    k = 1
    want = {}
    while k <= mx:
        ge = int((counts >= k).sum())
        want[k] = (ge, round(ge / n_users, 6))
        k *= 2
    assert set(got) == set(want)
    for k, (ge, sh) in want.items():
        assert got[k][0] == ge
        assert abs(got[k][1] - sh) < 1e-6
    # CCDF is non-increasing in k
    ks = sorted(got)
    ns = [got[k][0] for k in ks]
    assert ns == sorted(ns, reverse=True)


def test_token_source_mi_matches_python(spark):
    from collections import Counter

    import pandas as pd

    from llmaix_spark.plans.queries import q_token_source_mi

    got = {
        r["source"]: (r["n_tokens"], r["mi"])
        for r in q_token_source_mi(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    st: Counter = Counter()
    for src, txt in zip(d["source"], d["text"]):
        for t in txt.split(" "):
            st[(src, t)] += 1
    ct: Counter = Counter()
    cs: Counter = Counter()
    for (s, t), c in st.items():
        ct[t] += c
        cs[s] += c
    n = sum(st.values())
    lg = lambda x: round(math.log10(x), 6)  # noqa: E731
    for src in cs:
        mu = sum(
            c
            * int(
                round(
                    (lg(c) + lg(n) - lg(ct[t]) - lg(cs[s])) * 1_000_000
                )
            )
            for (s, t), c in st.items()
            if s == src
        )
        gn, gmi = got[src]
        assert gn == cs[src]
        assert abs(gmi - round(mu / (n * 1_000_000), 6)) < 2e-6


def test_interarrival_matches_python(spark):
    from collections import Counter

    import pandas as pd

    from llmaix_spark.plans.queries import q_interarrival_hist

    got = {
        (r["event_type"], r["bucket"]): (r["gap_lo_s"], r["n"])
        for r in q_interarrival_hist(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["us"] = e["ts"].astype("int64")  # fixtures are µs-precision
    want: Counter = Counter()
    for ty, g in e.groupby("event_type"):
        us = [
            u
            for u, _ in sorted(zip(g["us"], g["event_id"]))
        ]
        for a, b in zip(us, us[1:]):
            gap_s = (b - a) // 1_000_000
            bucket = -1 if gap_s <= 0 else gap_s.bit_length() - 1
            want[(ty, bucket)] += 1
    assert set(got) == set(want)
    for (ty, b), n in want.items():
        lo, gn = got[(ty, b)]
        assert gn == n
        assert lo == (0 if b < 0 else 1 << b)


def test_month_seasonal_index_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_month_seasonal_index

    got = {
        r["month"]: (r["n_days"], r["rev_cents"], r["seasonal_index"])
        for r in q_month_seasonal_index(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["cents"] = (o["o_totalprice"] * 100).round().astype(int)
    o["m"] = o["o_orderdate"].dt.month
    o["day"] = o["o_orderdate"].astype("int64") // DAY_US
    per = o.groupby("m").agg(
        n_days=("day", "nunique"), rev=("cents", "sum")
    )
    d_all = int(per["n_days"].sum())
    r_all = int(per["rev"].sum())
    wsum = 0.0
    for m, row in per.iterrows():
        nd, rv = int(row["n_days"]), int(row["rev"])
        idx = (rv * d_all) / (nd * r_all)
        gn, gr, gi = got[int(m)]
        assert (gn, gr) == (nd, rv)
        assert abs(gi - idx) < 1e-6
        wsum += nd * gi
    # day-weighted mean of the index is 1 by construction
    assert abs(wsum / d_all - 1.0) < 1e-5
