"""Plan pins, partition invariance, and python twins for the round-28
wave (grouped OLS / split-parity PSI / transition dwell / embedding
coverage / Cochran-Armitage trend / A/B quantile treatment effect).
"""

from __future__ import annotations

import hashlib
import math

import pytest

SF_DIR = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# plan pins


def test_ols_min_broadcasts(spark):
    from llmaix_spark.plans.queries import q_segment_trend_ols

    plan = _phys(q_segment_trend_ols(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "Window" not in plan


def test_psi_no_window(spark):
    from llmaix_spark.plans.queries import q_split_parity_psi

    plan = _phys(q_split_parity_psi(spark, SF_DIR))
    assert "Window" not in plan
    assert "BroadcastExchange" in plan


def test_dwell_windows_partitioned(spark):
    from llmaix_spark.plans.queries import q_transition_dwell

    plan = _phys(q_transition_dwell(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_coverage_broadcast_assembly(spark):
    from llmaix_spark.plans.queries import q_embedding_coverage

    plan = _phys(q_embedding_coverage(spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert "BroadcastExchange" in plan


def test_ca_trend_no_window(spark):
    from llmaix_spark.plans.queries import q_late_by_priority_trend

    plan = _phys(q_late_by_priority_trend(spark, SF_DIR))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_qte_arm_partitioned_ntile(spark):
    from llmaix_spark.plans.queries import q_ab_qte

    plan = _phys(q_ab_qte(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "segment_trend_ols",
        "split_parity_psi",
        "transition_dwell",
        "embedding_coverage",
        "late_by_priority_trend",
        "ab_qte",
    ],
)
def test_wave28_partition_invariance(spark, qname):
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


def test_ols_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_segment_trend_ols

    got = {
        r["seg"]: (r["n"], r["slope_dollars_per_month"])
        for r in q_segment_trend_ols(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["mk"] = j["o_orderdate"].dt.year * 12 + j["o_orderdate"].dt.month
    j["cents"] = np.floor(j["o_totalprice"] * 100 + 0.5).astype(int)
    per = j.groupby(["c_mktsegment", "mk"])["cents"].sum().reset_index()
    mk0 = per["mk"].min()
    for seg, g in per.groupby("c_mktsegment"):
        x = (g["mk"] - mk0).to_numpy(dtype=float)
        y = g["cents"].to_numpy(dtype=float)
        n = len(x)
        slope = (n * (x * y).sum() - x.sum() * y.sum()) / (
            n * (x * x).sum() - x.sum() ** 2
        )
        gn, gs = got[seg]
        assert gn == n
        assert abs(gs - slope / 100.0) < 1e-3


def test_psi_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_split_parity_psi

    row = q_split_parity_psi(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ct: dict[int, int] = {}
    ch: dict[int, int] = {}
    for r in d.itertuples():
        b = min(r.n_chars // 64, 8)
        if _h60(f"{r.doc_id}:split") % 10000 < 9000:
            ct[b] = ct.get(b, 0) + 1
        else:
            ch[b] = ch.get(b, 0) + 1
    bins = set(ct) | set(ch)
    nt, nh = sum(ct.values()), sum(ch.values())
    psi = 0.0
    for b in bins:
        pt = (ct.get(b, 0) + 0.5) / (nt + 0.5 * 9)
        ph = (ch.get(b, 0) + 0.5) / (nh + 0.5 * 9)
        psi += (pt - ph) * round(math.log(pt / ph), 9)
    assert row["n_bins"] == len(bins)
    assert abs(row["psi"] - psi) < 1e-5
    assert row["psi"] >= 0  # smoothed PSI is a sum of same-sign terms


def test_dwell_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_transition_dwell

    got = {
        (r["from_type"], r["to_type"]): (
            r["n_transitions"],
            r["p50_gap_sec"],
        )
        for r in q_transition_dwell(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["us"] = e["ts"].astype("int64")
    gaps: dict[tuple, list[int]] = {}
    for _, g in e.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        rows = list(zip(g["event_type"], g["us"]))
        for (a, ua), (b, ub) in zip(rows, rows[1:]):
            if a != b:
                gaps.setdefault((a, b), []).append(ub - ua)
    want = {}
    for k, v in gaps.items():
        v = sorted(v)
        want[k] = (len(v), v[(len(v) + 1) // 2 - 1] // 1_000_000)
    assert got == want


def test_coverage_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_embedding_coverage

    row = q_embedding_coverage(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    dims = [len(v) for v in e["embedding"]]
    matched = int(e["vec_id"].isin(set(d["doc_id"])).sum())
    assert row["n_vecs"] == len(e)
    assert row["n_distinct"] == e["vec_id"].nunique()
    assert (row["min_dim"], row["max_dim"]) == (min(dims), max(dims))
    assert row["n_docs"] == len(d)
    assert row["n_matched"] == matched
    assert abs(row["doc_coverage"] - matched / len(d)) < 1e-6
    assert row["dims_consistent"] == (min(dims) == max(dims))


def test_ca_trend_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_late_by_priority_trend

    row = q_late_by_priority_trend(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["w"] = j["o_orderpriority"].str[0].astype(int)
    j["late"] = (
        j["l_shipdate"].astype("int64") // DAY_US
        - j["o_orderdate"].astype("int64") // DAY_US
        > 60
    )
    g = j.groupby("w").agg(n=("late", "size"), r=("late", "sum"))
    nn, rr = int(g["n"].sum()), int(g["r"].sum())
    swn = int((g.index * g["n"]).sum())
    swr = int((g.index * g["r"]).sum())
    swwn = int((g.index * g.index * g["n"]).sum())
    p = rr / nn
    z = (swr - rr * swn / nn) / math.sqrt(
        p * (1 - p) * (swwn - swn * swn / nn)
    )
    assert (row["n_lines"], row["n_late"]) == (nn, rr)
    assert abs(row["ca_trend_z"] - z) < 1e-4


def test_qte_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_ab_qte

    got = {
        r["decile"]: (
            r["n_a"],
            r["n_b"],
            r["mean_a"],
            r["mean_b"],
            r["qte"],
        )
        for r in q_ab_qte(spark, SF_DIR).collect()
    }
    assert got  # at tiny SF some deciles are empty in one arm

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    per = (
        e.assign(p=(e["event_type"] == "purchase").astype(int))
        .groupby("user_id")["p"]
        .sum()
    )
    arms: dict[str, list[tuple]] = {"A": [], "B": []}
    for u, x in per.items():
        arms["A" if _h60(f"{u}:ab") % 2 == 0 else "B"].append(
            (int(x), int(u))
        )

    def deciles(vals):
        vals = sorted(vals)
        n = len(vals)
        base, extra = divmod(n, 10)
        out = {}
        pos = 0
        for d in range(1, 11):
            size = base + (1 if d <= extra else 0)
            chunk = vals[pos : pos + size]
            if chunk:
                out[d] = (len(chunk), sum(x for x, _ in chunk))
            pos += size
        return out

    da, db = deciles(arms["A"]), deciles(arms["B"])
    want_keys = set(da) & set(db)  # inner join drops one-arm deciles
    assert set(got) == want_keys
    for d in want_keys:
        na, sa = da[d]
        nb, sb = db[d]
        gna, gnb, gma, gmb, gq = got[d]
        assert (gna, gnb) == (na, nb)
        assert abs(gma - sa / na) < 1e-6
        assert abs(gmb - sb / nb) < 1e-6
        assert abs(gq - (sa / na - sb / nb)) < 1e-5
    # deciles are monotone within each arm
    means_a = [got[d][2] for d in sorted(got)]
    assert means_a == sorted(means_a)
