"""Plan pins, partition invariance, and python twins for the round-33
wave (two-way ANOVA / feature-hash collisions / CDF linearity / dedup
group sizes / log-rank test / delta-method ratio CI).
"""

from __future__ import annotations

import hashlib
import math

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# plan pins


def test_anova_cell_moments_broadcast(spark):
    from llmaix_spark.plans.queries import q_anova_two_way

    plan = _phys(q_anova_two_way(spark, SF_DIR))
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_hash_collisions_no_join(spark):
    from llmaix_spark.plans.queries import q_feature_hash_collisions

    plan = _phys(q_feature_hash_collisions(spark, SF_DIR))
    assert "Join" not in plan
    assert "Window" not in plan


def test_cdf_rank_windows_partitioned(spark):
    from llmaix_spark.plans.queries import q_cdf_linearity

    plan = _phys(q_cdf_linearity(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_logrank_calendar_grid_cross(spark):
    """The only cross product joins the calendar-bounded distinct
    event-day grid against the user-grain survival table."""
    from llmaix_spark.plans.queries import q_logrank_test

    plan = _phys(q_logrank_test(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan


def test_ratio_ci_no_window(spark):
    from llmaix_spark.plans.queries import q_ratio_ci_delta

    plan = _phys(q_ratio_ci_delta(spark, SF_DIR))
    assert "Window" not in plan


def test_group_sizes_no_cartesian(spark):
    from llmaix_spark.plans.queries import q_dedup_group_sizes

    plan = _phys(q_dedup_group_sizes(spark, SF_DIR))
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "anova_two_way",
        "feature_hash_collisions",
        "cdf_linearity",
        "dedup_group_sizes",
        "logrank_test",
        "ratio_ci_delta",
    ],
)
def test_wave33_partition_invariance(spark, qname):
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


def test_anova_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_anova_two_way

    row = q_anova_two_way(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["y"] = np.floor(li["l_quantity"] + 0.5).astype(int)
    li["a"] = [
        "none" if d == 0 else ("low" if d < 0.05 else "high")
        for d in li["l_discount"]
    ]
    li["b"] = li["l_returnflag"]
    n = len(li)
    grand = li["y"].sum() ** 2 / n
    sst = (li["y"] ** 2).sum() - grand
    ma = sum(
        g["y"].sum() ** 2 / len(g) for _, g in li.groupby("a")
    )
    mb = sum(
        g["y"].sum() ** 2 / len(g) for _, g in li.groupby("b")
    )
    mc = sum(
        g["y"].sum() ** 2 / len(g) for _, g in li.groupby(["a", "b"])
    )
    ka = li["a"].nunique()
    kb = li["b"].nunique()
    kc = li.groupby(["a", "b"]).ngroups
    ssa, ssb = ma - grand, mb - grand
    ssab = mc - ma - mb + grand
    sse = (li["y"] ** 2).sum() - mc
    assert (row["n"], row["ka"], row["kb"]) == (n, ka, kb)
    assert abs(row["ss_a"] - ssa) < 1e-2
    assert abs(row["ss_b"] - ssb) < 1e-2
    assert abs(row["ss_interaction"] - ssab) < 1e-2
    assert abs(row["ss_error"] - sse) < 1e-2
    f_a = (ssa / (ka - 1)) / (sse / (n - kc))
    assert abs(row["f_a"] - f_a) < 1e-4
    # decomposition identity
    assert abs(
        (row["ss_a"] + row["ss_b"] + row["ss_interaction"] + row["ss_error"])
        - sst
    ) < 1e-1


def _shingles(text: str, n: int = 3) -> set:
    toks = text.strip().split()
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


def test_hash_collisions_match_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_feature_hash_collisions

    row = q_feature_hash_collisions(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    feats = set()
    for t in d["text"]:
        feats |= _shingles(t)
    buckets: dict[int, int] = {}
    for s in feats:
        b = _h60(f"{s}:feat") % 256
        buckets[b] = buckets.get(b, 0) + 1
    colliding = {b: c for b, c in buckets.items() if c >= 2}
    assert row["n_buckets_used"] == len(buckets)
    assert row["n_features"] == len(feats)
    assert row["max_bucket"] == max(buckets.values())
    assert row["n_colliding_buckets"] == len(colliding)
    mass = sum(colliding.values()) / len(feats)
    assert abs(row["collision_mass"] - mass) < 1e-6


def test_cdf_discriminates(spark):
    from llmaix_spark.plans.queries import q_cdf_linearity

    got = {r["metric"]: r["r2"] for r in q_cdf_linearity(spark, SF_DIR).collect()}
    assert set(got) == {"orderkey", "totalprice_cents", "price_squared"}
    # dense surrogate key is perfectly linear; squared prices are not
    assert got["orderkey"] > 0.999999
    assert got["price_squared"] < got["totalprice_cents"]
    assert got["price_squared"] < 0.99
    for v in got.values():
        assert 0 <= v <= 1


def test_group_sizes_match_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_dedup_group_sizes

    got = {
        r["group_size"]: r["n_groups"]
        for r in q_dedup_group_sizes(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sh = {int(r.doc_id): _shingles(r.text) for r in d.itertuples()}
    ids = sorted(sh)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    sizes: dict[int, int] = {}
    for i in ids:
        r = find(i)
        sizes[r] = sizes.get(r, 0) + 1
    want: dict[int, int] = {}
    for s in sizes.values():
        want[s] = want.get(s, 0) + 1
    assert got == want
    # every document lands in exactly one group
    assert sum(k * v for k, v in got.items()) == len(ids)


def test_logrank_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_logrank_test

    row = q_logrank_test(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["d"] = e["ts"].astype("int64") // 86_400_000_000
    surv = []
    for u, g in e.groupby("user_id"):
        t0, tl = int(g["d"].min()), int(g["d"].max())
        p = g.loc[g["event_type"] == "purchase", "d"]
        arm = 1 if _h60(f"{u}:arm") % 2 == 0 else 0
        if len(p):
            surv.append((arm, int(p.min()) - t0, True))
        else:
            surv.append((arm, tl - t0, False))
    times = sorted({t for _, t, ev in surv if ev})
    o1 = sum(1 for g, t, ev in surv if ev and g == 1 and t in set(times))
    e1n = vn = 0
    o1 = 0
    for tt in times:
        nt = sum(1 for _, t, _ev in surv if t >= tt)
        n1 = sum(1 for g, t, _ev in surv if t >= tt and g == 1)
        dt = sum(1 for _, t, ev in surv if t == tt and ev)
        d1 = sum(1 for g, t, ev in surv if t == tt and ev and g == 1)
        o1 += d1
        e1n += int(math.floor(dt * n1 / nt * 1e9 + 0.5))
        if nt > 1:
            v = dt * (n1 / nt) * (1 - n1 / nt) * (nt - dt) / (nt - 1)
            vn += int(math.floor(v * 1e9 + 0.5))
    assert row["observed_g1"] == o1
    assert abs(row["expected_g1"] - e1n / 1e9) < 1e-5
    z = (o1 - e1n / 1e9) / math.sqrt(vn / 1e9)
    assert abs(row["logrank_z"] - z) < 1e-4
    # random arms: the null should not be wildly rejected
    assert abs(row["logrank_z"]) < 4


def test_ratio_ci_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_ratio_ci_delta

    got = {
        r["seg"]: (r["n"], r["ratio_dollars"], r["se_dollars"])
        for r in q_ratio_ci_delta(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j["o_totalprice"] * 100 + 0.5).astype(int)
    per = j.groupby(["c_mktsegment", "o_custkey"]).agg(
        r=("cents", "sum"), k=("cents", "size")
    )
    for seg, g in per.groupby(level=0):
        r = g["r"].to_numpy(dtype=float)
        k = g["k"].to_numpy(dtype=float)
        n = len(g)
        ratio = r.sum() / k.sum()
        resid = r - ratio * k
        var = (resid**2).sum() / (n - 1)
        se = math.sqrt(var / n) / (k.sum() / n)
        gn, gr, gse = got[seg]
        assert gn == n
        assert abs(gr - ratio / 100) < 1e-5
        assert abs(gse - se / 100) < 1e-4
        assert gse > 0
