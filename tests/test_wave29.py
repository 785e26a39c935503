"""Plan pins, partition invariance, and python twins for the round-29
wave (RBO / dup-pair edit distance / EB smoothing / FD binwidth /
rich club / NB dispersion).
"""

from __future__ import annotations

import math

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_rbo_depth_series_broadcast(spark):
    from llmaix_spark.plans.queries import q_rbo_rankings

    plan = _phys(q_rbo_rankings(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # only the truncated top-100 max-rank list crosses the depth series
    assert "SortMergeJoin" not in plan


def test_edit_distance_no_cartesian(spark):
    from llmaix_spark.plans.queries import q_dup_pair_edit_distance

    plan = _phys(q_dup_pair_edit_distance(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_eb_global_rate_broadcasts(spark):
    from llmaix_spark.plans.queries import q_eb_smoothed_rates

    plan = _phys(q_eb_smoothed_rates(spark, SF_DIR))
    assert "BroadcastExchange" in plan


def test_fd_quartile_windows_partitioned(spark):
    from llmaix_spark.plans.queries import q_fd_binwidth

    plan = _phys(q_fd_binwidth(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_rich_club_degrees_broadcast(spark):
    from llmaix_spark.plans.queries import q_rich_club

    plan = _phys(q_rich_club(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_nb_no_join_no_window(spark):
    from llmaix_spark.plans.queries import q_nb_dispersion

    plan = _phys(q_nb_dispersion(spark, SF_DIR))
    assert "Join" not in plan
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "rbo_rankings",
        "dup_pair_edit_distance",
        "eb_smoothed_rates",
        "fd_binwidth",
        "rich_club",
        "nb_dispersion",
    ],
)
def test_wave29_partition_invariance(spark, qname):
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


def test_rbo_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_rbo_rankings

    row = q_rbo_rankings(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["cents"] = np.floor(o["o_totalprice"] * 100 + 0.5).astype(int)
    per = o.groupby("o_custkey").agg(
        n=("o_orderkey", "size"), cents=("cents", "sum")
    )
    ra = {
        ck: i + 1
        for i, ck in enumerate(
            per.reset_index()
            .sort_values(["cents", "o_custkey"], ascending=[False, True])[
                "o_custkey"
            ]
        )
    }
    rb = {
        ck: i + 1
        for i, ck in enumerate(
            per.reset_index()
            .sort_values(["n", "o_custkey"], ascending=[False, True])[
                "o_custkey"
            ]
        )
    }
    mx = [
        max(ra[ck], rb[ck])
        for ck in per.index
        if ra[ck] <= 100 or rb[ck] <= 100
    ]
    rbo = 0
    for d in range(1, 101):
        overlap = sum(1 for m in mx if m <= d)
        term = 0.1 * (0.9 ** (d - 1)) * overlap / d * 1e9
        rbo += int(math.floor(term + 0.5))
    assert row["depth"] == 100
    assert abs(row["rbo"] - rbo / 1e9) < 1e-5
    assert 0 <= row["rbo"] <= 1


def test_edit_distance_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_dup_pair_edit_distance

    got = {
        (r["doc_a"], r["doc_b"]): (
            r["edit_dist"],
            r["max_len"],
            r["edit_sim"],
        )
        for r in q_dup_pair_edit_distance(spark, SF_DIR).collect()
    }
    assert got

    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    texts = dict(zip(d["doc_id"], d["text"]))
    for (a, b), (dist, ml, sim) in got.items():
        want = lev(texts[a], texts[b])
        assert dist == want
        assert ml == max(len(texts[a]), len(texts[b]))
        assert abs(sim - (1 - want / ml)) < 1e-6
        # near-dup pairs must be character-close too
        assert sim > 0.5


def test_eb_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_eb_smoothed_rates

    got = {
        r["brand"]: (r["n"], r["r"], r["raw_rate"], r["eb_rate"])
        for r in q_eb_smoothed_rates(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    p = pd.read_parquet(f"{SF_DIR}/part.parquet")
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j["ret"] = j["l_returnflag"] == "R"
    g = j.groupby("p_brand")["ret"].agg(["size", "sum"])
    rr, nn = int(g["sum"].sum()), int(g["size"].sum())
    for brand, row in g.iterrows():
        n, r = int(row["size"]), int(row["sum"])
        gn, gr, graw, geb = got[brand]
        assert (gn, gr) == (n, r)
        assert abs(graw - r / n) < 1e-6
        eb = (r + 50.0 * rr / nn) / (n + 50)
        assert abs(geb - eb) < 1e-6
        # shrinkage: EB sits between raw and global rate
        lo, hi = sorted([r / n, rr / nn])
        assert lo - 1e-9 <= eb <= hi + 1e-9


def test_fd_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_fd_binwidth

    got = {
        r["metric"]: (r["n"], r["q1"], r["q3"], r["fd_width"], r["n_bins"])
        for r in q_fd_binwidth(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    series = {
        "o_totalprice": sorted(
            np.floor(o["o_totalprice"] * 100 + 0.5).astype(int)
        ),
        "l_quantity": sorted(
            np.floor(li["l_quantity"] + 0.5).astype(int)
        ),
        "n_chars": sorted(int(x) for x in d["n_chars"]),
    }
    for metric, xs in series.items():
        n = len(xs)
        q1 = xs[(n + 3) // 4 - 1]
        q3 = xs[(3 * n + 3) // 4 - 1]
        width = 2.0 * (q3 - q1) / n ** (1.0 / 3)
        bins = math.ceil((xs[-1] - xs[0]) / width)
        gn, gq1, gq3, gw, gb = got[metric]
        assert (gn, gq1, gq3) == (n, q1, q3)
        assert abs(gw - width) < 1e-4
        assert gb == bins


def test_rich_club_matches_python(spark):
    from llmaix_spark.plans.queries import q_kg_triples, q_rich_club

    got = {
        r["k"]: (r["n_hubs"], r["n_edges"], r["phi"])
        for r in q_rich_club(spark, SF_DIR).collect()
    }

    tri = q_kg_triples(spark, SF_DIR).select("subj", "obj").collect()
    edges = {
        (min(r["subj"], r["obj"]), max(r["subj"], r["obj"]))
        for r in tri
        if r["subj"] != r["obj"]
    }
    deg: dict[str, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for k in (2, 4, 8):
        hubs = {n for n, d in deg.items() if d > k}
        if len(hubs) < 2:
            assert k not in got
            continue
        ne = sum(1 for a, b in edges if a in hubs and b in hubs)
        phi = 2 * ne / (len(hubs) * (len(hubs) - 1))
        gh, ge, gp = got[k]
        assert (gh, ge) == (len(hubs), ne)
        assert abs(gp - phi) < 1e-6
        assert 0 <= gp <= 1
    # rich-club density grows (weakly) with the threshold on this graph
    ks = sorted(got)
    assert all(got[k][0] > 0 for k in ks)


def test_nb_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_nb_dispersion

    row = q_nb_dispersion(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    x = o.groupby("o_custkey").size()
    n = len(x)
    mean = x.sum() / n
    var = ((x - mean) ** 2).sum() / (n - 1)
    assert row["n"] == n
    assert abs(row["mean_x"] - mean) < 1e-6
    assert abs(row["var_x"] - var) < 1e-4
    assert row["overdispersed"] == (var > mean)
    if var > mean:
        assert abs(row["nb_r"] - mean**2 / (var - mean)) < 1e-2
