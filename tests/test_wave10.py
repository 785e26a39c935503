"""Plan pins, partition invariance, and python twins for the round-10
wave (linear attribution / clustering coefficient / Theil–Sen / Apdex
/ heavy hitters / box-plot stats).
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

U = 720720  # lcm(1..16) credit units
WEEK7_US = 7 * 86_400_000_000


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_heavy_hitters_broadcasts_and_no_global_sort(spark):
    """Shard totals, the candidate set and the grand total all ride
    broadcasts; nothing range-partitions."""
    from llmaix_spark.plans.queries import q_heavy_hitters

    plan = _phys(q_heavy_hitters(spark, SF_DIR))
    assert plan.count("BroadcastExchange") >= 3
    assert "rangepartitioning" not in plan


def test_boxplot_fences_broadcast(spark):
    from llmaix_spark.plans.queries import q_boxplot_stats

    plan = _phys(q_boxplot_stats(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "rangepartitioning" not in plan


def test_theil_sen_no_global_sort(spark):
    from llmaix_spark.plans.queries import q_theil_sen_trend

    plan = _phys(q_theil_sen_trend(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "attribution_linear",
        "kg_clustering_coeff",
        "theil_sen_trend",
        "events_apdex",
        "heavy_hitters",
        "boxplot_stats",
    ],
)
def test_wave10_partition_invariance(spark, qname):
    from llmaix_spark.plans import queries as Q

    fn = Q.QUERIES[qname]
    rows = {}
    for n in ("3", "16"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        df = fn(spark, SF_DIR)
        rows[n] = sorted(
            tuple(
                tuple(v) if isinstance(v, list) else v for v in r
            )
            for r in df.collect()
        )
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert rows["3"] == rows["16"]


# ---------------------------------------------------------------------------
# python twins


def _events_pd():
    import pandas as pd

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["us"] = e["ts"].astype("int64")
    e["cents"] = (e["value"] * 100).round().astype(int)
    return e


def test_attribution_linear_matches_python(spark):
    """Exact credit replay: base + earliest-touch remainder; total
    units across channels must equal n_purchases * U exactly."""
    from llmaix_spark.plans.queries import q_attribution_linear

    got = {
        r["channel"]: r["credit_units"]
        for r in q_attribution_linear(spark, SF_DIR).collect()
    }

    e = _events_pd()
    credit: dict[str, int] = {}
    purchases = e[e["event_type"] == "purchase"]
    touches = e[e["event_type"] != "purchase"]
    for _, p in purchases.iterrows():
        tw = touches[
            (touches["user_id"] == p["user_id"])
            & (touches["us"] < p["us"])
            & (p["us"] - touches["us"] <= WEEK7_US)
        ]
        n = len(tw)
        if n == 0:
            credit["direct"] = credit.get("direct", 0) + U
            continue
        base = U // n
        for ch in tw["event_type"]:
            credit[ch] = credit.get(ch, 0) + base
        first = tw.sort_values(["us", "event_id"]).iloc[0]
        credit[first["event_type"]] = (
            credit.get(first["event_type"], 0) + U % n
        )
    if "direct" not in credit:
        credit["direct"] = 0
    assert got == credit
    assert sum(got.values()) == len(purchases) * U


def test_kg_clustering_coeff_matches_python(spark):
    from llmaix_spark.plans.queries import (
        q_kg_clustering_coeff,
        q_kg_triples,
    )

    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering_coeff"])
        for r in q_kg_clustering_coeff(spark, SF_DIR).collect()
    }

    triples = q_kg_triples(spark, SF_DIR).collect()
    edges = set()
    for t in triples:
        s, o = t["subj"], t["obj"]
        if s is None or o is None or s == o:
            continue
        edges.add((min(s, o), max(s, o)))
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for node, nbrs in adj.items():
        deg = len(nbrs)
        if deg < 2:
            assert node not in got
            continue
        tri = 0
        nb = sorted(nbrs)
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                if (min(nb[i], nb[j]), max(nb[i], nb[j])) in edges:
                    tri += 1
        gd, gt, gc = got[node]
        assert (gd, gt) == (deg, tri)
        assert abs(gc - 2 * tri / (deg * (deg - 1))) < 1e-6


def test_theil_sen_matches_python(spark):
    from llmaix_spark.plans.queries import q_theil_sen_trend

    got = {
        r["event_type"]: (
            r["n_pairs"],
            r["med_dy"],
            r["med_dx"],
            r["slope_cents_per_day"],
        )
        for r in q_theil_sen_trend(spark, SF_DIR).collect()
    }

    e = _events_pd()
    e["dayn"] = e["us"] // 86_400_000_000
    daily = (
        e.groupby(["event_type", "dayn"])["cents"].sum().reset_index()
    )
    for ty, g in daily.groupby("event_type"):
        pts = sorted(zip(g["dayn"].astype(int), g["cents"].astype(int)))
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                dy = pts[j][1] - pts[i][1]
                dx = pts[j][0] - pts[i][0]
                slopes.append((dy / dx, dy, dx))
        slopes.sort()
        n = len(slopes)
        med = slopes[(n + 1) // 2 - 1]
        gn, gdy, gdx, gs = got[ty]
        assert (gn, gdy, gdx) == (n, med[1], med[2])
        assert abs(gs - med[0]) < 1e-6


def test_events_apdex_matches_python(spark):
    from llmaix_spark.plans.queries import q_events_apdex

    got = {
        r["event_type"]: (
            r["n"],
            r["n_satisfied"],
            r["n_tolerating"],
            r["n_frustrated"],
            r["apdex"],
        )
        for r in q_events_apdex(spark, SF_DIR).collect()
    }
    e = _events_pd()
    for ty, g in e.groupby("event_type"):
        c = g["cents"]
        n = len(c)
        sat = int((c <= 5000).sum())
        tol = int(((c > 5000) & (c <= 20000)).sum())
        fru = n - sat - tol
        apdex = (2 * sat + tol) / (2 * n)
        gn, gs, gt, gf, ga = got[ty]
        assert (gn, gs, gt, gf) == (n, sat, tol, fru)
        assert abs(ga - apdex) < 1e-6


def test_heavy_hitters_matches_python_and_superset(spark):
    """Exact heavy hitters equal the brute-force counter; additionally
    verify the pigeonhole property the 2-phase plan relies on: every
    global heavy hitter is locally heavy in at least one shard."""
    import hashlib

    from llmaix_spark.plans.queries import q_heavy_hitters

    got = {
        r["tok"]: (r["n_count"], r["n_total"])
        for r in q_heavy_hitters(spark, SF_DIR).collect()
    }

    import pandas as pd

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    counts: dict[str, int] = {}
    shard_counts: dict[tuple[int, str], int] = {}
    shard_totals: dict[int, int] = {}
    for doc_id, text in zip(d["doc_id"], d["text"]):
        sh = (
            int(
                hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16
            )
            % 32
        )
        for tok in text.strip().split(" "):
            counts[tok] = counts.get(tok, 0) + 1
            shard_counts[(sh, tok)] = shard_counts.get((sh, tok), 0) + 1
            shard_totals[sh] = shard_totals.get(sh, 0) + 1
    n = sum(counts.values())
    want = {
        t: (c, n) for t, c in counts.items() if c * 1000 >= n
    }
    assert got == want
    for t in want:
        assert any(
            shard_counts.get((sh, t), 0) * 1000 >= shard_totals[sh]
            for sh in shard_totals
        ), t


def test_boxplot_stats_matches_python(spark):
    from llmaix_spark.plans.queries import q_boxplot_stats

    got = {
        r["event_type"]: (
            r["n"],
            r["q1"],
            r["median"],
            r["q3"],
            r["n_outliers"],
        )
        for r in q_boxplot_stats(spark, SF_DIR).collect()
    }
    e = _events_pd()
    for ty, g in e.groupby("event_type"):
        c = sorted(g["cents"])
        n = len(c)
        q1 = c[max(1, (n + 1) // 4) - 1]
        med = c[(n + 1) // 2 - 1]
        q3 = c[min(n, 3 * (n + 1) // 4) - 1]
        lo = q1 - (3 * (q3 - q1)) // 2
        hi = q3 + (3 * (q3 - q1)) // 2
        out = sum(1 for v in c if v < lo or v > hi)
        assert got[ty] == (n, q1, med, q3, out)
