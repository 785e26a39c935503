"""Plan pins, partition invariance, and python twins for the round-17
wave (day-over-day alerts / load factor / degree assortativity /
purchase cadence / embedding norm histogram / weekend effect).
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


def test_dod_alerts_single_window(spark):
    from llmaix_spark.plans.queries import q_dod_change_alerts

    plan = _phys(q_dod_change_alerts(spark, SF_DIR))
    assert plan.count("Window") == 1
    assert "rangepartitioning" not in plan


def test_load_factor_no_window(spark):
    from llmaix_spark.plans.queries import q_load_factor

    plan = _phys(q_load_factor(spark, SF_DIR))
    assert "Window" not in plan
    assert "rangepartitioning" not in plan


def test_assortativity_degrees_broadcast(spark):
    from llmaix_spark.plans.queries import q_degree_assortativity

    plan = _phys(q_degree_assortativity(spark, SF_DIR))
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


def test_cadence_windows_partitioned(spark):
    from llmaix_spark.plans.queries import q_purchase_cadence

    plan = _phys(q_purchase_cadence(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "BroadcastExchange" in plan  # customer dim


def test_norm_hist_no_window(spark):
    from llmaix_spark.plans.queries import q_embedding_norm_hist

    plan = _phys(q_embedding_norm_hist(spark, SF_DIR))
    assert "Window" not in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "dod_change_alerts",
        "load_factor",
        "degree_assortativity",
        "purchase_cadence",
        "embedding_norm_hist",
        "weekend_effect",
    ],
)
def test_wave17_partition_invariance(spark, qname):
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


def _events_pd():
    import pandas as pd

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["us"] = e["ts"].astype("int64")  # fixtures are µs-precision
    e["day"] = e["us"] // DAY_US
    e["cents"] = (e["value"] * 100).round().astype(int)
    return e


def test_dod_alerts_match_python(spark):
    from llmaix_spark.plans.queries import q_dod_change_alerts

    got = {
        (r["event_type"], r["day"]): (
            r["prev_cents"],
            r["cur_cents"],
            r["change_ratio"],
        )
        for r in q_dod_change_alerts(spark, SF_DIR).collect()
    }

    e = _events_pd()
    daily = e.groupby(["event_type", "day"])["cents"].sum()
    want = {}
    for ty in e["event_type"].unique():
        series = daily[ty].sort_index()
        days = list(series.index)
        # lag runs over OBSERVED days (row order), not calendar adjacency
        for a, b in zip(days, days[1:]):
            prev, cur = int(series[a]), int(series[b])
            if prev > 0 and 2 * abs(cur - prev) >= prev:
                want[(ty, int(b))] = (
                    prev,
                    cur,
                    round(abs(cur - prev) / prev, 6),
                )
    assert set(got) == set(want)
    for k, (p, c, r) in want.items():
        gp, gc, gr = got[k]
        assert (gp, gc) == (p, c)
        assert abs(gr - r) < 1e-6


def test_load_factor_matches_python(spark):
    from llmaix_spark.plans.queries import q_load_factor

    got = {
        r["event_type"]: (r["n_hours"], r["peak"], r["total"], r["load_factor"])
        for r in q_load_factor(spark, SF_DIR).collect()
    }

    e = _events_pd()
    e["hour"] = e["us"] // 3_600_000_000
    for ty, g in e.groupby("event_type"):
        h = g.groupby("hour").size()
        nh, peak, total = len(h), int(h.max()), int(h.sum())
        gn, gp, gt, gl = got[ty]
        assert (gn, gp, gt) == (nh, peak, total)
        assert abs(gl - peak * nh / total) < 1e-6
        assert gl >= 1.0 - 1e-9  # peak >= mean by definition


def test_assortativity_matches_python(spark):
    from llmaix_spark.plans.queries import (
        q_degree_assortativity,
        q_kg_triples,
    )

    row = q_degree_assortativity(spark, SF_DIR).collect()[0]

    edges = set()
    for t in q_kg_triples(spark, SF_DIR).collect():
        s, o = t["subj"], t["obj"]
        if s is None or o is None or s == o:
            continue
        edges.add((min(s, o), max(s, o)))
    deg: dict[str, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    assert row["n_edges"] == len(edges)
    if dx > 0 and dy > 0:
        r = num / (math.sqrt(dx) * math.sqrt(dy))
        assert abs(row["assortativity"] - r) < 1e-6
        assert -1 - 1e-9 <= row["assortativity"] <= 1 + 1e-9
    else:
        assert row["assortativity"] is None


def test_cadence_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_purchase_cadence

    got = {
        r["segment"]: (r["n_gaps"], r["median_gap_days"])
        for r in q_purchase_cadence(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["day"] = o["o_orderdate"].astype("int64") // DAY_US
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    seg = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    gaps: dict[str, list[int]] = {}
    for ck, g in o.groupby("o_custkey"):
        days = [
            d for d, _ in sorted(zip(g["day"], g["o_orderkey"]))
        ]
        for a, b in zip(days, days[1:]):
            gaps.setdefault(seg[ck], []).append(b - a)
    for s, gs in gaps.items():
        gs.sort()
        med = gs[(len(gs) + 1) // 2 - 1]
        assert got[s] == (len(gs), med)


def test_norm_hist_matches_python(spark):
    from collections import Counter

    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_embedding_norm_hist

    got = {
        (r["label"], r["bucket"]): r["n"]
        for r in q_embedding_norm_hist(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    want: Counter = Counter()
    for lbl, vec in zip(e["label"], e["embedding"]):
        q = np.round(np.asarray(vec, dtype=np.float64) * 1_000_000)
        q2 = int((q * q).sum())
        bucket = -1 if q2 <= 0 else q2.bit_length() - 1
        want[(int(lbl), bucket)] += 1
    assert got == dict(want)


def test_weekend_effect_matches_python(spark):
    from llmaix_spark.plans.queries import q_weekend_effect

    got = {
        r["event_type"]: (
            r["wd_days"],
            r["wd_cents"],
            r["we_days"],
            r["we_cents"],
            r["weekend_ratio"],
        )
        for r in q_weekend_effect(spark, SF_DIR).collect()
    }

    e = _events_pd()
    daily = e.groupby(["event_type", "day"])["cents"].sum().reset_index()
    daily["is_we"] = ((daily["day"] + 4) % 7).isin([0, 6])
    for ty, g in daily.groupby("event_type"):
        wd = g[~g["is_we"]]
        we = g[g["is_we"]]
        vals = (
            len(wd),
            int(wd["cents"].sum()),
            len(we),
            int(we["cents"].sum()),
        )
        gw = got[ty]
        assert gw[:4] == vals
        if vals[1] > 0 and vals[2] > 0:
            ratio = (vals[3] * vals[0]) / (vals[1] * vals[2])
            assert abs(gw[4] - ratio) < 1e-6
