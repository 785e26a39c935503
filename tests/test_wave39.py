"""Plan pins, partition invariance, and python twins for the round-39
wave (bloom-filter FPR / Shapley attribution / SSE changepoint /
Burrows' Delta stylometry / eventually-follows / k-core peeling).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rnd(x: float) -> int:
    """round-half-up for positive doubles (Spark round / DuckDB round)."""
    return int(math.floor(x + 0.5))


# ---------------------------------------------------------------------------
# plan pins


def test_bloom_bits_broadcast(spark):
    """The bit set is bounded by m=16384 regardless of data size — the
    probe join must be a broadcast, never a shuffle."""
    from llmaix_spark.plans.queries import q_bloom_filter_fpr

    plan = _phys(q_bloom_filter_fpr(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_shapley_dimension_bounded(spark):
    """After the per-user fold, every stage runs at the ≤16-row
    coalition grain — no sort-merge joins anywhere."""
    from llmaix_spark.plans.queries import q_shapley_attribution

    plan = _phys(q_shapley_attribution(spark, SF_DIR))
    assert "SortMergeJoin" not in plan


def test_changepoint_no_joins(spark):
    from llmaix_spark.plans.queries import q_changepoint_detection

    plan = _phys(q_changepoint_detection(spark, SF_DIR))
    assert "Join" not in plan


def test_stylometry_grid_broadcast(spark):
    """Everything after the two token counts runs at the sources×30
    grid — broadcast joins only."""
    from llmaix_spark.plans.queries import q_stylometry_delta

    plan = _phys(q_stylometry_delta(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_eventually_follows_shape(spark):
    from llmaix_spark.plans.queries import q_eventually_follows

    plan = _phys(q_eventually_follows(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the |types|-row denominator broadcasts back
    assert "BroadcastHashJoin" in plan


def test_kcore_rounds_shape(spark):
    from llmaix_spark.plans.queries import q_kcore_decomposition

    df = q_kcore_decomposition(spark, SF_DIR)
    rows = sorted(tuple(r) for r in df.collect())
    assert [r[0] for r in rows] == [1, 2, 3, 4]
    # peeling only shrinks
    for a, b in zip(rows, rows[1:]):
        assert b[1] <= a[1] and b[2] <= a[2]
    # the fixture converges within the 4-round budget
    assert rows[2][1:] == rows[3][1:]


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "bloom_filter_fpr",
        "shapley_attribution",
        "changepoint_detection",
        "stylometry_delta",
        "eventually_follows",
        "kcore_decomposition",
    ],
)
def test_wave39_partition_invariance(spark, qname):
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
# python twins / properties


def test_bloom_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_bloom_filter_fpr

    row = q_bloom_filter_fpr(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    build = sorted(
        int(k) for k in o.loc[o.o_orderpriority == "1-URGENT", "o_orderkey"]
    )
    probe = sorted(
        int(k) for k in o.loc[o.o_orderpriority != "1-URGENT", "o_orderkey"]
    )
    m, k = 16384, 3
    bits = {
        _h60(f"{key}:bloom{i}") % m
        for key in build
        for i in range(1, k + 1)
    }
    n_fp = sum(
        1
        for key in probe
        if all(_h60(f"{key}:bloom{i}") % m in bits for i in range(1, k + 1))
    )
    assert (row["n_build"], row["n_probe"]) == (len(build), len(probe))
    assert (row["bits_set"], row["n_fp"]) == (len(bits), n_fp)
    assert abs(row["fpr"] - n_fp / len(probe)) < 1e-6
    theo = (1 - math.exp(-k * len(build) / m)) ** k
    assert abs(row["theo_fpr"] - theo) < 1e-6
    # the bitmap is genuinely partial — a bloom prunes, it doesn't match
    # (at sf0.001 the load factor is so low the observed FPR is 0)
    assert 0 <= row["fpr"] < 1
    assert 0 < row["bits_set"] < m


def test_shapley_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_shapley_attribution

    got = {r["channel"]: r for r in q_shapley_attribution(spark, SF_DIR).collect()}

    players = ["click", "error", "signup", "view"]
    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ms: dict[int, list[int]] = {}
    for _, g in e.groupby("user_id"):
        types = set(g["event_type"])
        mask = sum(2**i for i, t in enumerate(players) if t in types)
        st = ms.setdefault(mask, [0, 0])
        st[0] += 1
        st[1] += 1 if "purchase" in types else 0
    v = {}
    for S in range(16):
        cn = sum(n for mk, (n, _) in ms.items() if mk & ~S & 15 == 0)
        cc = sum(c for mk, (_, c) in ms.items() if mk & ~S & 15 == 0)
        v[S] = _rnd(cc * 1e9 / cn) if cn > 0 else 0
    w24 = {0: 6, 1: 2, 2: 2, 3: 6}
    for i, ch in enumerate(players):
        t24 = sum(
            w24[bin(S).count("1")] * (v[S + 2**i] - v[S])
            for S in range(16)
            if S & 2**i == 0
        )
        n_users = sum(n for mk, (n, _) in ms.items() if mk & 2**i)
        g = got[ch]
        assert g["n_users"] == n_users
        assert abs(g["phi_shapley"] - t24 / (24 * 1e9)) < 1e-6
    # efficiency: the Shapley values split v(full) - v(empty)
    phi_sum = sum(g["phi_shapley"] for g in got.values())
    assert abs(phi_sum - (v[15] - v[0]) / 1e9) < 1e-5


def test_changepoint_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_changepoint_detection

    row = q_changepoint_detection(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    daily = sorted(Counter(o["o_orderdate"].dt.date).items())
    ys = [y for _, y in daily]
    n = len(ys)
    ts, tss = sum(ys), sum(y * y for y in ys)
    best = None
    cs = css = 0
    for i in range(1, n):
        cs += ys[i - 1]
        css += ys[i - 1] ** 2
        sse = (css - cs * cs / i) + (
            (tss - css) - (ts - cs) * (ts - cs) / (n - i)
        )
        key = (round(sse, 6), daily[i - 1][0])
        if best is None or key < best[0]:
            best = (key, i, cs)
    (sse_best, split_day), i, cs = best
    assert row["split_day"] == split_day
    assert (row["n_days"], row["n_left"]) == (n, i)
    assert abs(row["mean_left"] - cs / i) < 1e-6
    assert abs(row["mean_right"] - (ts - cs) / (n - i)) < 1e-6
    assert abs(row["sse_best"] - sse_best) < 1e-5
    sse_total = tss - ts * ts / n
    assert abs(row["sse_total"] - sse_total) < 1e-5
    assert abs(row["reduction"] - (1 - sse_best / sse_total)) < 1e-6
    # splitting can only reduce SSE
    assert 0 <= row["reduction"] <= 1


def test_stylometry_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_stylometry_delta

    got = {
        (r["source_a"], r["source_b"]): (r["n_words"], r["delta"])
        for r in q_stylometry_delta(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    counts: dict[str, Counter] = {}
    for r in d.itertuples():
        toks = [t for t in r.text.lower().strip().split(" ") if t]
        counts.setdefault(r.source, Counter()).update(toks)
    glob = Counter()
    for c in counts.values():
        glob.update(c)
    top = [w for w, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[:30]]
    srcs = sorted(counts)
    S = len(srcs)
    tot = {s: sum(counts[s].values()) for s in srcs}
    f = {
        (s, w): _rnd(counts[s].get(w, 0) * 1e9 / tot[s])
        for s in srcs
        for w in top
    }
    z = {}
    kept = []
    for w in top:
        musum = sum(f[(s, w)] for s in srcs)
        devs = {s: S * f[(s, w)] - musum for s in srcs}
        var_sum = sum(dv * dv for dv in devs.values())
        if var_sum > 0:
            kept.append(w)
            for s in srcs:
                z[(s, w)] = devs[s] * math.sqrt((S - 1) / var_sum)
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            tsum = sum(_rnd(abs(z[(a, w)] - z[(b, w)]) * 1e9) for w in kept)
            want[(a, b)] = (len(kept), tsum / (len(kept) * 1e9))
    assert set(got) == set(want)
    for k, (nw, delta) in want.items():
        assert got[k][0] == nw
        assert abs(got[k][1] - delta) < 1e-6
        assert got[k][1] >= 0


def test_eventually_follows_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_eventually_follows

    got = {
        (r["type_a"], r["type_b"]): (
            r["n_users_a"], r["n_users_both"], r["n_ef"], r["ef_share"],
        )
        for r in q_eventually_follows(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e.assign(us=e["ts"].astype("datetime64[ns]").astype("int64") // 1000)
    first: dict[tuple[int, str], tuple[int, int]] = {}
    last: dict[tuple[int, str], tuple[int, int]] = {}
    for r in e.itertuples():
        k = (int(r.user_id), r.event_type)
        key = (int(r.us), int(r.event_id))
        if k not in first or key < first[k]:
            first[k] = key
        if k not in last or key > last[k]:
            last[k] = key
    types = sorted(set(e["event_type"]))
    users = sorted(set(int(u) for u in e["user_id"]))
    want = {}
    for a in types:
        na = sum(1 for u in users if (u, a) in first)
        for b in types:
            if a == b:
                continue
            both = [
                u for u in users if (u, a) in first and (u, b) in first
            ]
            nef = sum(1 for u in both if last[(u, b)] > first[(u, a)])
            if both:
                want[(a, b)] = (na, len(both), nef)
    assert {k: v[:3] for k, v in got.items()} == want
    for k, (na, nb, nef, share) in got.items():
        assert nef <= nb <= na or nef <= nb  # ef bounded by co-presence
        assert abs(share - nef / na) < 1e-6


def test_kcore_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_kcore_decomposition

    got = sorted(tuple(r) for r in q_kcore_decomposition(spark, SF_DIR).collect())

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    edges = set()
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(set(int(p) for p in g["l_partkey"]))
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                edges.add((a, b))
    want = []
    cur = edges
    for r in range(1, 5):
        deg = Counter()
        for s, d in cur:
            deg[s] += 1
            deg[d] += 1
        keep = {n for n, c in deg.items() if c >= 2}
        cur = {(s, d) for s, d in cur if s in keep and d in keep}
        want.append((r, len(keep), len(cur)))
    assert got == want
