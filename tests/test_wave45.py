"""Plan pins, partition invariance, and python twins for the round-45
wave (Bradley-Terry / Newton logistic / partition modularity / Hill
numbers / SAX motifs / type-graph reachability).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rnd(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


# ---------------------------------------------------------------------------
# plan pins / structural properties


def test_bt_is_a_distribution(spark):
    from llmaix_spark.plans.queries import q_bradley_terry

    rows = q_bradley_terry(spark, SF_DIR).collect()
    assert len(rows) == 25
    assert abs(sum(r["bt_strength"] for r in rows) - 1.0) < 1e-4
    # strength tracks wins at the extremes
    by_s = sorted(rows, key=lambda r: r["bt_strength"])
    assert by_s[-1]["wins"] > by_s[0]["wins"]


def test_logistic_single_pass_aggregates(spark):
    from llmaix_spark.plans.queries import q_logistic_newton

    plan = _phys(q_logistic_newton(spark, SF_DIR))
    assert "Join" not in plan
    row = q_logistic_newton(spark, SF_DIR).collect()[0]
    # value predicts purchase positively in the fixture
    assert row["beta1"] > 0
    assert row["log_lik"] < 0
    assert 0 < row["mean_p"] < 1


def test_modularity_sums_to_q(spark):
    from llmaix_spark.plans.queries import q_partition_modularity

    rows = q_partition_modularity(spark, SF_DIR).collect()
    q = sum(r["q_contribution"] for r in rows)
    # modularity is bounded: -0.5 <= Q <= 1
    assert -0.5 <= q <= 1
    m = sum(r["within_w"] for r in rows)
    d = sum(r["degree_w"] for r in rows)
    assert d >= 2 * m  # degrees count every edge twice, within once


def test_hill_ordering(spark):
    """The Hill-number ordering q0 >= q1 >= q2 holds per nation."""
    from llmaix_spark.plans.queries import q_hill_numbers

    rows = q_hill_numbers(spark, SF_DIR).collect()
    assert len(rows) == 25
    for r in rows:
        assert (
            r["richness"] + 1e-6
            >= r["exp_shannon"]
            >= r["inv_simpson"] - 1e-6
        )
        assert r["inv_simpson"] >= 1


def test_sax_no_joins(spark):
    from llmaix_spark.plans.queries import q_sax_motifs

    plan = _phys(q_sax_motifs(spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    rows = q_sax_motifs(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    assert all(len(r["motif"]) == 3 and set(r["motif"]) <= set("abcd")
               for r in rows)


def test_reachability_levels(spark):
    from llmaix_spark.plans.queries import q_type_graph_reachability

    rows = {
        (r["src"], r["dst"]): r
        for r in q_type_graph_reachability(spark, SF_DIR).collect()
    }
    # the 5-type event graph is dense: every ordered pair reachable
    assert len(rows) == 20
    for (s, d), r in rows.items():
        assert 1 <= r["min_steps"] <= 4
        # mutual means the reversed pair is present too
        assert r["mutual"] == ((d, s) in rows)


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "bradley_terry",
        "logistic_newton",
        "partition_modularity",
        "hill_numbers",
        "sax_motifs",
        "type_graph_reachability",
    ],
)
def test_wave45_partition_invariance(spark, qname):
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


def _nation_orders(sf_dir):
    import pandas as pd

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    return o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )


def test_bt_matches_python(spark):
    from llmaix_spark.plans.queries import q_bradley_terry

    got = {r["nation"]: r for r in q_bradley_terry(spark, SF_DIR).collect()}

    m = _nation_orders(SF_DIR)
    mo = m["o_orderdate"].dt.to_period("M")
    dn = Counter(zip(mo, m["n_name"]))
    months = sorted({k[0] for k in dn})
    nations = sorted({k[1] for k in dn})
    wins: Counter = Counter()
    for per in months:
        for a in nations:
            ca = dn.get((per, a), 0)
            if not ca:
                continue
            for b in nations:
                cb = dn.get((per, b), 0)
                if b != a and cb and ca > cb:
                    wins[(a, b)] += 1
    nij: Counter = Counter()
    for (a, b), w in wins.items():
        nij[(a, b)] += w
        nij[(b, a)] += w
    wtot = Counter()
    for (a, _), w in wins.items():
        wtot[a] += w
    players = sorted({a for a, _ in nij})
    k = len(players)
    pi = {p: 10**9 // k for p in players}
    for _ in range(3):
        den = Counter()
        for (a, b), n in nij.items():
            den[a] += _rnd(n * 1e18 / (pi[a] + pi[b]))
        raw = {p: _rnd(wtot[p] * 1e18 / den[p]) for p in players}
        mass = sum(raw.values())
        pi = {p: _rnd(raw[p] * (1e9 / mass)) for p in players}
    for p in players:
        g = got[p]
        assert g["wins"] == wtot[p]
        assert abs(g["bt_strength"] - ((pi[p] + 500) // 1000) / 1e6) < 1e-9


def test_logistic_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_logistic_newton

    row = q_logistic_newton(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    xs = [min(_rnd(v * 100), 50000) / 50000.0 for v in e["value"]]
    ys = [1 if t == "purchase" else 0 for t in e["event_type"]]

    def step(b0, b1):
        g0 = g1 = h00 = h01 = h11 = 0
        for x, y in zip(xs, ys):
            p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
            w = p * (1.0 - p)
            g0 += _rnd((y - p) * 1e9)
            g1 += _rnd((y - p) * x * 1e9)
            h00 += _rnd(w * 1e9)
            h01 += _rnd(w * x * 1e9)
            h11 += _rnd(w * x * x * 1e9)
        g0, g1, h00, h01, h11 = (v / 1e9 for v in (g0, g1, h00, h01, h11))
        det = h00 * h11 - h01 * h01
        return (
            round(b0 + (h11 * g0 - h01 * g1) / det, 9),
            round(b1 + (h00 * g1 - h01 * g0) / det, 9),
        )

    b0, b1 = step(0.0, 0.0)
    b0, b1 = step(b0, b1)
    ll = sum(
        _rnd(
            (
                y * math.log(1.0 / (1.0 + math.exp(-(b0 + b1 * x))))
                + (1 - y)
                * math.log(1.0 - 1.0 / (1.0 + math.exp(-(b0 + b1 * x))))
            )
            * 1e9
        )
        for x, y in zip(xs, ys)
    )
    pn = sum(
        _rnd(1.0 / (1.0 + math.exp(-(b0 + b1 * x))) * 1e9) for x in xs
    )
    assert row["n_events"] == len(xs)
    assert abs(row["beta0"] - round(b0, 6)) < 1e-9
    assert abs(row["beta1"] - round(b1, 6)) < 1e-9
    assert abs(row["log_lik"] - ll / 1e9) < 1e-5
    assert abs(row["mean_p"] - pn / (len(xs) * 1e9)) < 1e-6


def test_modularity_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_partition_modularity

    got = {r["brand"]: r for r in q_partition_modularity(spark, SF_DIR).collect()}

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    pt = pd.read_parquet(f"{SF_DIR}/part.parquet")
    brand = {int(r.p_partkey): r.p_brand for r in pt.itertuples()}
    edges: Counter = Counter()
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(int(p) for p in g["l_partkey"])
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                if a < b:
                    edges[(a, b)] += 1
    m = sum(edges.values())
    within: Counter = Counter()
    deg: Counter = Counter()
    for (a, b), w in edges.items():
        ba, bb = brand[a], brand[b]
        deg[ba] += w
        deg[bb] += w
        if ba == bb:
            within[ba] += w
    for b in deg:
        g = got[b]
        assert (g["within_w"], g["degree_w"]) == (within.get(b, 0), deg[b])
        expect = within.get(b, 0) / m - (deg[b] / (2 * m)) ** 2
        assert abs(g["q_contribution"] - expect) < 1e-6


def test_hill_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_hill_numbers

    got = {r["nation"]: r for r in q_hill_numbers(spark, SF_DIR).collect()}

    m = _nation_orders(SF_DIR)
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    j = m.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    for nat, g in j.groupby("n_name"):
        cnt = Counter(int(p) for p in g["l_partkey"])
        n = sum(cnt.values())
        sh = sum(_rnd(-(c / n) * math.log(c / n) * 1e9) for c in cnt.values())
        inv = n * n / sum(c * c for c in cnt.values())
        r = got[nat]
        assert r["richness"] == len(cnt)
        assert abs(r["exp_shannon"] - math.exp(sh / 1e9)) < 1e-4
        assert abs(r["inv_simpson"] - inv) < 1e-6


def test_sax_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_sax_motifs

    got = [(r["motif"], r["n_days"]) for r in q_sax_motifs(spark, SF_DIR).collect()]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    daily = sorted(Counter(o["o_orderdate"].dt.date).items())
    ys = [y for _, y in daily]
    n, s, ss = len(ys), sum(ys), sum(y * y for y in ys)
    mu = s / n
    sd = math.sqrt(ss / n - mu * mu)
    syms = []
    for y in ys:
        z = round((y - mu) / sd, 6)
        syms.append(
            "a" if z < -0.6745 else "b" if z < 0 else "c" if z < 0.6745 else "d"
        )
    motifs = Counter(
        "".join(syms[i : i + 3]) for i in range(len(syms) - 2)
    )
    want = sorted(motifs.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_reachability_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_type_graph_reachability

    got = {
        (r["src"], r["dst"]): (r["min_steps"], r["mutual"])
        for r in q_type_graph_reachability(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e.assign(
        us=e["ts"].astype("datetime64[ns]").astype("int64") // 1000
    ).sort_values(["user_id", "us", "event_id"])
    e1 = set()
    for _, g in e.groupby("user_id"):
        types = list(g["event_type"])
        for a, b in zip(types, types[1:]):
            if a != b:
                e1.add((a, b))
    dist = {p: 1 for p in e1}
    frontier = set(e1)
    for step in (2, 3, 4):
        nxt = {
            (a, d)
            for (a, b) in frontier
            for (c, d) in e1
            if b == c and a != d and (a, d) not in dist
        }
        for p in nxt:
            dist[p] = step
        frontier = nxt
    want = {
        p: (d, (p[1], p[0]) in dist) for p, d in dist.items()
    }
    assert got == want
