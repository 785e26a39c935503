"""Plan pins, partition invariance, and python twins for the round-49
wave (power-analysis MDE / type cross-correlation / variance ratio /
golden record / percolation sweep / DKW check).
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
# structural properties


def test_mde_shrinks_with_n(spark):
    from llmaix_spark.plans.queries import q_power_analysis_mde

    rows = q_power_analysis_mde(spark, SF_DIR).collect()
    assert len(rows) == 25
    # the largest segment should have (near) the smallest absolute MDE
    by_n = sorted(rows, key=lambda r: r["n_orders"])
    assert by_n[-1]["mde_abs"] < by_n[0]["mde_abs"]
    for r in rows:
        assert r["mde_abs"] > 0 and r["mde_rel"] > 0


def test_xcorr_bounded(spark):
    from llmaix_spark.plans.queries import q_xcorr_types

    rows = {r["lag_days"]: r for r in q_xcorr_types(spark, SF_DIR).collect()}
    assert set(rows) == {0, 1, 2, 3}
    ns = {r["n_days"] for r in rows.values()}
    assert len(ns) == 1  # the spine is shared across lags
    for r in rows.values():
        assert -1 <= r["xcorr"] <= 1


def test_vr_positive(spark):
    from llmaix_spark.plans.queries import q_variance_ratio

    rows = {r["q"]: r for r in q_variance_ratio(spark, SF_DIR).collect()}
    assert set(rows) == {2, 4, 8}
    for r in rows.values():
        assert r["variance_ratio"] > 0
    # longer differences use fewer observations
    assert rows[2]["n_obs"] >= rows[4]["n_obs"] >= rows[8]["n_obs"]


def test_golden_record_bounds(spark):
    from llmaix_spark.plans.queries import q_golden_record

    row = q_golden_record(spark, SF_DIR).collect()[0]
    assert row["n_clusters"] > 0
    assert 0 <= row["lang_conflict_share"] <= 1
    assert 0 <= row["source_conflict_share"] <= 1
    assert 0 < row["mean_keeper_len_ratio"] <= 1


def test_percolation_monotone(spark):
    from llmaix_spark.plans.queries import q_percolation_sweep

    rows = {r["w_min"]: r for r in q_percolation_sweep(spark, SF_DIR).collect()}
    assert set(rows) == {2, 3, 4}
    # raising the threshold only removes edges/nodes and shrinks the
    # giant component
    assert rows[2]["n_edges"] >= rows[3]["n_edges"] >= rows[4]["n_edges"]
    assert (
        rows[2]["largest_cc_share"]
        >= rows[3]["largest_cc_share"]
        >= rows[4]["largest_cc_share"]
    )
    for r in rows.values():
        assert 0 <= r["largest_cc_share"] <= 1


def test_dkw_within_bound(spark):
    """Two halves of the SAME distribution must sit inside the DKW
    envelope — this is the audit's null case."""
    from llmaix_spark.plans.queries import q_dkw_check

    row = q_dkw_check(spark, SF_DIR).collect()[0]
    assert row["within_bound"]
    assert 0 < row["d_observed"] < row["dkw_bound"]


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "power_analysis_mde",
        "xcorr_types",
        "variance_ratio",
        "golden_record",
        "percolation_sweep",
        "dkw_check",
    ],
)
def test_wave49_partition_invariance(spark, qname):
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


def test_mde_matches_python(spark):
    from llmaix_spark.plans.queries import q_power_analysis_mde

    got = {r["nation"]: r for r in q_power_analysis_mde(spark, SF_DIR).collect()}

    m = _nation_orders(SF_DIR)
    for nat, g in m.groupby("n_name"):
        n = len(g)
        p = (g["o_orderpriority"] == "1-URGENT").sum() / n
        mde = (1.96 + 0.8416) * math.sqrt(2 * p * (1 - p) / (n / 2))
        r = got[nat]
        assert r["n_orders"] == n
        assert abs(r["base_rate"] - p) < 1e-6
        assert abs(r["mde_abs"] - mde) < 1e-6
        assert abs(r["mde_rel"] - mde / p) < 1e-5


def test_xcorr_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_xcorr_types

    got = {r["lag_days"]: r["xcorr"] for r in q_xcorr_types(spark, SF_DIR).collect()}

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e.assign(d=e["ts"].dt.date)
    spine = sorted(set(e["d"]))
    pc = Counter(e.loc[e.event_type == "purchase", "d"])
    cl = Counter(e.loc[e.event_type == "click", "d"])
    import datetime

    for lag in (0, 1, 2, 3):
        xs = [pc.get(d, 0) for d in spine]
        ys = [cl.get(d - datetime.timedelta(days=lag), 0) for d in spine]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        r = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)
        )
        assert abs(got[lag] - r) < 1e-6


def test_vr_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_variance_ratio

    got = {r["q"]: r for r in q_variance_ratio(spark, SF_DIR).collect()}

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    daily = sorted(Counter(o["o_orderdate"].dt.date).items())
    ys = [y for _, y in daily]

    def pvar(ds):
        n = len(ds)
        s = sum(ds)
        ss = sum(d * d for d in ds)
        return ss / n - (s / n) * (s / n)

    v1 = pvar([b - a for a, b in zip(ys, ys[1:])])
    for q in (2, 4, 8):
        dq = [ys[i] - ys[i - q] for i in range(q, len(ys))]
        g = got[q]
        assert g["n_obs"] == len(dq)
        assert abs(g["variance_ratio"] - pvar(dq) / (q * v1)) < 1e-6


def test_golden_record_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_golden_record

    row = q_golden_record(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    def shingles(text):
        toks = text.strip().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sh = {int(r.doc_id): shingles(r.text) for r in d.itertuples()}
    meta = {
        int(r.doc_id): (r.lang, r.source, int(r.n_chars))
        for r in d.itertuples()
    }
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
    groups = defaultdict(list)
    for i in ids:
        groups[find(i)].append(i)
    clusters = [g for g in groups.values() if len(g) >= 2]
    lc = sc = 0
    lr = 0
    for g in clusters:
        keeper = min(g)
        langs = Counter(meta[i][0] for i in g)
        srcs = Counter(meta[i][1] for i in g)
        ml = min(
            (l_ for l_ in langs if langs[l_] == max(langs.values())),
        )
        ms = min(
            (s_ for s_ in srcs if srcs[s_] == max(srcs.values())),
        )
        lc += meta[keeper][0] != ml
        sc += meta[keeper][1] != ms
        lr += _rnd(meta[keeper][2] * 1e6 / max(meta[i][2] for i in g))
    nc = len(clusters)
    assert row["n_clusters"] == nc
    assert abs(row["lang_conflict_share"] - lc / nc) < 1e-6
    assert abs(row["source_conflict_share"] - sc / nc) < 1e-6
    assert abs(row["mean_keeper_len_ratio"] - lr / (nc * 1e6)) < 1e-6


def test_percolation_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_percolation_sweep

    got = {r["w_min"]: tuple(r) for r in q_percolation_sweep(spark, SF_DIR).collect()}

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    edges: Counter = Counter()
    for _, g in li.groupby("l_orderkey"):
        mult = Counter(int(p) for p in g["l_partkey"])
        parts = sorted(mult)
        for i, a in enumerate(parts):
            for b in parts[i + 1 :]:
                edges[(a, b)] += mult[a] * mult[b]
    pop_nodes = {
        n for (a, b), w in edges.items() if w >= 2 for n in (a, b)
    }
    for wmin in (2, 3, 4):
        es = [(a, b) for (a, b), w in edges.items() if w >= wmin]
        nodes = {n for e_ in es for n in e_}
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in es:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comps = Counter(find(n) for n in nodes)
        g = got[wmin]
        assert g[1] == len(es)
        assert g[2] == len(nodes)
        assert g[3] == len(comps)
        largest = max(comps.values()) if comps else 0
        assert abs(g[4] - largest / len(pop_nodes)) < 1e-6


def test_dkw_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_dkw_check

    row = q_dkw_check(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    pairs = sorted(
        (_rnd(p * 100), int(k) % 2)
        for p, k in zip(o["o_totalprice"], o["o_orderkey"])
    )
    n1 = sum(1 for _, h in pairs if h == 0)
    n2 = len(pairs) - n1
    ca = cb = 0
    d = 0.0
    seen = {}
    for c, h in pairs:
        seen.setdefault(c, [0, 0])[h] += 1
    for c in sorted(seen):
        ca += seen[c][0]
        cb += seen[c][1]
        d = max(d, abs(ca / n1 - cb / n2))
    bound = math.sqrt(math.log(2 / 0.05) / (2 * n1)) + math.sqrt(
        math.log(2 / 0.05) / (2 * n2)
    )
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert abs(row["d_observed"] - d) < 1e-6
    assert abs(row["dkw_bound"] - bound) < 1e-6
