"""Plan pins, partition invariance, and python twins for the round-50
wave (PageRank convergence / disparate impact / intrinsic dimension /
dedup loss weights / kNN mutuality / Huffman bound).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _rnd(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


# ---------------------------------------------------------------------------
# structural properties


def test_convergence_geometric(spark):
    """The L1 delta must shrink every iteration — the evidence that
    the library's fixed-iteration contracts are honest."""
    from llmaix_spark.plans.queries import q_pagerank_convergence

    rows = sorted(tuple(r) for r in q_pagerank_convergence(spark, SF_DIR).collect())
    assert [r[0] for r in rows] == [1, 2, 3, 4]
    ds = [r[1] for r in rows]
    for a, b in zip(ds, ds[1:]):
        assert b < a
    # by iteration 4 the chain has essentially settled
    assert ds[-1] < 0.05 * ds[0]


def test_fairness_reference_group(spark):
    from llmaix_spark.plans.queries import q_fairness_disparate_impact

    rows = q_fairness_disparate_impact(spark, SF_DIR).collect()
    assert len(rows) == 25
    # exactly the max-rate group(s) hit ratio 1.0; none exceed it
    assert max(r["di_ratio"] for r in rows) == 1.0
    for r in rows:
        assert 0 <= r["di_ratio"] <= 1
        assert r["four_fifths_violation"] == (r["di_ratio"] < 0.8)


def test_intrinsic_dimension_sane(spark):
    """Random 64-dim embeddings have high intrinsic dimension — the
    estimate must land well above 1 and at most ~dim."""
    from llmaix_spark.plans.queries import q_intrinsic_dimension

    row = q_intrinsic_dimension(spark, SF_DIR).collect()[0]
    assert row["n_points"] + row["n_exact_dups"] > 0
    assert 1.0 < row["id_twonn"] <= 128.0
    assert row["mean_ln_mu"] > 0


def test_ess_bounds(spark):
    from llmaix_spark.plans.queries import q_dedup_loss_weights

    row = q_dedup_loss_weights(spark, SF_DIR).collect()[0]
    # ESS sits between the cluster count and the raw doc count
    assert row["n_clusters"] <= row["effective_sample_size"] + 1e-6
    assert row["effective_sample_size"] <= row["n_docs"] + 1e-6
    assert 0 < row["ess_ratio"] <= 1


def test_mutuality_bounds(spark):
    from llmaix_spark.plans.queries import q_knn_mutuality

    row = q_knn_mutuality(spark, SF_DIR).collect()[0]
    assert row["n_edges"] == row["n_nodes"] * row["k"]
    assert 0 <= row["n_mutual"] <= row["n_edges"]
    assert abs(row["mutual_share"] - row["n_mutual"] / row["n_edges"]) < 1e-6


def test_huffman_sandwich(spark):
    """Shannon: H ≤ Huffman average ≤ H + 1, and never worse than
    the fixed-width code."""
    from llmaix_spark.plans.queries import q_huffman_bound

    row = q_huffman_bound(spark, SF_DIR).collect()[0]
    assert row["entropy_bits"] <= row["huffman_avg_bits"] + 1e-6
    assert row["huffman_avg_bits"] <= row["entropy_bits"] + 1 + 1e-6
    assert row["huffman_avg_bits"] <= row["fixed_bits"] + 1e-6
    assert 0 < row["efficiency"] <= 1


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "pagerank_convergence",
        "fairness_disparate_impact",
        "intrinsic_dimension",
        "dedup_loss_weights",
        "knn_mutuality",
        "huffman_bound",
    ],
)
def test_wave50_partition_invariance(spark, qname):
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


def test_fairness_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_fairness_disparate_impact

    got = {r["nation"]: r for r in q_fairness_disparate_impact(spark, SF_DIR).collect()}

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    n = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    rates = {}
    for nat, g in m.groupby("n_name"):
        sel = sum(1 for p in g["o_totalprice"] if _rnd(p * 100) >= 15_000_000)
        rates[nat] = (len(g), sel, round(sel / len(g), 9))
    mr = max(r for _, _, r in rates.values())
    for nat, (nn, sel, r9) in rates.items():
        g = got[nat]
        assert g["n_orders"] == nn
        assert abs(g["selection_rate"] - sel / nn) < 1e-6
        assert abs(g["di_ratio"] - round(r9 / mr, 6)) < 1e-9


def test_intrinsic_dim_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_intrinsic_dimension

    row = q_intrinsic_dimension(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    q = {
        int(r.vec_id): [_rnd(float(v) * 1e6) for v in r.embedding]
        for r in e.itertuples()
    }
    ids = sorted(q)
    s = 0
    n_valid = 0
    dups = 0
    for a in ids:
        ds = sorted(
            (
                float(sum((x - y) ** 2 for x, y in zip(q[a], q[b]))),
                b,
            )
            for b in ids
            if b != a
        )
        d1, d2 = ds[0][0], ds[1][0]
        if d1 <= 0:
            dups += 1
            continue
        n_valid += 1
        s += _rnd(0.5 * math.log(d2 / d1) * 1e9)
    assert (row["n_points"], row["n_exact_dups"]) == (n_valid, dups)
    assert abs(row["id_twonn"] - n_valid * 1e9 / s) < 1e-4
    assert abs(row["mean_ln_mu"] - s / (n_valid * 1e9)) < 1e-6


def test_ess_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_dedup_loss_weights

    row = q_dedup_loss_weights(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    def shingles(text):
        toks = text.strip().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sh = {int(r.doc_id): shingles(r.text) for r in d.itertuples()}
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
    sizes = Counter(find(i) for i in ids)
    inv = sum(_rnd(1e9 / sz) for sz in sizes.values())
    nc = len(sizes)
    assert row["n_docs"] == len(ids)
    assert row["n_clusters"] == nc
    assert abs(row["effective_sample_size"] - nc * nc * 1e9 / inv) < 1e-4
    assert abs(row["ess_ratio"] - nc * nc * 1e9 / inv / len(ids)) < 1e-6


def test_mutuality_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_knn_mutuality

    row = q_knn_mutuality(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    q = {
        int(r.vec_id): [_rnd(float(v) * 1e6) for v in r.embedding]
        for r in e.itertuples()
    }
    ids = sorted(q)
    norms = {v: math.sqrt(sum(x * x for x in vec)) for v, vec in q.items()}
    edges = set()
    for a in ids:
        cos = sorted(
            (
                -_rnd(
                    sum(x * y for x, y in zip(q[a], q[b]))
                    / (norms[a] * norms[b])
                    * 1e6
                ),
                b,
            )
            for b in ids
            if b != a
        )
        for _, b in cos[:3]:
            edges.add((a, b))
    mutual = sum(1 for a, b in edges if (b, a) in edges)
    assert row["n_edges"] == len(edges)
    assert row["n_mutual"] == mutual


def test_huffman_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_huffman_bound

    row = q_huffman_bound(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    cnt = Counter(e["event_type"])
    n = sum(cnt.values())
    heap = sorted((w, s) for s, w in cnt.items())
    internal = 0
    while len(heap) > 1:
        (w1, s1), (w2, s2) = heap[0], heap[1]
        internal += w1 + w2
        heap = sorted(heap[2:] + [(w1 + w2, s1 + "|" + s2)])
    h = sum(
        _rnd(-(w / n) * (math.log(w / n) / math.log(2)) * 1e9)
        for w in cnt.values()
    ) / 1e9
    assert row["n_symbols"] == len(cnt)
    assert row["n_events"] == n
    assert abs(row["entropy_bits"] - h) < 1e-6
    assert abs(row["huffman_avg_bits"] - internal / n) < 1e-6
    assert row["fixed_bits"] == math.ceil(math.log2(len(cnt)))


def test_convergence_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_pagerank_convergence

    got = {r["iteration"]: r["l1_delta"] for r in q_pagerank_convergence(spark, SF_DIR).collect()}

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    co = set()
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(set(int(p) for p in g["l_partkey"]))
        for a in parts:
            for b in parts:
                if a != b:
                    co.add((a, b))
    nodes = sorted({s for s, _ in co})
    n = len(nodes)
    od = Counter(s for s, _ in co)
    tele = _rnd(0.15 * 1e9 / n)
    pr = {v: 10**9 // n for v in nodes}
    for it in range(1, 5):
        contrib: Counter = Counter()
        for s, d_ in co:
            contrib[d_] += _rnd(pr[s] * 0.85 / od[s])
        new_pr = {v: tele + contrib.get(v, 0) for v in nodes}
        delta = sum(abs(new_pr[v] - pr[v]) for v in nodes)
        assert abs(got[it] - round(delta / 1e9, 6)) < 1e-9
        pr = new_pr
