"""Plan pins, partition invariance, and python twins for the round-14
wave (daily ACF / centroid cosine confusion / duplicate shipments /
Zipf fit / lexical richness / class weights).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_acf_lag_join_broadcasts(spark):
    """The lag pair join runs on the calendar-bounded daily rollup and
    broadcasts — an equi join on day+lag, never a cartesian sweep."""
    from llmaix_spark.plans.queries import q_acf_daily

    plan = _phys(q_acf_daily(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "rangepartitioning" not in plan


def test_centroid_cosine_broadcast_self_join(spark):
    from llmaix_spark.plans.queries import q_label_centroid_cosine

    plan = _phys(q_label_centroid_cosine(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_duplicate_shipments_equi_join(spark):
    """The pair join must key on (partkey, qty) — band and ordering
    ride as residual filters, never a cartesian/range join."""
    from llmaix_spark.plans.queries import q_duplicate_shipments

    plan = _phys(q_duplicate_shipments(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_zipf_window_on_rollup(spark):
    from llmaix_spark.plans.queries import q_zipf_fit

    plan = _phys(q_zipf_fit(spark, SF_DIR))
    i_win = plan.find("Window")
    i_agg = plan.rfind("HashAggregate")
    assert i_win != -1 and i_agg != -1
    # bottom-most aggregate (the token rollup) sits below the window
    assert i_agg > i_win
    assert "rangepartitioning" not in plan


def test_lexical_and_weights_no_window(spark):
    from llmaix_spark.plans.queries import q_class_weights, q_lexical_richness

    for q in (q_lexical_richness, q_class_weights):
        plan = _phys(q(spark, SF_DIR))
        assert "Window" not in plan
        assert "rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "acf_daily",
        "label_centroid_cosine",
        "duplicate_shipments",
        "zipf_fit",
        "lexical_richness",
        "class_weights",
    ],
)
def test_wave14_partition_invariance(spark, qname):
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


def test_acf_matches_numpy(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_acf_daily

    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in q_acf_daily(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["day"] = o["o_orderdate"].astype("int64") // DAY_US
    o["cents"] = (o["o_totalprice"] * 100).round().astype(int)
    daily = o.groupby("day")["cents"].sum()
    days = set(daily.index)
    for k in range(1, 8):
        pairs = [
            (int(daily[d]), int(daily[d + k]))
            for d in sorted(days)
            if d + k in days
        ]
        x = np.array([p[0] for p in pairs], dtype=float)
        y = np.array([p[1] for p in pairs], dtype=float)
        r = float(np.corrcoef(x, y)[0, 1])
        n, acf = got[k]
        assert n == len(pairs)
        assert abs(acf - r) < 1e-6


def test_centroid_cosine_matches_numpy(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_label_centroid_cosine

    got = {
        (r["la"], r["lb"]): r["cos"]
        for r in q_label_centroid_cosine(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    sums = {}
    for lbl, g in e.groupby("label"):
        m = np.vstack(
            [
                np.round(np.asarray(v, dtype=np.float64) * 1_000_000)
                for v in g["embedding"]
            ]
        )
        sums[int(lbl)] = m.sum(axis=0)
    labels = sorted(sums)
    assert len(got) == len(labels) * (len(labels) - 1) // 2
    for i, la in enumerate(labels):
        for lb in labels[i + 1 :]:
            a, b = sums[la], sums[lb]
            c = float(a @ b) / (
                math.sqrt(float(a @ a)) * math.sqrt(float(b @ b))
            )
            assert abs(got[(la, lb)] - c) < 1e-6


def test_duplicate_shipments_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_duplicate_shipments

    got = {
        (r["o1"], r["ln1"], r["o2"], r["ln2"]): (
            r["l_partkey"],
            r["qty"],
            r["day_diff"],
        )
        for r in q_duplicate_shipments(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["day"] = li["l_shipdate"].astype("int64") // DAY_US
    li["qty"] = li["l_quantity"].round().astype(int)
    want = {}
    for (pk, q), g in li.groupby(["l_partkey", "qty"]):
        rows = list(
            g[["l_orderkey", "l_linenumber", "day"]].itertuples(
                index=False
            )
        )
        for x in rows:
            for y in rows:
                if (x[0], x[1]) < (y[0], y[1]) and abs(x[2] - y[2]) <= 1:
                    want[(x[0], x[1], y[0], y[1])] = (
                        pk,
                        q,
                        int(y[2] - x[2]),
                    )
    assert got == want


def test_zipf_matches_python(spark):
    from collections import Counter

    import pandas as pd

    from llmaix_spark.plans.queries import q_zipf_fit

    row = q_zipf_fit(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    uni: Counter = Counter()
    for t in d["text"]:
        uni.update(t.split(" "))
    ranked = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))
    mx = [
        int(round(round(math.log10(i), 6) * 1_000_000))
        for i in range(1, len(ranked) + 1)
    ]
    my = [
        int(round(round(math.log10(c), 6) * 1_000_000))
        for _, c in ranked
    ]
    n = len(mx)
    sx, sy = sum(mx), sum(my)
    sxy = sum(a * b for a, b in zip(mx, my))
    sxx = sum(a * a for a in mx)
    syy = sum(b * b for b in my)
    num = float(n * sxy - sx * sy)
    dx = float(n * sxx - sx * sx)
    dy = float(n * syy - sy * sy)
    assert row["n_types"] == n
    assert abs(row["zipf_slope"] - num / dx) < 2e-6
    assert abs(row["r2"] - (num / dx) * (num / dy)) < 2e-6
    # a frequency-ranked corpus always slopes down
    assert row["zipf_slope"] < 0
    assert 0 <= row["r2"] <= 1


def test_lexical_richness_matches_python(spark):
    from collections import Counter

    import pandas as pd

    from llmaix_spark.plans.queries import q_lexical_richness

    got = {
        r["source"]: (r["n_tokens"], r["n_types"], r["n_hapax"], r["ttr"])
        for r in q_lexical_richness(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    for src, g in d.groupby("source"):
        c: Counter = Counter()
        for t in g["text"]:
            c.update(t.split(" "))
        n_tok = sum(c.values())
        n_typ = len(c)
        hapax = sum(1 for v in c.values() if v == 1)
        gt, gy, gh, gr = got[src]
        assert (gt, gy, gh) == (n_tok, n_typ, hapax)
        assert abs(gr - n_typ / n_tok) < 1e-6


def test_class_weights_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_class_weights

    got = {
        r["label"]: (r["n"], r["weight"])
        for r in q_class_weights(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    counts = e.groupby("label").size()
    total = int(counts.sum())
    k = len(counts)
    for lbl, n in counts.items():
        gn, gw = got[int(lbl)]
        assert gn == int(n)
        assert abs(gw - total / (k * n)) < 1e-6
    # loss-balancing invariant: sum of w_c * n_c = N
    assert abs(sum(n * w for n, w in got.values()) - total) < 1e-2
