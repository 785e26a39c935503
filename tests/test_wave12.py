"""Plan pins, partition invariance, and python twins for the round-12
wave (bigram PMI / linear interpolation / bounce-exit funnels /
reorder crossing / vocab coverage / padding waste).
"""

from __future__ import annotations

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_bigram_pmi_topk_and_broadcasts(spark):
    """Unigram sides and both grand totals broadcast; the top-25 is a
    TakeOrderedAndProject, never a global sort of the scored stream."""
    from llmaix_spark.plans.queries import q_bigram_pmi

    plan = _phys(q_bigram_pmi(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastExchange") >= 2
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_interpolate_linear_shuffle_budget(spark):
    """Two exchanges max: the (supplier, day) rollup and the
    supplier-keyed window re-cluster; the gap explode adds none."""
    from llmaix_spark.plans.queries import q_interpolate_linear

    plan = _phys(q_interpolate_linear(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "rangepartitioning" not in plan


def test_inventory_reorder_single_exchange(spark):
    """The cumulative window consumes the scan directly — one shuffle
    on l_partkey, and the crossing filter is algebraic (no second
    min()-pass that would re-derive the window branch)."""
    from llmaix_spark.plans.queries import q_inventory_reorder

    plan = _phys(q_inventory_reorder(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "rangepartitioning" not in plan


def test_vocab_coverage_window_on_rollup_only(spark):
    """The raw token stream must pass a hash aggregate BEFORE the
    single-partition ranking window (the window input is the
    vocabulary-sized rollup, not the corpus)."""
    from llmaix_spark.plans.queries import q_vocab_coverage

    plan = _phys(q_vocab_coverage(spark, SF_DIR))
    i_agg = plan.find("HashAggregate")
    i_win = plan.find("Window")
    assert i_agg != -1 and i_win != -1
    # executed plans print top-down: the Window consumes the aggregate
    assert i_win < i_agg
    assert "rangepartitioning" not in plan


def test_padding_waste_single_aggregate(spark):
    from llmaix_spark.plans.queries import q_padding_waste

    plan = _phys(q_padding_waste(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "bigram_pmi",
        "interpolate_linear",
        "pages_bounce_exit",
        "inventory_reorder",
        "vocab_coverage",
        "padding_waste",
    ],
)
def test_wave12_partition_invariance(spark, qname):
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


def _docs_tokens():
    import pandas as pd

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    return [t.split(" ") for t in d["text"]]


def test_bigram_pmi_matches_python(spark):
    from collections import Counter

    from llmaix_spark.plans.queries import q_bigram_pmi

    got = [
        (r["a"], r["b"], r["n_ab"], r["pmi_ratio"])
        for r in q_bigram_pmi(spark, SF_DIR).collect()
    ]

    toks = _docs_tokens()
    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in toks:
        uni.update(t)
        bi.update(zip(t, t[1:]))
    bi = Counter({k: v for k, v in bi.items() if v >= 5})
    n1 = sum(uni.values())
    nb = sum(bi.values())
    scored = sorted(
        (
            (
                -round(n1 * n1 * c / (nb * uni[a] * uni[b]), 6),
                a,
                b,
                c,
            )
            for (a, b), c in bi.items()
        )
    )[:25]
    want = [(a, b, c, -r) for r, a, b, c in scored]
    assert got == want


def test_interpolate_linear_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_interpolate_linear

    got = {
        (r["l_suppkey"], r["day"]): r["qty_interp"]
        for r in q_interpolate_linear(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["day"] = li["l_shipdate"].astype("int64") // DAY_US
    li["qty"] = li["l_quantity"].round().astype(int)
    daily = (
        li.groupby(["l_suppkey", "day"])["qty"].sum().reset_index()
    )
    want = {}
    for sk, g in daily.groupby("l_suppkey"):
        pts = sorted(zip(g["day"].astype(int), g["qty"].astype(int)))
        for (d1, v1), (d2, v2) in zip(pts, pts[1:]):
            for dd in range(d1 + 1, d2):
                want[(sk, dd)] = round(
                    (v1 * (d2 - dd) + v2 * (dd - d1)) / (d2 - d1), 6
                )
    assert got == want


def test_pages_bounce_exit_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_pages_bounce_exit

    got = {
        r["event_type"]: (
            r["entered"],
            r["bounces"],
            r["exits"],
            r["bounce_rate"],
            r["exit_share"],
        )
        for r in q_pages_bounce_exit(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    sessions = []
    for _, g in e.groupby("user_id"):
        cur = []
        prev = None
        for _, r in g.iterrows():
            sec = r["ts"].value // 1_000_000_000
            if prev is not None and sec - prev > 1800:
                sessions.append(cur)
                cur = []
            cur.append(r["event_type"])
            prev = sec
        sessions.append(cur)
    total = len(sessions)
    types = sorted(e["event_type"].unique())
    for ty in types:
        entered = sum(1 for s in sessions if s[0] == ty)
        bounces = sum(1 for s in sessions if s[0] == ty and len(s) == 1)
        exits = sum(1 for s in sessions if s[-1] == ty)
        ge, gb, gx, gbr, ges = got[ty]
        assert (ge, gb, gx) == (entered, bounces, exits)
        if entered:
            assert abs(gbr - bounces / entered) < 1e-6
        else:
            assert gbr is None
        assert abs(ges - exits / total) < 1e-6
    # every session enters and exits exactly once
    assert sum(v[0] for v in got.values()) == total
    assert sum(v[2] for v in got.values()) == total


def test_inventory_reorder_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_inventory_reorder

    got = {
        r["l_partkey"]: (r["cross_day"], r["cum_qty"])
        for r in q_inventory_reorder(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["day"] = li["l_shipdate"].astype("int64") // DAY_US
    li["qty"] = li["l_quantity"].round().astype(int)
    want = {}
    for pk, g in li.groupby("l_partkey"):
        g = g.sort_values(["day", "l_orderkey", "l_linenumber"])
        cum = 0
        for _, r in g.iterrows():
            cum += r["qty"]
            if cum >= 100:
                want[pk] = (int(r["day"]), cum)
                break
    assert got == want


def test_vocab_coverage_matches_python(spark):
    from collections import Counter

    from llmaix_spark.plans.queries import q_vocab_coverage

    got = {
        r["vocab_size"]: (r["covered"], r["coverage"])
        for r in q_vocab_coverage(spark, SF_DIR).collect()
    }

    uni: Counter = Counter()
    for t in _docs_tokens():
        uni.update(t)
    ranked = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(uni.values())
    cum = 0
    want = {}
    for i, (_, c) in enumerate(ranked, start=1):
        cum += c
        if i & (i - 1) == 0:
            want[i] = (cum, round(cum / total, 6))
    assert got == want
    # the curve is monotone and ends ≤ 1
    cov = [v[1] for _, v in sorted(got.items())]
    assert cov == sorted(cov) and cov[-1] <= 1.0


def test_padding_waste_matches_python(spark):
    from collections import defaultdict

    from llmaix_spark.plans.queries import q_padding_waste

    got = {
        r["bucket"]: (
            r["n_docs"],
            r["n_tokens"],
            r["n_pad"],
            r["waste_share"],
        )
        for r in q_padding_waste(spark, SF_DIR).collect()
    }

    agg = defaultdict(lambda: [0, 0, 0])
    for t in _docs_tokens():
        n = len(t)
        b = 1
        while b < n:
            b *= 2
        agg[b][0] += 1
        agg[b][1] += n
        agg[b][2] += b - n
    want = {
        b: (d, tok, pad, round(pad / (pad + tok), 6))
        for b, (d, tok, pad) in agg.items()
    }
    assert got == want
    # waste is bounded by half of padded capacity (power-of-two buckets)
    assert all(np.isclose(v[3], v[2] / (v[2] + v[1])) for v in got.values())
