"""Plan pins, partition invariance, and python twins for the round-31
wave (session bookends / cross-lang dups / velocity by size / lang-ID
confusion / gap skewness / return by latency).
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


def test_bookends_user_partitioned_windows(spark):
    from llmaix_spark.plans.queries import q_session_bookends

    plan = _phys(q_session_bookends(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "Join" not in plan


def test_crosslang_lang_sides_broadcast(spark):
    from llmaix_spark.plans.queries import q_crosslang_dups

    plan = _phys(q_crosslang_dups(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_velocity_dim_broadcast(spark):
    from llmaix_spark.plans.queries import q_velocity_by_size

    plan = _phys(q_velocity_by_size(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_confusion_row_totals_broadcast(spark):
    from llmaix_spark.plans.queries import q_langid_confusion

    plan = _phys(q_langid_confusion(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_skewness_single_lag_window(spark):
    from llmaix_spark.plans.queries import q_gap_skewness

    plan = _phys(q_gap_skewness(spark, SF_DIR))
    assert plan.count("Window [") == 1
    assert "rangepartitioning" not in plan


def test_return_latency_no_window(spark):
    from llmaix_spark.plans.queries import q_return_by_latency

    plan = _phys(q_return_by_latency(spark, SF_DIR))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "session_bookends",
        "crosslang_dups",
        "velocity_by_size",
        "langid_confusion",
        "gap_skewness",
        "return_by_latency",
    ],
)
def test_wave31_partition_invariance(spark, qname):
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


def test_bookends_match_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_session_bookends

    got = {
        (r["first_type"], r["last_type"]): r["n_sessions"]
        for r in q_session_bookends(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["sec"] = e["ts"].astype("int64") // 1_000_000
    want: dict[tuple, int] = {}
    total_sessions = 0
    for _, g in e.groupby("user_id"):
        g = g.sort_values(["sec", "event_id"])
        rows = list(zip(g["sec"], g["event_type"]))
        sessions = []
        cur = [rows[0][1]]
        for (pa, _), (pb, tb) in zip(rows, rows[1:]):
            if pb - pa > 1800:
                sessions.append(cur)
                cur = [tb]
            else:
                cur.append(tb)
        sessions.append(cur)
        for s in sessions:
            key = (s[0], s[-1])
            want[key] = want.get(key, 0) + 1
            total_sessions += 1
    assert got == want
    assert sum(got.values()) == total_sessions


def _shingles(text: str, n: int = 3) -> set:
    toks = text.strip().split()
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


def test_crosslang_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_crosslang_dups

    got = {
        (r["doc_a"], r["doc_b"]): (
            r["lang_a"],
            r["lang_b"],
            r["cross_lang"],
        )
        for r in q_crosslang_dups(spark, SF_DIR).collect()
    }
    assert got

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sh = {int(r.doc_id): _shingles(r.text) for r in d.itertuples()}
    lang = dict(zip(d["doc_id"], d["lang"]))
    ids = sorted(sh)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                want[(a, b)] = (lang[a], lang[b], lang[a] != lang[b])
    assert got == want
    # the finding the query exists for: cross-language dups are real
    assert any(v[2] for v in got.values())


def test_velocity_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_velocity_by_size

    got = {
        r["size_band"]: (r["n_lines"], r["total_qty"], r["mean_qty"])
        for r in q_velocity_by_size(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    p = pd.read_parquet(f"{SF_DIR}/part.parquet")
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j["q"] = np.floor(j["l_quantity"] + 0.5).astype(int)
    j["band"] = (j["p_size"] - 1) // 10
    for band, g in j.groupby("band"):
        n, tq = len(g), int(g["q"].sum())
        gn, gt, gm = got[band]
        assert (gn, gt) == (n, tq)
        assert abs(gm - tq / n) < 1e-6


def test_confusion_matches_python(spark):
    from llmaix_spark.plans.queries import (
        q_langid_confusion,
        q_metrics_stringmatch,
    )

    rows = q_langid_confusion(spark, SF_DIR).collect()
    got = {(r["truth"], r["pred"]): (r["n"], r["row_share"]) for r in rows}

    # row shares sum to 1 within each truth class
    by_truth: dict[str, float] = {}
    for (truth, _), (_, share) in got.items():
        by_truth[truth] = by_truth.get(truth, 0.0) + share
    for s in by_truth.values():
        assert abs(s - 1.0) < 1e-4
    # the diagonal of the matrix must reproduce metrics_stringmatch
    acc = {
        r["label"]: r["accuracy"]
        for r in q_metrics_stringmatch(spark, SF_DIR).collect()
    }
    for truth in by_truth:
        diag = got.get((truth, truth), (0, 0.0))[1]
        assert abs(diag - acc[truth]) < 1e-4


def test_skewness_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_gap_skewness

    got = {
        r["seg"]: (r["n"], r["mean_gap"], r["skewness"])
        for r in q_gap_skewness(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    o["d"] = o["o_orderdate"].astype("int64") // DAY_US
    seg = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    gaps: dict[str, list[int]] = {}
    for ck, g in o.groupby("o_custkey"):
        ds = sorted(g["d"])
        for a, b in zip(ds, ds[1:]):
            if b - a > 0:
                gaps.setdefault(seg[ck], []).append(b - a)
    for sg, v in gaps.items():
        n = len(v)
        m1 = sum(v) / n
        m2 = sum(x * x for x in v) / n
        m3 = sum(x**3 for x in v) / n
        skew = (m3 - 3 * m1 * m2 + 2 * m1**3) / (m2 - m1 * m1) ** 1.5
        gn, gm, gs = got[sg]
        assert gn == n
        assert abs(gm - m1) < 1e-6
        assert abs(gs - skew) < 1e-4
        # reorder gaps are right-tailed on this fixture
        assert gs > 0


def test_return_latency_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_return_by_latency

    got = {
        r["band"]: (r["n_lines"], r["n_returned"], r["return_rate"])
        for r in q_return_by_latency(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["lat"] = (
        j["l_shipdate"].astype("int64") // DAY_US
        - j["o_orderdate"].astype("int64") // DAY_US
    )
    j["band"] = [
        -1 if lat < 0 else min(lat // 30, 4) for lat in j["lat"]
    ]
    j["ret"] = j["l_returnflag"] == "R"
    for band, g in j.groupby("band"):
        n, r = len(g), int(g["ret"].sum())
        gn, gr, grate = got[band]
        assert (gn, gr) == (n, r)
        assert abs(grate - r / n) < 1e-6
    # the DQ band for ship-before-order rows is isolated, not merged
    assert -1 in got
