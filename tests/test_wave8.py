"""Plan-shape pins, partition invariance, and python twins for the
round-8 wave (apportionment / densification / rank migration /
skyline / quantile normalization / novelty).
"""

from __future__ import annotations

import math

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_skyline_no_global_sort_no_cartesian(spark):
    """The two-level skyline never range-partitions the fact rows and
    never falls back to a cartesian product; the slab-summary prefix
    max joins back via broadcast."""
    from llmaix_spark.plans.queries import q_skyline_parts

    plan = _phys(q_skyline_parts(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_gap_fill_spine_bounds_broadcast(spark):
    """Spine bounds and the day sequence ride broadcasts — the
    densification join is spine-sized, not fact-sized."""
    from llmaix_spark.plans.queries import q_gap_fill_daily

    plan = _phys(q_gap_fill_daily(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_novelty_two_exchanges(spark):
    """(user,type) first-seen rollup then per-user rank: exactly two
    hash exchanges, no global sort."""
    from llmaix_spark.plans.queries import q_events_novelty

    plan = _phys(q_events_novelty(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "apportionment_seats",
        "gap_fill_daily",
        "rank_migration",
        "skyline_parts",
        "quantile_normalize",
        "events_novelty",
    ],
)
def test_wave8_partition_invariance(spark, qname):
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


def test_apportionment_matches_python_hamilton(spark):
    from llmaix_spark.plans.queries import q_apportionment_seats

    got = {
        r["n_name"]: (r["n_custs"], r["base_seats"], r["extra"], r["seats"])
        for r in q_apportionment_seats(spark, SF_DIR).collect()
    }
    assert sum(v[3] for v in got.values()) == 100

    import pandas as pd

    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nat = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    m = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    counts = m.groupby("n_name").size().to_dict()
    tot = sum(counts.values())
    base = {k: (v * 100) // tot for k, v in counts.items()}
    rem = {k: (v * 100) % tot for k, v in counts.items()}
    left = 100 - sum(base.values())
    order = sorted(counts, key=lambda k: (-rem[k], k))
    extra = {k: 1 if i < left else 0 for i, k in enumerate(order)}
    want = {
        k: (counts[k], base[k], extra[k], base[k] + extra[k])
        for k in counts
    }
    assert got == want


def test_gap_fill_matches_python_spine(spark):
    from llmaix_spark.plans.queries import q_gap_fill_daily

    got = {
        r["event_type"]: (
            r["n_days"],
            r["missing_days"],
            r["max_missing_run"],
            r["total_cents"],
        )
        for r in q_gap_fill_daily(spark, SF_DIR).collect()
    }

    import pandas as pd

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["dayn"] = e["ts"].astype("int64") // 86_400_000_000
    e["cents"] = (e["value"] * 100).round().astype(int)
    lo, hi = int(e["dayn"].min()), int(e["dayn"].max())
    want = {}
    for ty, g in e.groupby("event_type"):
        present = set(g["dayn"].astype(int))
        missing = [d for d in range(lo, hi + 1) if d not in present]
        runs, cur, prev = [], 0, None
        for d in missing:
            cur = cur + 1 if prev is not None and d == prev + 1 else 1
            runs.append(cur)
            prev = d
        want[ty] = (
            hi - lo + 1,
            len(missing),
            max(runs) if runs else 0,
            int(g["cents"].sum()),
        )
    assert got == want


def _ntile10(sorted_keys):
    """SQL-standard ntile(10): first n%10 buckets take ceil(n/10)."""
    n = len(sorted_keys)
    q, r = divmod(n, 10)
    out, i = {}, 0
    for b in range(1, 11):
        size = q + (1 if b <= r else 0)
        for k in sorted_keys[i:i + size]:
            out[k] = b
        i += size
    return out


def test_rank_migration_matches_python_ntile(spark):
    from llmaix_spark.plans.queries import q_rank_migration

    got = {
        (r["decile_h1"], r["decile_h2"]): r["n_customers"]
        for r in q_rank_migration(spark, SF_DIR).collect()
    }

    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["dayn"] = o["o_orderdate"].astype("int64") // 86_400_000_000
    o["cents"] = (o["o_totalprice"] * 100).round().astype(int)
    mid = int(o["dayn"].min()) + (int(o["dayn"].max()) - int(o["dayn"].min())) // 2
    dec = {}
    for half, g in [
        (1, o[o["dayn"] <= mid]),
        (2, o[o["dayn"] > mid]),
    ]:
        rev = g.groupby("o_custkey")["cents"].sum()
        keys = sorted(rev.index, key=lambda k: (rev[k], k))
        dec[half] = _ntile10(keys)
    want = {}
    for c, d1 in dec[1].items():
        if c in dec[2]:
            key = (d1, dec[2][c])
            want[key] = want.get(key, 0) + 1
    assert got == want


def test_skyline_matches_bruteforce_dominance(spark):
    from llmaix_spark.plans.queries import q_skyline_parts

    got = sorted(
        (r["p_partkey"], r["price_cents"], r["p_size"])
        for r in q_skyline_parts(spark, SF_DIR).collect()
    )

    import pandas as pd

    p = pd.read_parquet(f"{SF_DIR}/part.parquet")
    pts = [
        (int(k), int(round(pr * 100)), int(s))
        for k, pr, s in zip(p["p_partkey"], p["p_retailprice"], p["p_size"])
    ]
    want = sorted(
        a
        for a in pts
        if not any(b[1] < a[1] and b[2] > a[2] for b in pts)
    )
    assert got == want


def test_quantile_normalize_matches_python_ranks(spark):
    from llmaix_spark.plans.queries import q_quantile_normalize

    got = {
        r["c_mktsegment"]: (
            r["n_rows"],
            r["sum_norm_cents"],
            r["min_norm_cents"],
            r["max_norm_cents"],
        )
        for r in q_quantile_normalize(spark, SF_DIR).collect()
    }

    import pandas as pd

    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    c["cents"] = (c["c_acctbal"] * 100).round().astype(int)
    g_sorted = sorted(zip(c["cents"], c["c_custkey"]))
    gvals = [v for v, _ in g_sorted]
    n = len(gvals)
    want = {}
    for seg, g in c.groupby("c_mktsegment"):
        keys = sorted(zip(g["cents"], g["c_custkey"]))
        ng = len(keys)
        norm = [
            gvals[math.ceil((i * n) / ng) - 1]
            for i in range(1, ng + 1)
        ]
        want[seg] = (ng, sum(norm), min(norm), max(norm))
    assert got == want

    # the point of the op: every segment now has the same min/max span
    mins = {v[2] for v in got.values()}
    maxs = {v[3] for v in got.values()}
    assert len(maxs) == 1


def test_events_novelty_matches_python(spark):
    from llmaix_spark.plans.queries import q_events_novelty

    got = {
        r["user_id"]: (r["distinct_types"], r["half_rank"], r["half_day"])
        for r in q_events_novelty(spark, SF_DIR).collect()
    }

    import pandas as pd

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["dayn"] = e["ts"].astype("int64") // 86_400_000_000
    fs = (
        e.groupby(["user_id", "event_type"])["dayn"].min().reset_index()
    )
    want = {}
    for u, g in fs.groupby("user_id"):
        pairs = sorted(zip(g["dayn"].astype(int), g["event_type"]))
        nt = len(pairs)
        half = (nt + 1) // 2
        want[int(u)] = (nt, half, pairs[half - 1][0])
    assert got == want
