"""Plan-shape pins, partition invariance, and brute-force python twins
for the round-7 wave (interval coverage / FIFO allocation / Gini /
grid spatial join / KG negative sampling / Benford audit).

Doctrine (test_wave5_plans): every 100 TB claim in a docstring gets a
physical-plan assertion; every result that could look fold-order- or
rank-sensitive is replayed at two shuffle widths; and each non-trivial
algorithm gets an exhaustive python twin on the sf0.001 tables.
"""

from __future__ import annotations

import hashlib

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# plan pins


def test_interval_coverage_single_exchange(spark):
    """Both windows and BOTH downstream aggregates ride ONE
    hashpartitioning(user_id) exchange + ONE sort — the island rollup
    and the per-user rollup must reuse the window partitioning."""
    from llmaix_spark.plans.queries import q_interval_coverage

    plan = _phys(q_interval_coverage(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("+- Sort ") == 1
    assert "rangepartitioning" not in plan


def test_fifo_allocation_single_exchange(spark):
    """row_number, cumulative-before, partition total and the final
    per-part rollup all ride one hashpartitioning(l_partkey)."""
    from llmaix_spark.plans.queries import q_fifo_allocation

    plan = _phys(q_fifo_allocation(spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("+- Sort ") == 1
    assert "rangepartitioning" not in plan


def test_geo_grid_join_is_not_cartesian(spark):
    """The distance self-join must go through the cell-key equi-join
    (9x bounded replication), never a cartesian/broadcast-nested-loop
    product."""
    from llmaix_spark.plans.queries import q_geo_grid_join

    plan = _phys(q_geo_grid_join(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kg_negative_samples_anti_join_and_broadcast_max(spark):
    """Candidates are filtered by a LeftAnti join against positives;
    the max-partkey scalar rides a broadcast, not a shuffle."""
    from llmaix_spark.plans.queries import q_kg_negative_samples

    plan = _phys(q_kg_negative_samples(spark, SF_DIR))
    assert "LeftAnti" in plan
    assert "BroadcastExchange" in plan


def test_benford_total_rides_broadcast(spark):
    """The 1-row total joins the 9-row digit rollup via broadcast."""
    from llmaix_spark.plans.queries import q_benford_digits

    plan = _phys(q_benford_digits(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# partition invariance (island identity, FIFO clamp, rank formula,
# pair counting and hash sampling are all total / order-invariant)


@pytest.mark.parametrize(
    "qname",
    [
        "interval_coverage",
        "fifo_allocation",
        "revenue_gini",
        "geo_grid_join",
        "kg_negative_samples",
        "benford_digits",
    ],
)
def test_wave7_partition_invariance(spark, qname):
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
# python twins (exhaustive at sf0.001)


def _events_pd():
    import pandas as pd

    df = pd.read_parquet(f"{SF_DIR}/events.parquet")
    return df


def test_interval_coverage_matches_python_sweep(spark):
    """Merged-interval union recomputed by the literal sort-and-sweep
    loop per user — island count, covered micros and span must match
    row for row."""
    from llmaix_spark.plans.queries import q_interval_coverage

    got = {
        r["user_id"]: (r["n_intervals"], r["covered_us"], r["span_us"])
        for r in q_interval_coverage(spark, SF_DIR).collect()
    }

    df = _events_pd()
    per = {}
    for _, row in df.iterrows():
        us = int(row["ts"].value // 1000)  # ns -> us
        cents = int(round(row["value"] * 100))
        s = us
        e = us + (abs(cents) % 3600 + 1) * 1_000_000
        per.setdefault(int(row["user_id"]), []).append((s, e))
    want = {}
    for u, ivs in per.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        covered = sum(e - s for s, e in merged)
        span = merged[-1][1] - merged[0][0]
        want[u] = (len(merged), covered, span)
    assert got == want


def test_fifo_allocation_matches_python_loop(spark):
    """FIFO consumption replayed lot-by-lot in python (exact ints)."""
    from llmaix_spark.plans.queries import q_fifo_allocation

    got = {
        r["l_partkey"]: (
            r["demand_qty"],
            r["lots_used"],
            r["last_lot_rn"],
            r["alloc_cost_cents"],
        )
        for r in q_fifo_allocation(spark, SF_DIR).collect()
    }

    import pandas as pd

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    want = {}
    for pk, g in li.groupby("l_partkey"):
        g = g.sort_values(["l_shipdate", "l_orderkey", "l_linenumber"])
        lots = [
            (int(q), int(round(p * 100)))
            for q, p in zip(g["l_quantity"], g["l_extendedprice"])
        ]
        demand = sum(q for q, _ in lots) // 2
        if demand <= 0:
            continue
        remaining, used, last_rn, cost = demand, 0, None, 0
        for rn, (qty, cents) in enumerate(lots, start=1):
            consumed = max(0, min(qty, remaining))
            remaining -= consumed
            if consumed > 0:
                used += 1
                last_rn = rn
                cost += (cents * consumed) // qty
        want[int(pk)] = (demand, used, last_rn, cost)
    assert got == want


def test_revenue_gini_matches_python_formula(spark):
    """Exact rank-formula Gini recomputed with unbounded python ints;
    the single float division agrees to 1e-9 (one IEEE op both
    sides)."""
    from llmaix_spark.plans.queries import q_revenue_gini

    got = {
        r["n_name"]: (r["n_custs"], r["total_cents"], r["gini"])
        for r in q_revenue_gini(spark, SF_DIR).collect()
    }

    import pandas as pd

    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nat = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    orders["cents"] = (orders["o_totalprice"] * 100).round().astype(int)
    rev = orders.groupby("o_custkey")["cents"].sum().reset_index()
    rev = rev.merge(
        cust[["c_custkey", "c_nationkey"]],
        left_on="o_custkey",
        right_on="c_custkey",
    ).merge(nat[["n_nationkey", "n_name"]], left_on="c_nationkey",
            right_on="n_nationkey")
    for name, g in rev.groupby("n_name"):
        xs = sorted(
            (int(c), int(k)) for c, k in zip(g["cents"], g["o_custkey"])
        )
        n = len(xs)
        total = sum(c for c, _ in xs)
        num = sum((2 * i - n - 1) * c for i, (c, _) in enumerate(xs, 1))
        gini = float(num) / float(n * total)
        gn, gt, gg = got[name]
        assert (gn, gt) == (n, total)
        assert abs(gg - gini) < 1e-6


def test_geo_grid_join_matches_bruteforce_pairs(spark):
    """The grid join must find EXACTLY the close pairs an O(n²) python
    scan finds — proves the 3×3 neighborhood is sufficient for
    R=30k < cell=50k and that no pair is double-counted."""
    from llmaix_spark.plans.queries import q_geo_grid_join

    res = q_geo_grid_join(spark, SF_DIR).collect()
    got_pairs = sum(r["n_pairs"] for r in res)
    got_sum = sum(r["sum_dist2"] for r in res)

    import pandas as pd

    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    pts = [
        (
            int(k),
            _h60(f"{int(k)}:gx") % 1_000_000,
            _h60(f"{int(k)}:gy") % 1_000_000,
        )
        for k in cust["c_custkey"]
    ]
    want_pairs, want_sum = 0, 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            a, b = pts[i], pts[j]
            if a[0] == b[0]:
                continue
            d2 = (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2
            if d2 <= 900_000_000:
                want_pairs += 1
                want_sum += d2
    assert (got_pairs, got_sum) == (want_pairs, want_sum)


def test_kg_negative_samples_matches_python_sampler(spark):
    """Hash-corruption sampler replayed in python: candidate set,
    anti-join filtering and checksums must agree per head."""
    from llmaix_spark.plans.queries import q_kg_negative_samples

    got = {
        r["custkey"]: (r["n_pos"], r["n_neg"], r["neg_checksum"])
        for r in q_kg_negative_samples(spark, SF_DIR).collect()
    }

    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    part = pd.read_parquet(f"{SF_DIR}/part.parquet")
    maxp = int(part["p_partkey"].max())
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    pos = set(zip(j["o_custkey"].astype(int), j["l_partkey"].astype(int)))
    by_head: dict[int, set[int]] = {}
    for c, p in pos:
        by_head.setdefault(c, set()).add(p)
    want = {}
    for c, parts in by_head.items():
        n_neg, chk = 0, 0
        for p in parts:
            for i in ("1", "2"):
                cand = 1 + _h60(f"{c}:{p}:{i}:neg") % maxp
                if cand not in parts:
                    n_neg += 1
                    chk += cand
        want[c] = (len(parts), n_neg, chk)
    assert got == want


def test_benford_digits_matches_python(spark):
    """Digit counts exact; proportions and chi2 agree to 1e-6."""
    import math

    from llmaix_spark.plans.queries import q_benford_digits

    rows = q_benford_digits(spark, SF_DIR).collect()

    import pandas as pd

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = (o["o_totalprice"] * 100).round().astype(int)
    cents = cents[cents > 0]
    digits = cents.astype(str).str[0].astype(int)
    counts = digits.value_counts().to_dict()
    n = int(len(digits))
    assert sum(r["n_obs"] for r in rows) == n
    for r in rows:
        d = r["digit"]
        p = math.log10(1 + 1 / d)
        assert r["n_obs"] == counts[d]
        assert abs(r["obs_p"] - counts[d] / n) < 1e-6
        exp_n = n * p
        assert abs(r["chi2_term"] - (counts[d] - exp_n) ** 2 / exp_n) < 1e-5
