"""Plan pins, partition invariance, and python twins for the round-25
wave (dedup transitivity / share-of-parent / realized-vs-list /
supplier concentration / quantization error / repeat bestsellers).
"""

from __future__ import annotations

import math

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_triangle_audit_no_cartesian(spark):
    from llmaix_spark.plans.queries import q_dedup_triangle_audit

    plan = _phys(q_dedup_triangle_audit(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_share_of_parent_all_broadcast(spark):
    from llmaix_spark.plans.queries import q_share_of_parent

    plan = _phys(q_share_of_parent(spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_realized_dim_broadcast(spark):
    from llmaix_spark.plans.queries import q_realized_vs_list

    plan = _phys(q_realized_vs_list(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_supplier_conc_no_join_no_window(spark):
    from llmaix_spark.plans.queries import q_supplier_concentration

    plan = _phys(q_supplier_concentration(spark, SF_DIR))
    assert "Join" not in plan
    assert "Window" not in plan


def test_quant_error_no_join_no_window(spark):
    from llmaix_spark.plans.queries import q_quant_error

    plan = _phys(q_quant_error(spark, SF_DIR))
    assert "Join" not in plan
    assert "Window" not in plan


def test_bestsellers_month_partitioned_window(spark):
    from llmaix_spark.plans.queries import q_repeat_bestsellers

    plan = _phys(q_repeat_bestsellers(spark, SF_DIR))
    # map-side WindowGroupLimit prunes each partition to its top-20
    # BEFORE the shuffle — the optimization that keeps the rank cheap
    assert "WindowGroupLimit" in plan
    assert plan.count("Window [") == 1
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "dedup_triangle_audit",
        "share_of_parent",
        "realized_vs_list",
        "supplier_concentration",
        "quant_error",
        "repeat_bestsellers",
    ],
)
def test_wave25_partition_invariance(spark, qname):
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


def _shingles(text: str, n: int = 3) -> set:
    toks = text.strip().split()
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


def test_triangle_audit_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_dedup_triangle_audit

    row = q_dedup_triangle_audit(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sh = {int(r.doc_id): _shingles(r.text) for r in d.itertuples()}
    ids = sorted(sh)
    pairs = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                pairs.add((a, b))
    adj: dict[int, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wedges = closed = 0
    for m, nbrs in adj.items():
        ns = sorted(nbrs)
        for i, x in enumerate(ns):
            for y in ns[i + 1 :]:
                wedges += 1
                if (x, y) in pairs:
                    closed += 1
    assert row["n_pairs"] == len(pairs)
    assert row["n_wedges"] == wedges
    assert row["n_closed"] == closed
    assert abs(row["transitivity"] - closed / wedges) < 1e-6


def test_share_of_parent_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_share_of_parent

    got = {
        r["nation"]: (
            r["region"],
            r["nation_cents"],
            r["region_cents"],
            r["share_in_region"],
            r["region_share"],
        )
        for r in q_share_of_parent(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    n = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    rg = pd.read_parquet(f"{SF_DIR}/region.parquet")
    j = (
        o.merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .merge(rg, left_on="n_regionkey", right_on="r_regionkey")
    )
    j["cents"] = np.floor(j["o_totalprice"] * 100 + 0.5).astype(int)
    nat = j.groupby(["n_name", "r_name"])["cents"].sum()
    reg = j.groupby("r_name")["cents"].sum()
    total = int(j["cents"].sum())
    for (nation, region), cents in nat.items():
        g = got[nation]
        assert g[0] == region
        assert g[1] == int(cents)
        assert g[2] == int(reg[region])
        assert abs(g[3] - cents / reg[region]) < 1e-6
        assert abs(g[4] - reg[region] / total) < 1e-6
    # shares within each region sum to 1
    by_region: dict[str, float] = {}
    for nation, g in got.items():
        by_region[g[0]] = by_region.get(g[0], 0.0) + g[3]
    for s in by_region.values():
        assert abs(s - 1.0) < 1e-4


def test_realized_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_realized_vs_list

    got = {
        r["brand"]: (
            r["n_lines"],
            r["realized_cents"],
            r["list_cents"],
            r["mean_gap"],
        )
        for r in q_realized_vs_list(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    p = pd.read_parquet(f"{SF_DIR}/part.parquet")
    j = li[li["l_quantity"] > 0].merge(
        p, left_on="l_partkey", right_on="p_partkey"
    )
    j["unit"] = np.floor(
        j["l_extendedprice"] * 100 / j["l_quantity"] + 0.5
    ).astype(int)
    j["list"] = np.floor(j["p_retailprice"] * 100 + 0.5).astype(int)
    for brand, g in j.groupby("p_brand"):
        ru, rl = int(g["unit"].sum()), int(g["list"].sum())
        gn, gr, gl, gap = got[brand]
        assert (gn, gr, gl) == (len(g), ru, rl)
        assert abs(gap - (1.0 - ru / rl)) < 1e-6


def test_supplier_conc_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_supplier_concentration

    got = {
        r["part_key"]: (
            r["n_suppliers"],
            r["total_q"],
            r["top_share"],
            r["hhi"],
        )
        for r in q_supplier_concentration(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["q"] = np.floor(li["l_quantity"] + 0.5).astype(int)
    per = li.groupby(["l_partkey", "l_suppkey"])["q"].sum()
    for pk, g in per.groupby(level=0):
        qs = [int(v) for v in g.values]
        total = sum(qs)
        hhi = sum(q * q for q in qs) / (total * total)
        gn, gt, gshare, ghhi = got[pk]
        assert (gn, gt) == (len(qs), total)
        assert abs(gshare - max(qs) / total) < 1e-6
        assert abs(ghhi - hhi) < 1e-6
        # HHI lower bound 1/n (uniform), upper bound 1 (single source)
        assert 1 / len(qs) - 1e-9 <= ghhi <= 1 + 1e-9


def test_quant_error_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_quant_error

    got = {
        r["label_id"]: (r["n_elems"], r["sse_pico"], r["rmse"])
        for r in q_quant_error(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    # engine round() is HALF_UP; numpy rounds half-to-even
    want: dict[int, tuple] = {}
    for r in e.itertuples():
        v = np.asarray(r.embedding, dtype=np.float64)
        scale = np.abs(v).max() / 127.0
        codes = (
            np.floor(np.abs(v / scale) + 0.5) * np.sign(v)
            if scale
            else np.zeros_like(v)
        )
        err = v - codes * scale
        pico = sum(int(math.floor(x + 0.5)) for x in (err**2) * 1e12)
        n, s = want.get(int(r.label), (0, 0))
        want[int(r.label)] = (n + len(v), s + pico)
    assert set(got) == set(want)
    for lab, (n, s) in want.items():
        gn, gs, grmse = got[lab]
        assert gn == n
        assert abs(gs - s) <= n  # ±1 pico per element rounding skew
        assert abs(grmse - math.sqrt(gs / gn / 1e12)) < 1e-9
        # int8 symmetric error is bounded by scale/2 per element
        assert grmse < 0.01


def test_bestsellers_match_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_repeat_bestsellers

    got = {
        r["part_key"]: (r["n_top"], r["n_months"], r["top_rate"])
        for r in q_repeat_bestsellers(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["mk"] = (
        li["l_shipdate"].dt.year * 12 + li["l_shipdate"].dt.month
    )
    li["cents"] = np.floor(
        li["l_extendedprice"] * (1 - li["l_discount"]) * 100 + 0.5
    ).astype(int)
    per = (
        li.groupby(["mk", "l_partkey"])["cents"].sum().reset_index()
    )
    n_months = per["mk"].nunique()
    hits: dict[int, int] = {}
    for mk, g in per.groupby("mk"):
        top = g.sort_values(
            ["cents", "l_partkey"], ascending=[False, True]
        ).head(20)
        for pk in top["l_partkey"]:
            hits[pk] = hits.get(pk, 0) + 1
    want = {
        pk: (c, n_months) for pk, c in hits.items() if c >= 2
    }
    assert set(got) == set(want)
    for pk, (c, nm) in want.items():
        gc, gnm, gr = got[pk]
        assert (gc, gnm) == (c, nm)
        assert abs(gr - c / nm) < 1e-6
