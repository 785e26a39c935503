"""Plan pins, partition invariance, and python twins for the round-24
wave (sliding chunks / prefix collision / erasure audit / A/B count
z-test / nation LOO outliers / epoch plan).
"""

from __future__ import annotations

import hashlib
import math

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# plan pins


def test_chunks_no_join_no_window(spark):
    from llmaix_spark.plans.queries import q_chunk_sliding

    plan = _phys(q_chunk_sliding(spark, SF_DIR))
    assert "Join" not in plan
    assert "Window" not in plan
    assert "Generate" in plan  # the start-offset explode


def test_prefix_no_join_no_window(spark):
    from llmaix_spark.plans.queries import q_prefix_collision

    plan = _phys(q_prefix_collision(spark, SF_DIR))
    assert "Join" not in plan
    assert "Window" not in plan


def test_erasure_broadcast_probe(spark):
    from llmaix_spark.plans.queries import q_erasure_audit

    plan = _phys(q_erasure_audit(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ab_ztest_no_window(spark):
    from llmaix_spark.plans.queries import q_ab_count_ztest

    plan = _phys(q_ab_count_ztest(spark, SF_DIR))
    assert "Window" not in plan
    assert "Join" not in plan


def test_loo_totals_broadcast(spark):
    from llmaix_spark.plans.queries import q_nation_outlier_loo

    plan = _phys(q_nation_outlier_loo(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "Window" not in plan


def test_epoch_plan_broadcast_scalars(spark):
    from llmaix_spark.plans.queries import q_epoch_plan

    plan = _phys(q_epoch_plan(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "chunk_sliding",
        "prefix_collision",
        "erasure_audit",
        "ab_count_ztest",
        "nation_outlier_loo",
        "epoch_plan",
    ],
)
def test_wave24_partition_invariance(spark, qname):
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


def test_chunks_match_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_chunk_sliding

    got = {
        (r["doc_id"], r["chunk_idx"]): (
            r["start_tok"],
            r["end_tok"],
            r["n_tokens"],
            r["chunk_hash"],
        )
        for r in q_chunk_sliding(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    want = {}
    for r in d.itertuples():
        toks = [t for t in r.text.strip().lower().split() if t]
        nt = len(toks)
        for st in range(1, nt + 1, 32):
            end = min(st + 63, nt)
            chunk = " ".join(toks[st - 1 : end])
            want[(r.doc_id, (st - 1) // 32)] = (
                st,
                end,
                end - st + 1,
                _h60(chunk),
            )
    assert got == want
    # overlap property: consecutive chunks share 32 tokens when full
    full = [
        k for k, v in want.items() if v[2] == 64 and (k[0], k[1] + 1) in want
    ]
    assert full, "fixture must contain overlapping full chunks"
    for doc, idx in full:
        assert want[(doc, idx + 1)][0] == want[(doc, idx)][0] + 32


def test_prefix_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_prefix_collision

    got = {
        r["prefix_hash"]: (r["n_docs"], r["min_doc"], r["max_doc"])
        for r in q_prefix_collision(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    groups: dict[int, list[int]] = {}
    for r in d.itertuples():
        toks = [t for t in r.text.strip().lower().split() if t]
        h = _h60(" ".join(toks[:16]))
        groups.setdefault(h, []).append(r.doc_id)
    want = {
        h: (len(ids), min(ids), max(ids))
        for h, ids in groups.items()
        if len(ids) >= 2
    }
    assert got == want
    assert want


def test_erasure_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_erasure_audit

    got = {
        r["tbl"]: r["n"] for r in q_erasure_audit(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    erased_orders = o[o["o_custkey"] % 37 == 0]
    assert got["events"] == int((e["user_id"] % 37 == 0).sum())
    assert got["orders"] == len(erased_orders)
    assert got["lineitem"] == int(
        li["l_orderkey"].isin(set(erased_orders["o_orderkey"])).sum()
    )


def test_ab_ztest_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_ab_count_ztest

    row = q_ab_count_ztest(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    per = (
        e.assign(p=(e["event_type"] == "purchase").astype(int))
        .groupby("user_id")["p"]
        .sum()
    )
    arms: dict[str, list[int]] = {"A": [], "B": []}
    for u, x in per.items():
        arms["A" if _h60(f"{u}:ab") % 2 == 0 else "B"].append(int(x))
    na, nb = len(arms["A"]), len(arms["B"])
    ma = sum(arms["A"]) / na
    mb = sum(arms["B"]) / nb
    va = sum((x - ma) ** 2 for x in arms["A"]) / (na - 1)
    vb = sum((x - mb) ** 2 for x in arms["B"]) / (nb - 1)
    z = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert (row["na"], row["nb"]) == (na, nb)
    assert abs(row["mean_a"] - ma) < 1e-6
    assert abs(row["mean_b"] - mb) < 1e-6
    assert abs(row["z_stat"] - z) < 1e-4


def test_loo_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_nation_outlier_loo

    got = {
        r["nation"]: (r["cents"], r["loo_z"])
        for r in q_nation_outlier_loo(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    n = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["cents"] = np.floor(j["o_totalprice"] * 100 + 0.5).astype(int)
    per = j.groupby("n_name")["cents"].sum()
    vals = {k: int(v) for k, v in per.items()}
    assert set(got) == set(vals)
    for nat, x in vals.items():
        others = [v for k, v in vals.items() if k != nat]
        mean_o = sum(others) / len(others)
        var_o = sum((v - mean_o) ** 2 for v in others) / (len(others) - 1)
        z = (x - mean_o) / math.sqrt(var_o)
        gx, gz = got[nat]
        assert gx == x
        assert abs(gz - z) < 1e-4


def test_epoch_plan_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_epoch_plan

    got = {
        r["lang"]: (
            r["n_tokens"],
            r["natural_share"],
            r["target_share"],
            r["epochs"],
            r["effective_tokens"],
        )
        for r in q_epoch_plan(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    counts = {}
    for r in d.itertuples():
        toks = [t for t in r.text.strip().lower().split() if t]
        counts[r.lang] = counts.get(r.lang, 0) + len(toks)
    nt = sum(counts.values())
    z = sum(math.sqrt(v / nt) for v in counts.values())
    for lang, v in counts.items():
        target = math.sqrt(v / nt) / z
        epochs = min(4.0, target * nt / v)
        gn, gns, gts, gep, geff = got[lang]
        assert gn == v
        assert abs(gns - v / nt) < 1e-6
        assert abs(gts - target) < 1e-6
        assert abs(gep - epochs) < 1e-6
        assert abs(geff - v * epochs) <= 1
    # the plan conserves the target mixture: shares sum to 1
    assert abs(sum(v[2] for v in got.values()) - 1.0) < 1e-4
