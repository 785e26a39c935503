"""Plan pins, partition invariance, and python twins for the round-27
wave (MinHash calibration / DQ rules / embedding drift / conformal
bound / boilerplate score / shingle-size sensitivity).
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


def test_calibration_signatures_broadcast(spark):
    from llmaix_spark.plans.queries import q_minhash_calibration

    plan = _phys(q_minhash_calibration(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dq_rules_single_pass_per_table(spark):
    from llmaix_spark.plans.queries import q_dq_rules

    plan = _phys(q_dq_rules(spark, SF_DIR))
    assert "SortMergeJoin" not in plan  # the FK probe broadcasts
    assert "Window" not in plan


def test_drift_no_window(spark):
    from llmaix_spark.plans.queries import q_embedding_drift

    plan = _phys(q_embedding_drift(spark, SF_DIR))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_conformal_windows_partition_by_segment(spark):
    from llmaix_spark.plans.queries import q_conformal_bound

    plan = _phys(q_conformal_bound(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_boilerplate_no_cartesian(spark):
    from llmaix_spark.plans.queries import q_boilerplate_score

    plan = _phys(q_boilerplate_score(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_sensitivity_no_cartesian(spark):
    from llmaix_spark.plans.queries import q_shingle_size_sensitivity

    plan = _phys(q_shingle_size_sensitivity(spark, SF_DIR))
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "minhash_calibration",
        "dq_rules",
        "embedding_drift",
        "conformal_bound",
        "boilerplate_score",
        "shingle_size_sensitivity",
    ],
)
def test_wave27_partition_invariance(spark, qname):
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
# python twins / properties


def _shingles(text: str, n: int = 3) -> set:
    toks = text.strip().split()
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


def _exact_pairs(sh: dict, thr: float = 0.5) -> dict:
    ids = sorted(sh)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter:
                j = inter / len(sh[a] | sh[b])
                if j >= thr:
                    out[(a, b)] = round(j, 6)
    return out


def test_calibration_is_sane(spark):
    """The estimator must be roughly unbiased with bounded error: 16
    hash functions give a standard error ≤ 1/(2·√16) per pair."""
    from llmaix_spark.plans.queries import q_minhash_calibration

    row = q_minhash_calibration(spark, SF_DIR).collect()[0]
    assert row["n_pairs"] > 0
    assert abs(row["mean_bias"]) <= 0.15
    assert row["mae"] <= 0.2
    assert 0 <= row["max_abs_err"] <= 0.5
    # jhat lives on a 1/16 grid, so max error is a multiple offset
    assert row["mae"] <= row["max_abs_err"]


def test_dq_rules_match_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_dq_rules

    got = {
        r["rule_name"]: (r["observed"], r["passed"])
        for r in q_dq_rules(spark, SF_DIR).collect()
    }
    assert len(got) == 6

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    cu = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    checks = {
        "orders.totalprice > 0": (o["o_totalprice"] > 0).mean(),
        "lineitem.quantity in [0,100]": li["l_quantity"]
        .between(0, 100)
        .mean(),
        "customer.custkey unique": cu["c_custkey"].nunique() / len(cu),
        "events.event_id unique": ev["event_id"].nunique() / len(ev),
        "documents.text not null": d["text"].notna().mean(),
        "orders.custkey fk-covered": o["o_custkey"]
        .isin(set(cu["c_custkey"]))
        .mean(),
    }
    for rule, obs in checks.items():
        g_obs, g_pass = got[rule]
        assert abs(g_obs - obs) < 1e-6
        assert g_pass == (abs(obs - 1.0) < 1e-12)


def test_drift_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_embedding_drift

    got = {
        r["label_id"]: (r["n_early"], r["n_late"], r["half_cosine"])
        for r in q_embedding_drift(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    for lab, g in e.groupby("label"):
        early = g[g["vec_id"] % 2 == 0]
        late = g[g["vec_id"] % 2 != 0]
        qe = np.stack(
            [
                np.floor(
                    np.asarray(v, dtype=np.float64) * 1e6 + 0.5
                ).astype(np.int64)
                for v in early["embedding"]
            ]
        ).sum(axis=0)
        ql = np.stack(
            [
                np.floor(
                    np.asarray(v, dtype=np.float64) * 1e6 + 0.5
                ).astype(np.int64)
                for v in late["embedding"]
            ]
        ).sum(axis=0)
        cos = float(qe @ ql) / (
            math.sqrt(float(qe @ qe)) * math.sqrt(float(ql @ ql))
        )
        gn_e, gn_l, gc = got[int(lab)]
        assert (gn_e, gn_l) == (len(early), len(late))
        assert abs(gc - cos) < 1e-5
        assert -1 - 1e-9 <= gc <= 1 + 1e-9


def test_conformal_coverage_near_nominal(spark):
    from llmaix_spark.plans.queries import q_conformal_bound

    rows = q_conformal_bound(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        # split conformal guarantees coverage >= 0.9 in expectation;
        # finite-sample noise stays inside a generous band
        assert 0.8 <= r["coverage"] <= 1.0
        assert r["qhat_dollars"] > 0
        assert r["n_test"] > 100


def test_boilerplate_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_boilerplate_score

    got = {
        r["doc_id"]: (r["n_sh"], r["n_common"], r["boilerplate_share"])
        for r in q_boilerplate_score(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sh = {int(r.doc_id): _shingles(r.text) for r in d.itertuples()}
    df: dict[str, int] = {}
    for s in sh.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    want = {}
    for doc, grams in sh.items():
        if not grams:
            continue
        common = sum(1 for g in grams if df[g] >= 5)
        share = round(common / len(grams), 6)
        if share >= 0.05:
            want[doc] = (len(grams), common)
    assert set(got) == set(want)
    for doc, (n, c) in want.items():
        gn, gc, gs = got[doc]
        assert (gn, gc) == (n, c)
        assert abs(gs - c / n) < 1e-6


def test_sensitivity_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_shingle_size_sensitivity

    got = {
        (r["doc_a"], r["doc_b"]): (r["j3"], r["j5"], r["in_both"])
        for r in q_shingle_size_sensitivity(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    p3 = _exact_pairs(
        {int(r.doc_id): _shingles(r.text, 3) for r in d.itertuples()}
    )
    p5 = _exact_pairs(
        {int(r.doc_id): _shingles(r.text, 5) for r in d.itertuples()}
    )
    want = {}
    for k in set(p3) | set(p5):
        want[k] = (
            p3.get(k, -1.0),
            p5.get(k, -1.0),
            k in p3 and k in p5,
        )
    assert set(got) == set(want)
    for k, (j3, j5, both) in want.items():
        g3, g5, gb = got[k]
        assert abs(g3 - j3) < 1e-6
        assert abs(g5 - j5) < 1e-6
        assert gb == both
    # 5-gram Jaccard can only be <= 3-gram Jaccard for the same pair
    for k, (j3, j5, both) in want.items():
        if both:
            assert j5 <= j3 + 1e-6
