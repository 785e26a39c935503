"""Plan pins, partition invariance, and python twins for the round-21
wave (containment-LSH / retrieval MRR / vocab growth / transition
reciprocity / forecast accuracy / stratified k-fold).
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


def test_containment_lsh_no_cartesian(spark):
    from llmaix_spark.plans.queries import q_containment_dedup_lsh

    plan = _phys(q_containment_dedup_lsh(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_mrr_single_window(spark):
    from llmaix_spark.plans.queries import q_retrieval_mrr

    plan = _phys(q_retrieval_mrr(spark, SF_DIR))
    assert plan.count("Window") == 1
    assert "rangepartitioning" not in plan


def test_vocab_growth_shape(spark):
    """ntile + cumulative windows both run at bounded grains (documents
    / 10 buckets); the type attribution is a plain groupBy."""
    from llmaix_spark.plans.queries import q_vocab_growth

    plan = _phys(q_vocab_growth(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("Window") == 2


def test_reciprocity_edges_materialized_once(spark):
    """The lead()+groupBy edge pipeline feeds BOTH join sides — the
    checkpoint must make it execute once (no Window subtree duplicated
    under the join)."""
    from llmaix_spark.plans.queries import q_transition_reciprocity

    plan = _phys(q_transition_reciprocity(spark, SF_DIR))
    assert plan.count("Window") <= 1
    assert "CartesianProduct" not in plan


def test_forecast_equi_join(spark):
    from llmaix_spark.plans.queries import q_forecast_accuracy

    plan = _phys(q_forecast_accuracy(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kfold_no_window_stratum_broadcasts(spark):
    from llmaix_spark.plans.queries import q_stratified_kfold

    plan = _phys(q_stratified_kfold(spark, SF_DIR))
    assert "Window" not in plan
    assert "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "containment_dedup_lsh",
        "retrieval_mrr",
        "vocab_growth",
        "transition_reciprocity",
        "forecast_accuracy",
        "stratified_kfold",
    ],
)
def test_wave21_partition_invariance(spark, qname):
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
# python twins / cross-operator properties


def test_containment_lsh_subset_of_exact(spark):
    """Every LSH-blocked containment pair must appear in the exhaustive
    operator's output WITH IDENTICAL scores (blocking may only drop
    pairs, never invent or rescore them)."""
    from llmaix_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_lsh,
    )
    from llmaix_spark.plans.queries import _t

    docs = _t(spark, SF_DIR, "documents")
    exact = {
        (r["doc_a"], r["doc_b"]): (
            r["n_common"],
            r["containment_a"],
            r["containment_b"],
        )
        for r in containment_pairs(docs, 0.8).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): (
            r["n_common"],
            r["containment_a"],
            r["containment_b"],
        )
        for r in containment_pairs_lsh(docs, 0.8).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert exact[k] == v
    # the fixture's near-dups carry J >= 0.5, so band recall is high
    assert len(lsh) >= 0.9 * len(exact) > 0


def test_mrr_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_retrieval_mrr

    got = {
        r["source"]: (r["n_rel"], r["mrr"], r["hit_at_10"])
        for r in q_retrieval_mrr(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    d["relevant"] = [_h60(f"{i}:rel") % 4 >= 2 for i in d["doc_id"]]
    for src, g in d.groupby("source"):
        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        rels = list(g["relevant"])
        n_rel = sum(rels)
        mrr = 0.0
        for i, rel in enumerate(rels):
            if rel:
                mrr = 1.0 / (i + 1)
                break
        hit10 = any(rels[:10])
        gn, gm, gh = got[src]
        assert gn == n_rel
        assert abs(gm - mrr) < 1e-6
        assert gh == hit10


def test_vocab_growth_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_vocab_growth

    got = {
        r["bucket"]: (r["new_types"], r["cum_types"])
        for r in q_vocab_growth(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ids = sorted(d["doc_id"])
    n = len(ids)
    # ntile(10): first n%10 buckets get one extra row
    bucket_of = {}
    base, extra = divmod(n, 10)
    pos = 0
    for b in range(1, 11):
        size = base + (1 if b <= extra else 0)
        for doc in ids[pos : pos + size]:
            bucket_of[doc] = b
        pos += size

    first: dict[str, int] = {}
    for r in d.itertuples():
        toks = r.text.strip().split()
        for i in range(len(toks) - 2):
            s = " ".join(toks[i : i + 3])
            if s not in first or r.doc_id < first[s]:
                first[s] = r.doc_id
    want: dict[int, int] = {}
    for doc in first.values():
        want[bucket_of[doc]] = want.get(bucket_of[doc], 0) + 1
    cum = 0
    for b in sorted(want):
        cum += want[b]
        assert got[b] == (want[b], cum)
    assert set(got) == set(want)
    # Heaps: later deciles coin fewer new types than the first
    assert got[max(got)][0] < got[min(got)][0]


def test_reciprocity_matches_python(spark):
    from llmaix_spark.plans.queries import q_transition_reciprocity

    row = q_transition_reciprocity(spark, SF_DIR).collect()[0]

    import pandas as pd

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["us"] = e["ts"].astype("int64")
    edges: dict[tuple, int] = {}
    for _, g in e.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        types = list(g["event_type"])
        for a, b in zip(types, types[1:]):
            if a != b:
                edges[(a, b)] = edges.get((a, b), 0) + 1
    n_dir = len(edges)
    n_rec = sum(1 for (a, b) in edges if (b, a) in edges)
    n_trans = sum(edges.values())
    n_matched = sum(
        min(c, edges.get((b, a), 0)) for (a, b), c in edges.items()
    )
    assert row["n_directed_pairs"] == n_dir
    assert row["n_reciprocated"] == n_rec
    assert row["n_transitions"] == n_trans
    assert row["n_matched"] == n_matched
    assert abs(row["weighted_reciprocity"] - n_matched / n_trans) < 1e-6
    # weighted can never exceed the pair share's upper bound of 1
    assert 0 <= row["weighted_reciprocity"] <= 1


def test_forecast_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_forecast_accuracy

    got = {
        (r["yr"], r["mo"]): (
            r["actual_cents"],
            r["forecast_cents"],
            r["abs_err_cents"],
            r["smape"],
        )
        for r in q_forecast_accuracy(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["cents"] = np.floor(o["o_totalprice"] * 100 + 0.5).astype(int)
    o["yr"] = o["o_orderdate"].dt.year
    o["mo"] = o["o_orderdate"].dt.month
    m = o.groupby(["yr", "mo"])["cents"].sum()
    want = {}
    for (yr, mo), actual in m.items():
        prev = m.get((yr - 1, mo))
        if prev is not None:
            want[(yr, mo)] = (int(actual), int(prev))
    assert set(got) == set(want)
    for k, (actual, fc) in want.items():
        ga, gf, ge, gs = got[k]
        assert (ga, gf, ge) == (actual, fc, abs(actual - fc))
        assert abs(gs - 2 * abs(actual - fc) / (actual + fc)) < 1e-6


def test_kfold_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_stratified_kfold

    got = {
        (r["lang"], r["fold"]): (r["n_docs"], r["fold_share"])
        for r in q_stratified_kfold(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    d["fold"] = [_h60(f"{i}:fold") % 5 for i in d["doc_id"]]
    for lang, g in d.groupby("lang"):
        n_lang = len(g)
        for fold, gg in g.groupby("fold"):
            n, share = got[(lang, fold)]
            assert n == len(gg)
            assert abs(share - len(gg) / n_lang) < 1e-6
    assert sum(v[0] for v in got.values()) == len(d)
    # folds must be independent of the train/val/test split salt
    d["split_bucket"] = [_h60(f"{i}:split") % 10000 for i in d["doc_id"]]
    test_docs = d[d["split_bucket"] >= 9500]
    assert test_docs["fold"].nunique() > 1
