"""Plan pins, partition invariance, and python twins for the round-37
wave (pack budget sweep / LSH band sweep / decontam n-gram sweep /
dup length bias / k-fold label balance / gate waterfall).
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


def test_pack_sweep_budget_grid_broadcast(spark):
    from llmaix_spark.plans.queries import q_pack_budget_sweep

    plan = _phys(q_pack_budget_sweep(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_band_sweep_one_signature_set(spark):
    """All three bandings re-band the SAME checkpointed signatures."""
    from llmaix_spark.plans.queries import q_lsh_band_sweep

    plan = _phys(q_lsh_band_sweep(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_decontam_sweep_hash_joins(spark):
    from llmaix_spark.plans.queries import q_decontam_ngram_sweep

    plan = _phys(q_decontam_ngram_sweep(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_length_bias_dup_set_broadcast(spark):
    from llmaix_spark.plans.queries import q_dup_length_bias

    plan = _phys(q_dup_length_bias(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_balance_totals_broadcast(spark):
    from llmaix_spark.plans.queries import q_kfold_label_balance

    plan = _phys(q_kfold_label_balance(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_waterfall_single_scan(spark):
    from llmaix_spark.plans.queries import q_gate_waterfall

    plan = _phys(q_gate_waterfall(spark, SF_DIR))
    assert "Join" not in plan
    assert "Window" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "pack_budget_sweep",
        "lsh_band_sweep",
        "decontam_ngram_sweep",
        "dup_length_bias",
        "kfold_label_balance",
        "gate_waterfall",
    ],
)
def test_wave37_partition_invariance(spark, qname):
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


def test_pack_sweep_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_pack_budget_sweep

    got = {
        r["budget"]: (r["n_packs"], r["total_tokens"], r["waste_share"])
        for r in q_pack_budget_sweep(spark, SF_DIR).collect()
    }
    assert set(got) == {128, 256, 512}

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    rows = []
    for r in d.itertuples():
        toks = [t for t in r.text.strip().lower().split() if t]
        rows.append((int(r.doc_id), int(r.doc_id) % 32, len(toks)))
    total_tokens = sum(nt for _, _, nt in rows)
    for budget in (128, 256, 512):
        packs = set()
        cum: dict[int, int] = {}
        for doc, shard, nt in sorted(rows):
            start = cum.get(shard, 0)
            packs.add((shard, start // budget))
            cum[shard] = start + nt
        n_packs = len(packs)
        waste = 1 - total_tokens / (n_packs * budget)
        gn, gt, gw = got[budget]
        assert (gn, gt) == (n_packs, total_tokens)
        assert abs(gw - waste) < 1e-6
    # bigger budgets waste more under streaming cuts (fewer, larger bins)
    assert got[512][0] < got[128][0]


def test_band_sweep_properties(spark):
    from llmaix_spark.plans.queries import q_lsh_band_sweep

    got = {
        r["bands"]: (
            r["rows_per_band"],
            r["n_candidates"],
            r["n_true_captured"],
            r["recall"],
        )
        for r in q_lsh_band_sweep(spark, SF_DIR).collect()
    }
    assert set(got) == {4, 8, 16}
    assert got[4][0] == 4 and got[8][0] == 2 and got[16][0] == 1
    # more bands of fewer rows can only ADD candidates (monotone)
    assert got[4][1] <= got[8][1] <= got[16][1]
    # captured truth is monotone too, and recall is a valid share
    assert got[4][2] <= got[8][2] <= got[16][2]
    for _, (_, nc, ncap, rec) in got.items():
        assert 0 <= ncap <= nc
        assert 0 <= rec <= 1
    # the production (8,2) banding keeps high recall at J >= 0.5
    assert got[8][3] >= 0.9


def test_decontam_sweep_monotone(spark):
    from llmaix_spark.plans.queries import q_decontam_ngram_sweep

    got = {
        r["ngram_size"]: r["n_contaminated"]
        for r in q_decontam_ngram_sweep(spark, SF_DIR).collect()
    }
    assert set(got) == {4, 8, 13}
    # longer n-grams can only flag fewer docs
    assert got[4] >= got[8] >= got[13]
    assert got[4] > 0  # the %8 slice shares 4-grams at every SF


def test_length_bias_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_dup_length_bias

    row = q_dup_length_bias(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    def shingles(text):
        toks = text.strip().split()
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    sh = {int(r.doc_id): shingles(r.text) for r in d.itertuples()}
    ids = sorted(sh)
    dup = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                dup.add(a)
                dup.add(b)
    xd = [int(r.n_chars) for r in d.itertuples() if r.doc_id in dup]
    xn = [int(r.n_chars) for r in d.itertuples() if r.doc_id not in dup]
    md, mn = sum(xd) / len(xd), sum(xn) / len(xn)
    vd = sum((x - md) ** 2 for x in xd) / (len(xd) - 1)
    vn = sum((x - mn) ** 2 for x in xn) / (len(xn) - 1)
    z = (md - mn) / math.sqrt(vd / len(xd) + vn / len(xn))
    assert (row["n_dup"], row["n_nondup"]) == (len(xd), len(xn))
    assert abs(row["mean_chars_dup"] - md) < 1e-4
    assert abs(row["mean_chars_nondup"] - mn) < 1e-4
    assert abs(row["welch_z"] - z) < 1e-4


def test_balance_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_kfold_label_balance

    got = {
        r["fold"]: (
            r["n_classes"],
            r["min_share"],
            r["max_share"],
            r["imbalance_ratio"],
        )
        for r in q_kfold_label_balance(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    e["fold"] = [_h60(f"{i}:fold") % 5 for i in e["vec_id"]]
    for fold, g in e.groupby("fold"):
        shares = sorted(
            round(c / len(g), 6)
            for c in g.groupby("label").size()
        )
        gn, gmin, gmax, gr = got[fold]
        assert gn == len(shares)
        assert abs(gmin - shares[0]) < 1e-6
        assert abs(gmax - shares[-1]) < 1e-6
        assert abs(gr - shares[-1] / shares[0]) < 1e-4
        # the audit's point: unstratified folds are imbalanced
        assert gr > 1.0


def test_waterfall_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_gate_waterfall

    row = q_gate_waterfall(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    g1 = g2 = g3 = 0
    for r in d.itertuples():
        toks = [t for t in r.text.strip().lower().split() if t]
        rep = round(1 - len(set(toks)) / len(toks), 6) if toks else 1.0
        p1 = r.n_chars >= 100
        p2 = p1 and rep <= 0.9
        p3 = p2 and len(toks) >= 20
        g1 += p1
        g2 += p2
        g3 += p3
    assert row["n_input"] == len(d)
    assert (row["pass_length"], row["pass_repetition"]) == (g1, g2)
    assert row["pass_min_tokens"] == g3
    assert abs(row["survival_rate"] - g3 / len(d)) < 1e-6
    # the funnel only narrows
    assert len(d) >= g1 >= g2 >= g3
