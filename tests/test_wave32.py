"""Plan pins, partition invariance, and python twins for the round-32
wave (LSH S-curve / dedup scaling / held-out perplexity / hard
negatives / quality fusion / split token chi2).
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


def test_s_curve_no_cartesian(spark):
    from llmaix_spark.plans.queries import q_lsh_s_curve

    plan = _phys(q_lsh_s_curve(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_scaling_pair_table_checkpointed(spark):
    from llmaix_spark.plans.queries import q_dedup_scaling_curve

    plan = _phys(q_dedup_scaling_curve(spark, SF_DIR))
    # the 4-row pct sweep joins the (tiny) pair table — broadcast NLJ
    assert "SortMergeJoin" not in plan


def test_heldout_freq_broadcast(spark):
    from llmaix_spark.plans.queries import q_heldout_perplexity

    plan = _phys(q_heldout_perplexity(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_hard_negatives_bucket_equijoin(spark):
    from llmaix_spark.plans.queries import q_hard_negatives

    plan = _phys(q_hard_negatives(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_fusion_bounded_windows(spark):
    from llmaix_spark.plans.queries import q_quality_fusion

    plan = _phys(q_quality_fusion(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_token_chi2_top_broadcast(spark):
    from llmaix_spark.plans.queries import q_split_token_chi2

    plan = _phys(q_split_token_chi2(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "lsh_s_curve",
        "dedup_scaling_curve",
        "heldout_perplexity",
        "hard_negatives",
        "quality_fusion",
        "split_token_chi2",
    ],
)
def test_wave32_partition_invariance(spark, qname):
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


def test_s_curve_properties(spark):
    """The S-curve's defining property: capture rate rises with J and
    matches theory at the extremes; theory column is the closed form."""
    from llmaix_spark.plans.queries import q_lsh_s_curve

    rows = {
        r["j_bucket"]: (
            r["n_pairs"],
            r["n_candidates"],
            r["empirical_rate"],
            r["theory_rate"],
        )
        for r in q_lsh_s_curve(spark, SF_DIR).collect()
    }
    assert rows
    for jb, (n, c, emp, theo) in rows.items():
        assert 0 <= c <= n
        mid = (jb + 0.5) / 10
        want_theory = round(1 - (1 - mid**2) ** 8, 6)
        assert abs(theo - want_theory) < 1e-6
    buckets = sorted(rows)
    # monotone capture: higher-J buckets are captured at >= rate
    rates = [rows[b][2] for b in buckets]
    assert rates == sorted(rates)
    # high-similarity pairs are all captured; noise pairs mostly not
    assert rows[buckets[-1]][2] >= 0.95
    if buckets[0] == 0:
        assert rows[0][2] < 0.1


def test_scaling_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_dedup_scaling_curve

    got = {
        r["pct"]: (r["n_docs"], r["n_pairs"])
        for r in q_dedup_scaling_curve(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sh = {int(r.doc_id): _shingles(r.text) for r in d.itertuples()}
    ids = sorted(sh)
    pairs = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                pairs.append((a, b))
    m = max(ids)
    for pct in (25, 50, 75, 100):
        cut = m * pct / 100.0
        nd = sum(1 for x in ids if x <= cut)
        np_ = sum(1 for a, b in pairs if a <= cut and b <= cut)
        assert got[pct] == (nd, np_)
    # redundancy grows superlinearly: pair share trails doc share
    assert got[100][1] >= got[50][1] * 2


def test_heldout_matches_python(spark):
    from collections import Counter

    import pandas as pd

    from llmaix_spark.plans.queries import q_heldout_perplexity

    got = {
        r["split"]: (r["n_docs"], r["n_tokens"], r["mean_logprob"])
        for r in q_heldout_perplexity(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    split = {}
    for i in d["doc_id"]:
        b = _h60(f"{i}:split") % 10000
        split[i] = "train" if b < 9000 else ("val" if b < 9500 else "test")
    freq: Counter = Counter()
    for r in d.itertuples():
        if split[r.doc_id] == "train":
            freq.update(t for t in r.text.strip().lower().split() if t)
    vocab, n = len(freq), sum(freq.values())
    per: dict[str, list] = {}
    for r in d.itertuples():
        s = split[r.doc_id]
        if s == "train":
            continue
        toks = [t for t in r.text.strip().lower().split() if t]
        lps = [
            round(math.log10((freq.get(t, 0) + 1.0) / (n + vocab + 1)), 6)
            for t in toks
        ]
        per.setdefault(s, [0, 0, 0.0])
        per[s][0] += 1
        per[s][1] += len(lps)
        per[s][2] += sum(lps)
    for s, (nd, nt, slp) in per.items():
        gn, gt, gm = got[s]
        assert (gn, gt) == (nd, nt)
        assert abs(gm - round(slp / nt, 4)) < 2e-4
    # held-out logprob must be worse than ~uniform-over-vocab ceiling
    for s in per:
        assert got[s][2] < 0


def test_hard_negatives_match_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_hard_negatives

    got = {
        (r["label_a"], r["label_b"]): r["n_hard_pairs"]
        for r in q_hard_negatives(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    rows = []
    for r in e.itertuples():
        v = r.embedding
        bucket = (
            (1 if v[0] > 0 else 0)
            + (2 if v[1] > 0 else 0)
            + (4 if v[2] > 0 else 0)
            + (8 if v[3] > 0 else 0)
        )
        rows.append((int(r.vec_id), int(r.label), bucket))
    want: dict[tuple, int] = {}
    srt = sorted(rows)
    for i, (ia, la, ba) in enumerate(srt):
        for ib, lb, bb in srt[i + 1 :]:
            if ba == bb and la != lb:
                k = (min(la, lb), max(la, lb))
                want[k] = want.get(k, 0) + 1
    assert got == want
    assert want


def test_fusion_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_quality_fusion

    got = {
        r["doc_id"]: (r["rrf_nano"], r["fused_rank"])
        for r in q_quality_fusion(spark, SF_DIR).collect()
    }
    assert len(got) == 50

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sig = []
    for r in d.itertuples():
        toks = [t for t in r.text.strip().lower().split() if t]
        ttr = round(len(set(toks)) / len(toks), 9)
        sig.append((int(r.doc_id), int(r.n_chars), ttr, round(1 - ttr, 9)))
    r1 = {
        doc: i + 1
        for i, (doc, *_rest) in enumerate(
            sorted(sig, key=lambda x: (-x[1], x[0]))
        )
    }
    r2 = {
        doc: i + 1
        for i, (doc, *_rest) in enumerate(
            sorted(sig, key=lambda x: (-x[2], x[0]))
        )
    }
    r3 = {
        doc: i + 1
        for i, (doc, *_rest) in enumerate(
            sorted(sig, key=lambda x: (x[3], x[0]))
        )
    }
    scores = {
        doc: int(
            math.floor(
                (
                    1 / (60 + r1[doc])
                    + 1 / (60 + r2[doc])
                    + 1 / (60 + r3[doc])
                )
                * 1e9
                + 0.5
            )
        )
        for doc, *_ in sig
    }
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    for rank, (doc, s) in enumerate(top, 1):
        assert got[doc] == (s, rank)


def test_token_chi2_matches_python(spark):
    from collections import Counter

    import pandas as pd

    from llmaix_spark.plans.queries import q_split_token_chi2

    row = q_split_token_chi2(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    grp = {
        i: (
            "train"
            if _h60(f"{i}:split") % 10000 < 9000
            else "heldout"
        )
        for i in d["doc_id"]
    }
    train_freq: Counter = Counter()
    toks_by_grp: dict[str, Counter] = {
        "train": Counter(),
        "heldout": Counter(),
    }
    for r in d.itertuples():
        toks = [t for t in r.text.strip().lower().split() if t]
        toks_by_grp[grp[r.doc_id]].update(toks)
        if grp[r.doc_id] == "train":
            train_freq.update(toks)
    top = {
        t
        for t, _ in sorted(
            train_freq.items(), key=lambda kv: (-kv[1], kv[0])
        )[:10]
    }
    cats = sorted(top) + ["__other__"]
    ct = {c: 0 for c in cats}
    ch = {c: 0 for c in cats}
    for t, c in toks_by_grp["train"].items():
        ct[t if t in top else "__other__"] += c
    for t, c in toks_by_grp["heldout"].items():
        ch[t if t in top else "__other__"] += c
    nt, nh = sum(ct.values()), sum(ch.values())
    chi2 = 0.0
    n_cats = 0
    for c in cats:
        rn = ct[c] + ch[c]
        if rn == 0:
            continue
        n_cats += 1
        et = rn * nt / (nt + nh)
        eh = rn * nh / (nt + nh)
        chi2 += (ct[c] - et) ** 2 / et + (ch[c] - eh) ** 2 / eh
    assert row["n_cats"] == n_cats
    assert row["df"] == n_cats - 1
    assert abs(row["chi2"] - chi2) < 1e-4
