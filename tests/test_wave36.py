"""Plan pins, partition invariance, and python twins for the round-36
wave (k-fold LM scores / hybrid dedup / partial correlation / top-k
stability / session geometric fit / revenue VaR-ES).
"""

from __future__ import annotations

import hashlib
import math

import pytest

SF_DIR = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# plan pins


def test_kfold_single_pass_counts(spark):
    """ONE token scan (checkpointed) feeds totals, fold counts, the
    vocab grid and the scoring join — never five LM fits."""
    from llmaix_spark.plans.queries import q_kfold_lm_scores

    plan = _phys(q_kfold_lm_scores(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hybrid_embeddings_broadcast(spark):
    from llmaix_spark.plans.queries import q_hybrid_dedup

    plan = _phys(q_hybrid_dedup(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_partial_corr_one_aggregate(spark):
    from llmaix_spark.plans.queries import q_partial_correlation

    plan = _phys(q_partial_correlation(spark, SF_DIR))
    assert "Join" not in plan
    assert "Window" not in plan


def test_stability_half_partitioned_ranks(spark):
    from llmaix_spark.plans.queries import q_topk_stability

    plan = _phys(q_topk_stability(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_geom_fit_user_partitioned(spark):
    from llmaix_spark.plans.queries import q_session_length_geom

    plan = _phys(q_session_length_geom(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "Join" not in plan


def test_var_es_daily_grain(spark):
    from llmaix_spark.plans.queries import q_revenue_var_es

    plan = _phys(q_revenue_var_es(spark, SF_DIR))
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "kfold_lm_scores",
        "hybrid_dedup",
        "partial_correlation",
        "topk_stability",
        "session_length_geom",
        "revenue_var_es",
    ],
)
def test_wave36_partition_invariance(spark, qname):
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


def test_kfold_matches_python(spark):
    from collections import Counter

    import pandas as pd

    from llmaix_spark.plans.queries import q_kfold_lm_scores

    got = {
        r["fold"]: (r["n_docs"], r["mean_logprob"])
        for r in q_kfold_lm_scores(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    fold = {i: _h60(f"{i}:fold") % 5 for i in d["doc_id"]}
    total: Counter = Counter()
    per_fold: dict[int, Counter] = {f: Counter() for f in range(5)}
    doc_toks = {}
    for r in d.itertuples():
        toks = [t for t in r.text.strip().lower().split() if t]
        doc_toks[r.doc_id] = toks
        total.update(toks)
        per_fold[fold[r.doc_id]].update(toks)
    for f in sorted(set(fold.values())):
        excl = {
            t: total[t] - per_fold[f].get(t, 0) for t in total
        }
        vocab = sum(1 for c in excl.values() if c > 0)
        n = sum(excl.values())
        docs = [i for i in doc_toks if fold[i] == f]
        lps = []
        for i in docs:
            for t in doc_toks[i]:
                lps.append(
                    round(
                        math.log10(
                            (excl.get(t, 0) + 1.0) / (n + vocab + 1)
                        ),
                        6,
                    )
                )
        gn, gm = got[f]
        assert gn == len(docs)
        assert abs(gm - round(sum(lps) / len(lps), 4)) < 2e-4
    # CV folds agree tightly on a homogeneous corpus
    means = [v[1] for v in got.values()]
    assert max(means) - min(means) < 0.05


def test_hybrid_rejects_on_this_fixture(spark):
    from llmaix_spark.plans.queries import q_hybrid_dedup

    rows = q_hybrid_dedup(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1 - 1e-9 <= r["emb_cosine"] <= 1 + 1e-9
        assert r["semantic_confirmed"] == (r["emb_cosine"] >= 0.2)
    # text-independent embeddings: lexical candidates don't confirm
    confirmed = sum(1 for r in rows if r["semantic_confirmed"])
    assert confirmed <= len(rows) * 0.2


def test_partial_corr_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_partial_correlation

    row = q_partial_correlation(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    x, y, z = [], [], []
    for r in d.itertuples():
        toks = [t for t in r.text.strip().lower().split() if t]
        x.append(int(r.n_chars))
        y.append(len(set(toks)))
        z.append(len(toks))
    x, y, z = np.array(x, float), np.array(y, float), np.array(z, float)
    rxy = np.corrcoef(x, y)[0, 1]
    rxz = np.corrcoef(x, z)[0, 1]
    rzy = np.corrcoef(z, y)[0, 1]
    pc = (rxy - rxz * rzy) / math.sqrt((1 - rxz**2) * (1 - rzy**2))
    assert row["n"] == len(d)
    assert abs(row["r_xy"] - rxy) < 1e-4
    assert abs(row["r_xy_given_z"] - pc) < 1e-3
    # the confound collapses: partial ≪ raw
    assert abs(row["r_xy_given_z"]) < abs(row["r_xy"])


def test_stability_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_topk_stability

    got = {
        r["k"]: (r["n_common"], r["stability"])
        for r in q_topk_stability(spark, SF_DIR).collect()
    }
    assert set(got) == {20, 100, 500}

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li["cents"] = np.floor(
        li["l_extendedprice"] * (1 - li["l_discount"]) * 100 + 0.5
    ).astype(int)
    li["half"] = [
        _h60(f"{ok}:{ln}:half") % 2
        for ok, ln in zip(li["l_orderkey"], li["l_linenumber"])
    ]
    tops = {}
    for h, g in li.groupby("half"):
        rev = g.groupby("l_partkey")["cents"].sum()
        ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
        tops[h] = [pk for pk, _ in ranked]
    for k in (20, 100, 500):
        a = set(tops[0][:k])
        b = set(tops[1][:k])
        inter = len(a & b)
        gn, gs = got[k]
        assert gn == inter
        assert abs(gs - inter / k) < 1e-6
    # stability improves with k on noisy leaderboards
    assert got[500][1] >= got[20][1]


def test_geom_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_session_length_geom

    row = q_session_length_geom(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["sec"] = e["ts"].astype("int64") // 1_000_000
    lens = []
    for _, g in e.groupby("user_id"):
        g = g.sort_values(["sec", "event_id"])
        secs = list(g["sec"])
        size = 1
        for a, b in zip(secs, secs[1:]):
            if b - a > 1800:
                lens.append(size)
                size = 1
            else:
                size += 1
        lens.append(size)
    n, s = len(lens), sum(lens)
    assert row["n_sessions"] == n
    assert abs(row["mean_len"] - s / n) < 1e-6
    assert abs(row["geom_p_hat"] - n / s) < 1e-6
    assert 0 < row["geom_p_hat"] <= 1


def test_var_es_matches_python(spark):
    import numpy as np
    import pandas as pd

    from llmaix_spark.plans.queries import q_revenue_var_es

    row = q_revenue_var_es(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["d"] = o["o_orderdate"].astype("int64") // DAY_US
    o["cents"] = np.floor(o["o_totalprice"] * 100 + 0.5).astype(int)
    daily = o.groupby("d")["cents"].sum().reset_index()
    daily = daily.sort_values(["cents", "d"]).reset_index(drop=True)
    n = len(daily)
    k = max(math.ceil(0.05 * n), 1)
    var5 = int(daily.loc[k - 1, "cents"])
    es = daily.loc[: k - 1, "cents"].mean()
    assert (row["n_days"], row["tail_days"]) == (n, k)
    assert abs(row["var5_dollars"] - var5 / 100) < 1e-4
    assert abs(row["es5_dollars"] - es / 100) < 1e-4
    # expected shortfall can't exceed the VaR threshold
    assert row["es5_dollars"] <= row["var5_dollars"] + 1e-9
