"""Plan pins, partition invariance, and python twins for the round-53
wave (prequential accuracy / frequency capping / histogram cardinality
/ randomized response / bandit replay / embedding isotropy).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rnd(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


# ---------------------------------------------------------------------------
# structural properties


def test_prequential_bounds(spark):
    from llmaix_spark.plans.queries import q_prequential_accuracy

    row = q_prequential_accuracy(spark, SF_DIR).collect()[0]
    assert 0 < row["n_scored"]
    assert 0 <= row["prequential_acc"] <= 1
    assert row["n_correct"] <= row["n_scored"]


def test_capping_monotone(spark):
    from llmaix_spark.plans.queries import q_frequency_capping

    rows = {r["cap_k"]: r for r in q_frequency_capping(spark, SF_DIR).collect()}
    assert set(rows) == {1, 3, 10}
    assert (
        rows[1]["kept_events"] <= rows[3]["kept_events"] <= rows[10]["kept_events"]
    )
    # capping keeps at least one event per (user, type): reach intact
    for r in rows.values():
        assert r["full_reach"]


def test_histogram_estimates_close(spark):
    from llmaix_spark.plans.queries import q_histogram_cardinality

    rows = q_histogram_cardinality(spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        # a 16-bucket histogram on a smooth distribution stays within
        # a modest relative error
        assert r["rel_err"] < 0.5
        assert r["est_rows"] >= 0


def test_rr_debiasing_helps(spark):
    from llmaix_spark.plans.queries import q_randomized_response

    row = q_randomized_response(spark, SF_DIR).collect()[0]
    # the raw reported rate is pulled toward 1/2; debiasing recovers
    raw_err = abs(row["reported_rate"] - row["true_rate"])
    assert row["abs_err"] < raw_err
    assert 0 <= row["debiased_rate"] <= 1


def test_bandit_regret_nonnegative(spark):
    from llmaix_spark.plans.queries import q_bandit_replay_regret

    row = q_bandit_replay_regret(spark, SF_DIR).collect()[0]
    # the best fixed arm in hindsight dominates any causal policy
    assert row["regret"] >= -1e-6
    assert 0 <= row["n_explore"] <= row["n_months"]
    assert row["policy_reward"] <= row["best_fixed_reward"] + 1e-6


def test_isotropy_random_embeddings(spark):
    from llmaix_spark.plans.queries import q_embedding_isotropy

    row = q_embedding_isotropy(spark, SF_DIR).collect()[0]
    # near-isotropic random vectors: mean cosine near 0, |cos| small
    assert abs(row["mean_cos"]) < 0.2
    assert row["mean_abs_cos"] < 0.5
    assert row["mean_abs_cos"] >= abs(row["mean_cos"]) - 1e-9


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "prequential_accuracy",
        "frequency_capping",
        "histogram_cardinality",
        "randomized_response",
        "bandit_replay_regret",
        "embedding_isotropy",
    ],
)
def test_wave53_partition_invariance(spark, qname):
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


def test_prequential_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_prequential_accuracy

    row = q_prequential_accuracy(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet").sort_values("doc_id")
    seen: Counter = Counter()
    n_scored = n_correct = 0
    for r in d.itertuples():
        if seen:
            pred = min(
                (l_ for l_ in seen if seen[l_] == max(seen.values())),
            )
            n_scored += 1
            n_correct += pred == r.lang
        seen[r.lang] += 1
    assert (row["n_scored"], row["n_correct"]) == (n_scored, n_correct)
    assert abs(row["prequential_acc"] - n_correct / n_scored) < 1e-6


def test_capping_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_frequency_capping

    got = {r["cap_k"]: r for r in q_frequency_capping(spark, SF_DIR).collect()}

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e.assign(us=e["ts"].astype("datetime64[ns]").astype("int64") // 1000)
    ranks = []
    for (_, _), g in e.groupby(["user_id", "event_type"]):
        seq = sorted(zip(g["us"].astype(int), g["event_id"].astype(int)))
        ranks.extend(
            (int(g.iloc[0]["user_id"]), i + 1) for i in range(len(seq))
        )
    n = len(ranks)
    for k in (1, 3, 10):
        kept = [u for u, rk in ranks if rk <= k]
        g = got[k]
        assert g["kept_events"] == len(kept)
        assert abs(g["kept_share"] - len(kept) / n) < 1e-6


def test_rr_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_randomized_response

    row = q_randomized_response(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    n = len(o)
    sy = sr = 0
    for k, p in zip(o["o_orderkey"], o["o_orderpriority"]):
        y = 1 if p == "1-URGENT" else 0
        sy += y
        if _h60(f"{int(k)}:rr1") % 4 == 0:
            sr += _h60(f"{int(k)}:rr2") % 2
        else:
            sr += y
    deb = (sr / n - 0.125) / 0.75
    assert row["n"] == n
    assert abs(row["true_rate"] - sy / n) < 1e-6
    assert abs(row["reported_rate"] - sr / n) < 1e-6
    assert abs(row["debiased_rate"] - deb) < 1e-6


def test_bandit_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_bandit_replay_regret

    row = q_bandit_replay_regret(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e.assign(mo=e["ts"].dt.to_period("M"))
    stats = defaultdict(lambda: [0, 0])
    for mo, a, v in zip(e["mo"], e["event_type"], e["value"]):
        st = stats[(mo, a)]
        st[0] += _rnd(v * 100)
        st[1] += 1
    months = sorted({m for m, _ in stats})
    types = sorted({a for _, a in stats})
    k = len(types)
    cs = {a: 0 for a in types}
    cn = {a: 0 for a in types}
    pol = 0
    n_explore = 0
    for mi, mo in enumerate(months):
        if _h60(f"m{mi}") % 5 == 0:
            a = types[mi % k]
            n_explore += 1
        else:
            qs = {
                a: (_rnd(cs[a] * 1e6 / cn[a]) if cn[a] > 0 else -1)
                for a in types
            }
            a = min(a_ for a_ in types if qs[a_] == max(qs.values()))
        s, nn = stats.get((mo, a), (0, 0))
        pol += _rnd(s * 1e6 / nn) if nn > 0 else 0
        for a_ in types:
            s_, n_ = stats.get((mo, a_), (0, 0))
            cs[a_] += s_
            cn[a_] += n_
    best = max(
        (
            sum(
                _rnd(stats[(mo, a)][0] * 1e6 / stats[(mo, a)][1])
                if (mo, a) in stats and stats[(mo, a)][1] > 0
                else 0
                for mo in months
            ),
            a,
        )
        for a in types
    )[0]
    assert row["n_months"] == len(months)
    assert row["n_explore"] == n_explore
    assert abs(row["policy_reward"] - pol / 1e8) < 1e-6
    assert abs(row["best_fixed_reward"] - best / 1e8) < 1e-6
    assert abs(row["regret"] - (best - pol) / 1e8) < 1e-6


def test_isotropy_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_embedding_isotropy

    row = q_embedding_isotropy(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    q = {
        int(r.vec_id): [_rnd(float(v) * 1e6) for v in r.embedding]
        for r in e.itertuples()
    }
    ids = sorted(q)
    half = len(ids) // 2
    cus = []
    for r in range(len(ids) - half):
        a, b = ids[r], ids[r + half]
        dot = sum(x * y for x, y in zip(q[a], q[b]))
        cus.append(
            _rnd(
                dot
                / (
                    math.sqrt(sum(x * x for x in q[a]))
                    * math.sqrt(sum(y * y for y in q[b]))
                )
                * 1e6
            )
        )
    assert row["n_pairs"] == len(cus)
    assert abs(row["mean_cos"] - sum(cus) / (len(cus) * 1e6)) < 1e-6
    assert abs(
        row["mean_abs_cos"] - sum(abs(c) for c in cus) / (len(cus) * 1e6)
    ) < 1e-6


def test_histogram_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_histogram_cardinality

    got = {r["predicate"]: r for r in q_histogram_cardinality(spark, SF_DIR).collect()}

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cs = [_rnd(p * 100) for p in o["o_totalprice"]]
    lo, hi, n = min(cs), max(cs), len(cs)
    width = (hi - lo + 1) / 16
    hist = Counter(min(15, (c - lo) * 16 // (hi - lo + 1)) for c in cs)

    def est_ge(thr):
        tot = 0.0
        for b in range(16):
            blo, bhi = lo + b * width, lo + (b + 1) * width
            cnt = hist.get(b, 0)
            if thr <= blo:
                tot += cnt
            elif thr < bhi:
                tot += cnt * (bhi - thr) / width
        return tot

    cases = {
        "c>=10000000": (
            sum(1 for c in cs if c >= 10_000_000), est_ge(10_000_000)
        ),
        "c in [5000000,10000000)": (
            sum(1 for c in cs if 5_000_000 <= c < 10_000_000),
            est_ge(5_000_000) - est_ge(10_000_000),
        ),
        "c<2500000": (
            sum(1 for c in cs if c < 2_500_000), n - est_ge(2_500_000)
        ),
    }
    for name, (true_n, est) in cases.items():
        g = got[name]
        assert g["true_rows"] == true_n
        assert abs(g["est_rows"] - est) < 1e-3
