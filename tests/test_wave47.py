"""Plan pins, partition invariance, and python twins for the round-47
wave (weak-supervision vote / k-center coreset / ridge λ sweep /
prefix-cache savings / pruning-score sweep / mixture water-filling).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rnd(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = text.strip().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().strip().split(" ") if t]


# ---------------------------------------------------------------------------
# structural properties


def test_ws_majority_beats_weakest_lf(spark):
    from llmaix_spark.plans.queries import q_weak_supervision_vote

    rows = {r["labeler"]: r for r in q_weak_supervision_vote(spark, SF_DIR).collect()}
    assert set(rows) == {"lf1", "lf2", "lf3", "maj"}
    # majority precision is at least the weakest single LF's
    lf_prec = [rows[k]["prec"] for k in ("lf1", "lf2", "lf3")]
    assert rows["maj"]["prec"] >= min(lf_prec) - 1e-9
    for r in rows.values():
        assert 0 <= r["prec"] <= 1 and 0 <= r["recall"] <= 1


def test_kcenter_distances_non_increasing(spark):
    """Greedy farthest-point: each pick's min-distance can only
    shrink (it's the max over a set that loses its previous max)."""
    from llmaix_spark.plans.queries import q_kcenter_coreset

    rows = sorted(tuple(r) for r in q_kcenter_coreset(spark, SF_DIR).collect())
    assert [r[0] for r in rows] == [1, 2, 3, 4, 5]
    assert rows[0][2] is None
    ds = [r[2] for r in rows[1:]]
    for a, b in zip(ds, ds[1:]):
        assert b <= a + 1e-9
    assert len({r[1] for r in rows}) == 5


def test_ridge_shrinkage_monotone(spark):
    from llmaix_spark.plans.queries import q_ridge_lambda_sweep

    rows = {r["lambda"]: r for r in q_ridge_lambda_sweep(spark, SF_DIR).collect()}
    assert set(rows) == {0, 10**6, 10**7}
    # |β| shrinks monotonically with λ
    assert abs(rows[0]["beta"]) >= abs(rows[10**6]["beta"]) >= abs(
        rows[10**7]["beta"]
    )
    # chars ~ tokens is strongly positive
    assert rows[0]["beta"] > 0


def test_prefix_savings_monotone_docs(spark):
    from llmaix_spark.plans.queries import q_prefix_cache_savings

    rows = {r["k_tokens"]: r for r in q_prefix_cache_savings(spark, SF_DIR).collect()}
    assert set(rows) == {1, 2, 4, 8}
    # longer prefixes can only be shared by FEWER docs
    assert (
        rows[1]["n_docs_sharing"]
        >= rows[2]["n_docs_sharing"]
        >= rows[4]["n_docs_sharing"]
        >= rows[8]["n_docs_sharing"]
    )
    for r in rows.values():
        assert 0 <= r["share_of_corpus"] <= 1


def test_pruning_monotone(spark):
    from llmaix_spark.plans.queries import q_pruning_score_sweep

    rows = {r["keep_pct"]: r for r in q_pruning_score_sweep(spark, SF_DIR).collect()}
    assert set(rows) == {90, 70, 50}
    # keeping less keeps easier examples: mean score non-increasing
    assert (
        rows[90]["mean_score"]
        >= rows[70]["mean_score"]
        >= rows[50]["mean_score"]
    )
    assert rows[90]["n_kept"] > rows[70]["n_kept"] > rows[50]["n_kept"]
    for r in rows.values():
        assert 0 < r["class_balance"] <= 1


def test_waterfill_budget_identity(spark):
    from llmaix_spark.plans.queries import q_mixture_waterfill

    rows = q_mixture_waterfill(spark, SF_DIR).collect()
    total = sum(r["tokens"] for r in rows)
    alloc = sum(r["allocated"] for r in rows)
    # allocations hit the half-corpus budget (to cap rounding)
    assert abs(alloc - total // 2) <= len(rows)
    caps = {r["cap"] for r in rows}
    assert len(caps) == 1
    for r in rows:
        assert r["allocated"] <= r["tokens"] + 1e-9
        assert abs(r["allocated"] - min(r["tokens"], r["cap"])) < 1e-6


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "weak_supervision_vote",
        "kcenter_coreset",
        "ridge_lambda_sweep",
        "prefix_cache_savings",
        "pruning_score_sweep",
        "mixture_waterfill",
    ],
)
def test_wave47_partition_invariance(spark, qname):
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


def test_ws_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_weak_supervision_vote

    got = {r["labeler"]: r for r in q_weak_supervision_vote(spark, SF_DIR).collect()}

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sh = {int(r.doc_id): _shingles(r.text) for r in d.itertuples()}
    ids = sorted(sh)
    dup = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                dup |= {a, b}
    df_sh: Counter = Counter()
    for s_ in sh.values():
        df_sh.update(s_)
    lf = {}
    chars = {int(r.doc_id): int(r.n_chars) for r in d.itertuples()}
    for r in d.itertuples():
        did = int(r.doc_id)
        toks = _tokens(r.text)
        mr = round(Counter(toks).most_common(1)[0][1] / len(toks), 6)
        lf1 = mr >= 0.09
        lf2 = any(2 <= df_sh[s_] <= 3 for s_ in sh[did])
        lf3 = any(
            abs(chars[did] - c) <= 20 for j, c in chars.items() if j != did
        )
        lf[did] = (lf1, lf2, lf3)
    ny = len(dup)
    for i, name in enumerate(("lf1", "lf2", "lf3")):
        flagged = [d_ for d_, v in lf.items() if v[i]]
        tp = sum(1 for d_ in flagged if d_ in dup)
        g = got[name]
        assert (g["n_flagged"], g["tp"]) == (len(flagged), tp)
        assert abs(g["prec"] - tp / len(flagged)) < 1e-6
        assert abs(g["recall"] - tp / ny) < 1e-6
    maj = [d_ for d_, v in lf.items() if sum(v) >= 2]
    tp = sum(1 for d_ in maj if d_ in dup)
    g = got["maj"]
    assert (g["n_flagged"], g["tp"]) == (len(maj), tp)


def test_kcenter_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_kcenter_coreset

    got = sorted(tuple(r) for r in q_kcenter_coreset(spark, SF_DIR).collect())

    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    q = {
        int(r.vec_id): [_rnd(float(v) * 1e6) for v in r.embedding]
        for r in e.itertuples()
    }

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(q[a], q[b]))

    picked = [min(q)]
    want = [(1, picked[0], None)]
    dmin = {}
    for r in range(2, 6):
        last = picked[-1]
        for v in q:
            dd = float(d2(v, last))
            dmin[v] = dd if v not in dmin else min(dmin[v], dd)
        best = max(
            ((dm, -v) for v, dm in dmin.items() if v not in picked),
        )
        v = -best[1]
        picked.append(v)
        want.append((r, v, round(math.sqrt(best[0]) / 1e6, 6)))
    assert got == want


def test_ridge_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_ridge_lambda_sweep

    got = {r["lambda"]: r for r in q_ridge_lambda_sweep(spark, SF_DIR).collect()}

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    rows = [
        (
            len(_tokens(r.text)),
            int(r.n_chars),
            _h60(f"{int(r.doc_id)}:split") % 10000 < 9000,
        )
        for r in d.itertuples()
    ]
    tr = [(x, y) for x, y, t in rows if t]
    te = [(x, y) for x, y, t in rows if not t]
    n = len(tr)
    sx = sum(x for x, _ in tr)
    sy = sum(y for _, y in tr)
    sxy = sum(x * y for x, y in tr)
    sxx = sum(x * x for x, _ in tr)
    for lam in (0, 10**6, 10**7):
        beta = round(
            (float(sxy) * n - float(sx) * float(sy))
            / (float(sxx) * n - float(sx) * float(sx)
               + lam * float(n) * float(n)),
            9,
        )
        alpha = round(sy / n - beta * (sx / n), 9)
        se = sum(_rnd((y - (alpha + beta * x)) ** 2 * 1e6) for x, y in te)
        g = got[lam]
        assert g["n_test"] == len(te)
        assert abs(g["beta"] - round(beta, 6)) < 1e-9
        assert abs(g["intercept"] - round(alpha, 6)) < 1e-9
        assert abs(g["test_mse"] - se / (len(te) * 1e6)) < 1e-6


def test_prefix_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_prefix_cache_savings

    got = {r["k_tokens"]: r for r in q_prefix_cache_savings(spark, SF_DIR).collect()}

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    toks = [_tokens(r.text) for r in d.itertuples()]
    total = sum(len(t) for t in toks)
    for k in (1, 2, 4, 8):
        groups = Counter(
            " ".join(t[:k]) for t in toks if len(t) >= k
        )
        shared = {p: g for p, g in groups.items() if g >= 2}
        saved = sum((g - 1) * k for g in shared.values())
        gg = got[k]
        assert gg["n_shared_prefixes"] == len(shared)
        assert gg["n_docs_sharing"] == sum(shared.values())
        assert gg["tokens_saved"] == saved
        assert abs(gg["share_of_corpus"] - saved / total) < 1e-6


def test_pruning_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_pruning_score_sweep

    got = {r["keep_pct"]: r for r in q_pruning_score_sweep(spark, SF_DIR).collect()}

    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    q = {
        int(r.vec_id): ([_rnd(float(v) * 1e6) for v in r.embedding], int(r.label))
        for r in e.itertuples()
    }
    dim = len(next(iter(q.values()))[0])
    per = defaultdict(list)
    for v, (vec, lbl) in q.items():
        per[lbl].append(v)
    cen = {
        lbl: [sum(q[v][0][d] for v in vs) for d in range(dim)]
        for lbl, vs in per.items()
    }
    nl = {lbl: len(vs) for lbl, vs in per.items()}
    score = {}
    for v, (vec, lbl) in q.items():
        num = sum(
            (x * nl[lbl] - s) ** 2 for x, s in zip(vec, cen[lbl])
        )
        score[v] = float(num) / (nl[lbl] * nl[lbl])
    order = sorted(q, key=lambda v: (score[v], v))
    n = len(order)
    for qk in (90, 70, 50):
        keep = order[: n * qk // 100]
        bal = Counter(q[v][1] for v in keep)
        su = sum(_rnd(score[v] / 1e6) for v in keep)
        g = got[qk]
        assert g["n_kept"] == len(keep)
        assert abs(g["class_balance"] - min(bal.values()) / max(bal.values())) < 1e-6
        assert abs(g["mean_score"] - su / (len(keep) * 1e6)) < 1e-6


def test_waterfill_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_mixture_waterfill

    got = {r["source"]: r for r in q_mixture_waterfill(spark, SF_DIR).collect()}

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ts = defaultdict(int)
    for r in d.itertuples():
        ts[r.source] += len(_tokens(r.text))
    b = sum(ts.values()) // 2
    order = sorted(ts.items(), key=lambda kv: (kv[1], kv[0]))
    ns = len(order)
    pfx = 0
    cap = None
    for i, (src, t) in enumerate(order, start=1):
        cap_try = (b - pfx) / (ns - i + 1)
        if t >= cap_try:
            cap = round(cap_try, 6)
            break
        pfx += t
    for src, t in ts.items():
        g = got[src]
        assert g["tokens"] == t
        assert g["cap"] == cap
        assert abs(g["allocated"] - round(min(float(t), cap), 6)) < 1e-9
        assert abs(g["kept_share"] - round(min(float(t), cap) / t, 6)) < 1e-9
