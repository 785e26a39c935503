"""Plan pins, partition invariance, and python twins for the round-48
wave (Kneser-Ney bigrams / span-corruption plan / temperature sweep /
pack attention leakage / alpha sampling / dup-cluster purity).
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


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().strip().split(" ") if t]


# ---------------------------------------------------------------------------
# structural properties


def test_kn_probabilities_valid(spark):
    from llmaix_spark.plans.queries import q_kneser_ney_bigram

    rows = q_kneser_ney_bigram(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 < r["p_kn"] <= 1
        assert 0 < r["lambda_u"] <= 1
        assert 0 < r["p_cont"] <= 1
        # discounting: p_kn is below the raw MLE for observed bigrams
        # only when the backoff mass doesn't dominate — sanity bound
        assert r["c"] >= 1


def test_span_plan_rates(spark):
    from llmaix_spark.plans.queries import q_span_corruption_plan

    row = q_span_corruption_plan(spark, SF_DIR).collect()[0]
    # ~5% starts × span 3 ≈ 14% masked, merging shrinks it slightly
    assert 0.05 < row["masked_share"] < 0.25
    # merged spans are at least the base span length... unless clipped
    # at a document end, so the mean sits near 3
    assert 2.0 <= row["mean_span_len"] <= 6.0
    assert row["masked_tokens"] <= row["total_tokens"]


def test_temperature_flattens(spark):
    from llmaix_spark.plans.queries import q_temperature_sweep

    rows = {r["temperature"]: r for r in q_temperature_sweep(spark, SF_DIR).collect()}
    assert set(rows) == {0.5, 1.0, 2.0}
    # higher temperature flattens: effective vocab grows, top-1 shrinks
    assert (
        rows[0.5]["effective_vocab"]
        < rows[1.0]["effective_vocab"]
        < rows[2.0]["effective_vocab"]
    )
    assert rows[0.5]["top1_share"] > rows[2.0]["top1_share"]


def test_leakage_grows_with_budget(spark):
    from llmaix_spark.plans.queries import q_pack_attention_leakage

    rows = {r["budget"]: r for r in q_pack_attention_leakage(spark, SF_DIR).collect()}
    assert set(rows) == {128, 256, 512}
    # bigger packs hold more docs → more cross-doc attention pairs
    assert (
        rows[128]["docs_per_pack"]
        < rows[256]["docs_per_pack"]
        < rows[512]["docs_per_pack"]
    )
    assert (
        rows[128]["leakage_share"]
        < rows[256]["leakage_share"]
        < rows[512]["leakage_share"]
    )
    for r in rows.values():
        assert 0 <= r["leakage_share"] < 1


def test_alpha_lifts_tail(spark):
    from llmaix_spark.plans.queries import q_alpha_sampling_sweep

    rows = {r["alpha"]: r for r in q_alpha_sampling_sweep(spark, SF_DIR).collect()}
    assert set(rows) == {0.3, 0.7, 1.0}
    # smaller alpha flattens the language mix
    assert (
        rows[0.3]["effective_languages"]
        >= rows[0.7]["effective_languages"]
        >= rows[1.0]["effective_languages"]
    )
    assert rows[0.3]["min_share"] >= rows[1.0]["min_share"]


def test_purity_bounds(spark):
    from llmaix_spark.plans.queries import q_dup_cluster_purity

    row = q_dup_cluster_purity(spark, SF_DIR).collect()[0]
    assert row["n_clusters"] > 0
    assert 0 < row["mean_purity"] <= 1
    assert abs(
        row["share_single_source"] + row["share_cross_source"] - 1.0
    ) < 1e-6


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "kneser_ney_bigram",
        "span_corruption_plan",
        "temperature_sweep",
        "pack_attention_leakage",
        "alpha_sampling_sweep",
        "dup_cluster_purity",
    ],
)
def test_wave48_partition_invariance(spark, qname):
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


def test_kn_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_kneser_ney_bigram

    got = [
        (r["u"], r["w"], r["c"], r["p_kn"], r["lambda_u"], r["p_cont"])
        for r in q_kneser_ney_bigram(spark, SF_DIR).collect()
    ]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    bg: Counter = Counter()
    for r in d.itertuples():
        toks = _tokens(r.text)
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
    cu: Counter = Counter()
    n1p: Counter = Counter()
    cont: Counter = Counter()
    for (u, w), c in bg.items():
        cu[u] += c
        n1p[u] += 1
        cont[w] += 1
    bt = len(bg)
    top = sorted(bg.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    for (u, w), c in top:
        pkn = max(c - 0.75, 0) / cu[u] + (0.75 * n1p[u] / cu[u]) * (
            cont[w] / bt
        )
        g = next(x for x in got if x[0] == u and x[1] == w)
        assert g[2] == c
        assert abs(g[3] - pkn) < 1e-6
        assert abs(g[4] - 0.75 * n1p[u] / cu[u]) < 1e-6
        assert abs(g[5] - cont[w] / bt) < 1e-6


def test_span_plan_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_span_corruption_plan

    row = q_span_corruption_plan(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    total = 0
    n_spans = 0
    masked = 0
    for r in d.itertuples():
        toks = _tokens(r.text)
        total += len(toks)
        did = int(r.doc_id)
        cov = set()
        for pos in range(len(toks)):
            if _h60(f"{did}:{pos}:span") % 20 == 0:
                cov |= {p for p in (pos, pos + 1, pos + 2) if p < len(toks)}
        covs = sorted(cov)
        for i, p in enumerate(covs):
            if i == 0 or covs[i - 1] != p - 1:
                n_spans += 1
        masked += len(cov)
    assert row["n_docs"] == len(d)
    assert row["total_tokens"] == total
    assert (row["n_spans"], row["masked_tokens"]) == (n_spans, masked)
    assert abs(row["masked_share"] - masked / total) < 1e-6


def test_temperature_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_temperature_sweep

    got = {r["temperature"]: r for r in q_temperature_sweep(spark, SF_DIR).collect()}

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    cnt: Counter = Counter()
    for r in d.itertuples():
        cnt.update(_tokens(r.text))
    for t_ in (0.5, 1.0, 2.0):
        wu = {w: _rnd(math.exp(math.log(c) / t_) * 1e6) for w, c in cnt.items()}
        tw = sum(wu.values())
        hn = sum(
            _rnd(-(v / tw) * math.log(v / tw) * 1e9) for v in wu.values()
        )
        g = got[t_]
        assert abs(g["effective_vocab"] - math.exp(hn / 1e9)) < 1e-4
        assert abs(g["top1_share"] - max(wu.values()) / tw) < 1e-6


def test_leakage_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_pack_attention_leakage

    got = {r["budget"]: r for r in q_pack_attention_leakage(spark, SF_DIR).collect()}

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    rows = sorted(
        (int(r.doc_id), int(r.doc_id) % 32, len(_tokens(r.text)))
        for r in d.itertuples()
    )
    for budget in (128, 256, 512):
        packs = defaultdict(list)
        cum: dict[int, int] = {}
        for doc, shard, nt in rows:
            start = cum.get(shard, 0)
            packs[(shard, start // budget)].append(nt)
            cum[shard] = start + nt
        n_docs = sum(len(v) for v in packs.values())
        l2 = sum(sum(v) ** 2 for v in packs.values())
        s2 = sum(sum(x * x for x in v) for v in packs.values())
        g = got[budget]
        assert g["n_packs"] == len(packs)
        assert abs(g["docs_per_pack"] - n_docs / len(packs)) < 1e-6
        assert abs(g["leakage_share"] - (l2 - s2) / l2) < 1e-6


def test_alpha_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_alpha_sampling_sweep

    got = {r["alpha"]: r for r in q_alpha_sampling_sweep(spark, SF_DIR).collect()}

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    cnt: Counter = Counter()
    for r in d.itertuples():
        cnt[r.lang] += len(_tokens(r.text))
    t0 = sum(cnt.values())
    for a_ in (0.3, 0.7, 1.0):
        wu = {
            l_: _rnd(math.exp(math.log(c / t0) * a_) * 1e6)
            for l_, c in cnt.items()
        }
        tw = sum(wu.values())
        hn = sum(
            _rnd(-(v / tw) * math.log(v / tw) * 1e9) for v in wu.values()
        )
        g = got[a_]
        assert abs(g["effective_languages"] - math.exp(hn / 1e9)) < 1e-5
        assert abs(g["max_share"] - max(wu.values()) / tw) < 1e-6
        assert abs(g["min_share"] - min(wu.values()) / tw) < 1e-6


def test_purity_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_dup_cluster_purity

    row = q_dup_cluster_purity(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    def shingles(text):
        toks = text.strip().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sh = {int(r.doc_id): shingles(r.text) for r in d.itertuples()}
    src = {int(r.doc_id): r.source for r in d.itertuples()}
    ids = sorted(sh)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    groups = defaultdict(list)
    for i in ids:
        groups[find(i)].append(i)
    clusters = [g for g in groups.values() if len(g) >= 2]
    n_docs = sum(len(g) for g in clusters)
    pur_u = 0
    single = 0
    for g in clusters:
        srcs = Counter(src[i] for i in g)
        pur_u += _rnd(max(srcs.values()) * 1e6 / len(g))
        single += 1 if len(srcs) == 1 else 0
    assert row["n_clusters"] == len(clusters)
    assert row["n_docs"] == n_docs
    assert abs(row["mean_purity"] - pur_u / (len(clusters) * 1e6)) < 1e-6
    assert abs(row["share_single_source"] - single / len(clusters)) < 1e-6
