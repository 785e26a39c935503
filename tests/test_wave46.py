"""Plan pins, partition invariance, and python twins for the round-46
wave (SimHash angle audit / Haar wavelet / TextTiling / selectivity
audit / Chao1 richness / salting skew audit).
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


def _shingle_list(text: str, n: int = 3) -> list[str]:
    toks = text.strip().split()
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


# ---------------------------------------------------------------------------
# structural properties / plan pins


def test_simhash_estimator_unbiasedish(spark):
    """cos(π·h/64) tracks the true cosine: mean absolute error over
    the pair set stays well under a random guess (~2/π·avg|cos|)."""
    from llmaix_spark.plans.queries import q_simhash_angle_estimate

    rows = q_simhash_angle_estimate(spark, SF_DIR).collect()
    assert len(rows) >= 100
    mae = sum(r["abs_err"] for r in rows) / len(rows)
    assert mae < 0.25  # 64 planes resolve the angle to ~π/64
    for r in rows:
        assert 0 <= r["hamming"] <= 64
        assert -1 <= r["est_cos"] <= 1


def test_haar_parseval_share(spark):
    from llmaix_spark.plans.queries import q_haar_wavelet

    rows = {r["level"]: r for r in q_haar_wavelet(spark, SF_DIR).collect()}
    assert set(rows) == {1, 2, 3}
    assert abs(sum(r["energy_share"] for r in rows.values()) - 1.0) < 1e-5
    for r in rows.values():
        assert r["detail_energy"] >= 0
    # coarser levels have ~half the coefficients
    assert rows[1]["n_detail"] >= rows[2]["n_detail"] >= rows[3]["n_detail"]


def test_texttiling_threshold_shared(spark):
    from llmaix_spark.plans.queries import q_texttiling_segments

    rows = q_texttiling_segments(spark, SF_DIR).collect()
    ths = {r["threshold"] for r in rows}
    assert len(ths) == 1  # one global mean - sd threshold
    for r in rows:
        assert r["is_boundary"] == (r["similarity"] < r["threshold"]) or (
            abs(r["similarity"] - r["threshold"]) < 2e-6
        )


def test_selectivity_single_scan(spark):
    from llmaix_spark.plans.queries import q_selectivity_estimate

    plan = _phys(q_selectivity_estimate(spark, SF_DIR))
    assert "Join" not in plan
    rows = {r["combo"]: r for r in q_selectivity_estimate(spark, SF_DIR).collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert r["true_rows"] >= 0 and r["est_rows"] >= 0


def test_chao1_bounds(spark):
    from llmaix_spark.plans.queries import q_chao1_richness

    rows = q_chao1_richness(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        # the estimator only extrapolates UP from the observed count
        assert r["chao1"] >= r["s_obs"]
        assert 0 <= r["coverage"] <= 1


def test_salting_fixes_skew(spark):
    from llmaix_spark.plans.queries import q_salting_skew_audit

    rows = {r["strategy"]: r for r in q_salting_skew_audit(spark, SF_DIR).collect()}
    assert set(rows) == {"raw_key", "salted_key", "row_hash"}
    # 5 event types can use at most 5 of 32 buckets
    assert rows["raw_key"]["buckets_used"] <= 5
    assert rows["salted_key"]["buckets_used"] > rows["raw_key"]["buckets_used"]
    # salting strictly reduces the max-bucket skew; row hash is best
    assert (
        rows["row_hash"]["skew_ratio"]
        <= rows["salted_key"]["skew_ratio"]
        < rows["raw_key"]["skew_ratio"]
    )


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "simhash_angle_estimate",
        "haar_wavelet",
        "texttiling_segments",
        "selectivity_estimate",
        "chao1_richness",
        "salting_skew_audit",
    ],
)
def test_wave46_partition_invariance(spark, qname):
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


def test_simhash_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_simhash_angle_estimate

    got = {
        (r["vec_a"], r["vec_b"]): (r["hamming"], r["true_cos"], r["est_cos"])
        for r in q_simhash_angle_estimate(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    q = {
        int(r.vec_id): [_rnd(float(v) * 1e6) for v in r.embedding]
        for r in e.itertuples()
    }
    dim = len(next(iter(q.values())))
    planes = [
        [1 if _h60(f"sh{k}:d{d}") % 2 == 0 else -1 for d in range(dim)]
        for k in range(64)
    ]
    bits = {
        v: [
            1 if sum(s * x for s, x in zip(pl, vec)) >= 0 else 0
            for pl in planes
        ]
        for v, vec in q.items()
    }
    ids = sorted(q)
    half = len(ids) // 2
    for r in range(len(ids) - half):
        a, b = ids[r], ids[r + half]
        h = sum(x != y for x, y in zip(bits[a], bits[b]))
        dot = sum(x * y for x, y in zip(q[a], q[b]))
        tc = round(
            dot
            / (
                math.sqrt(sum(x * x for x in q[a]))
                * math.sqrt(sum(y * y for y in q[b]))
            ),
            6,
        )
        gh, gt, ge = got[(a, b)]
        assert gh == h
        assert abs(gt - tc) < 1e-9
        assert abs(ge - round(math.cos(math.pi * h / 64), 6)) < 1e-9


def test_haar_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_haar_wavelet

    got = {r["level"]: r for r in q_haar_wavelet(spark, SF_DIR).collect()}

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    daily = sorted(Counter(o["o_orderdate"].dt.date).items())
    cur = [y for _, y in daily]
    energies = {}
    for lvl in (1, 2, 3):
        details = [
            cur[i] - cur[i + 1] for i in range(0, len(cur) - 1, 2)
        ]
        nxt = [
            cur[i] + cur[i + 1] for i in range(0, len(cur) - 1, 2)
        ]
        if len(cur) % 2:
            nxt.append(cur[-1])
        energies[lvl] = (
            len(details), sum(d * d for d in details) / 2**lvl
        )
        cur = nxt
    te = sum(e for _, e in energies.values())
    for lvl, (nd, en) in energies.items():
        g = got[lvl]
        assert g["n_detail"] == nd
        assert abs(g["detail_energy"] - en) < 1e-4
        assert abs(g["energy_share"] - en / te) < 1e-6


def test_texttiling_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_texttiling_segments

    got = {
        r["gap_id"]: (r["similarity"], r["is_boundary"])
        for r in q_texttiling_segments(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    top = d.sort_values(["n_chars", "doc_id"], ascending=[False, True]).iloc[0]
    toks = [t for t in top.text.lower().strip().split(" ") if t]
    blocks = defaultdict(Counter)
    for i, t in enumerate(toks):
        blocks[i // 10][t] += 1
    mb = max(blocks)
    sims = {}
    for b in range(mb):
        ca, cb = blocks[b], blocks[b + 1]
        dot = sum(ca[w] * cb[w] for w in ca if w in cb)
        sims[b] = _rnd(
            dot
            / (
                math.sqrt(sum(v * v for v in ca.values()))
                * math.sqrt(sum(v * v for v in cb.values()))
            )
            * 1e6
        )
    ng = len(sims)
    ms = sum(sims.values())
    vs = sum((ng * s - ms) ** 2 for s in sims.values())
    thr = ms - ng * math.sqrt(vs / (ng * ng * (ng - 1)))
    for b, su in sims.items():
        gs, gb = got[b]
        assert abs(gs - su / 1e6) < 1e-9
        assert gb == (su * ng < thr)


def test_selectivity_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_selectivity_estimate

    got = {r["combo"]: r for r in q_selectivity_estimate(spark, SF_DIR).collect()}

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    p1 = [1 if p == "1-URGENT" else 0 for p in o["o_orderpriority"]]
    p2 = [1 if _rnd(v * 100) >= 15_000_000 else 0 for v in o["o_totalprice"]]
    p3 = [1 if t.year >= 1998 else 0 for t in o["o_orderdate"]]
    n = len(p1)
    s1, s2, s3 = sum(p1), sum(p2), sum(p3)
    combos = {
        "urgent&highprice": (sum(a * b for a, b in zip(p1, p2)), [s1, s2]),
        "urgent&recent": (sum(a * b for a, b in zip(p1, p3)), [s1, s3]),
        "highprice&recent": (sum(a * b for a, b in zip(p2, p3)), [s2, s3]),
        "urgent&highprice&recent": (
            sum(a * b * c for a, b, c in zip(p1, p2, p3)),
            [s1, s2, s3],
        ),
    }
    for name, (true_c, margs) in combos.items():
        est = n
        for m_ in margs:
            est *= m_ / n
        g = got[name]
        assert g["true_rows"] == true_c
        assert abs(g["est_rows"] - est) < 1e-3
        assert abs(g["lift"] - true_c / est) < 1e-4


def test_chao1_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_chao1_richness

    got = {r["source"]: r for r in q_chao1_richness(spark, SF_DIR).collect()}

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    per = defaultdict(Counter)
    for r in d.itertuples():
        per[r.source].update(_shingle_list(r.text))
    for src, occ in per.items():
        s = len(occ)
        f1 = sum(1 for c in occ.values() if c == 1)
        f2 = sum(1 for c in occ.values() if c == 2)
        nt = sum(occ.values())
        g = got[src]
        assert (g["s_obs"], g["f1"], g["f2"]) == (s, f1, f2)
        assert abs(g["chao1"] - (s + f1 * (f1 - 1) / (2 * (f2 + 1)))) < 1e-4
        assert abs(g["coverage"] - (1 - f1 / nt)) < 1e-6


def test_salting_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_salting_skew_audit

    got = {r["strategy"]: r for r in q_salting_skew_audit(spark, SF_DIR).collect()}

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    n = len(e)
    keys = {
        "raw_key": [t for t in e["event_type"]],
        "salted_key": [
            f"{t}:{int(u) % 8}" for t, u in zip(e["event_type"], e["user_id"])
        ],
        "row_hash": [str(int(i)) for i in e["event_id"]],
    }
    for name, ks in keys.items():
        loads = Counter(_h60(k) % 32 for k in ks)
        g = got[name]
        assert g["buckets_used"] == len(loads)
        assert g["max_rows"] == max(loads.values())
        assert abs(g["skew_ratio"] - max(loads.values()) * 32 / n) < 1e-6
