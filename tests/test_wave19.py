"""Plan pins, partition invariance, and python twins for the round-19
wave (ABC classification / NDCG@10 / SRM audit / peak detection /
price dispersion / containment dedup).
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


def test_abc_total_broadcasts_single_window(spark):
    from llmaix_spark.plans.queries import q_abc_classification

    plan = _phys(q_abc_classification(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert plan.count("Window") == 1


def test_ndcg_no_cartesian(spark):
    from llmaix_spark.plans.queries import q_ndcg_at_k

    plan = _phys(q_ndcg_at_k(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # per-source windows hash-partition; never a global range sort
    assert "rangepartitioning" not in plan


def test_srm_no_window_total_broadcasts(spark):
    from llmaix_spark.plans.queries import q_srm_check

    plan = _phys(q_srm_check(spark, SF_DIR))
    assert "Window" not in plan
    assert "BroadcastExchange" in plan


def test_peak_single_window(spark):
    """lag/lead share one window spec — exactly one Window node over
    the (calendar-bounded) daily grain."""
    from llmaix_spark.plans.queries import q_peak_detection

    plan = _phys(q_peak_detection(spark, SF_DIR))
    assert plan.count("Window") == 1


def test_dispersion_no_window_no_join(spark):
    from llmaix_spark.plans.queries import q_price_dispersion

    plan = _phys(q_price_dispersion(spark, SF_DIR))
    assert "Window" not in plan
    assert "Join" not in plan


def test_containment_no_cartesian(spark):
    from llmaix_spark.plans.queries import q_containment_dedup

    plan = _phys(q_containment_dedup(spark, SF_DIR))
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "abc_classification",
        "ndcg_at_k",
        "srm_check",
        "peak_detection",
        "price_dispersion",
        "containment_dedup",
    ],
)
def test_wave19_partition_invariance(spark, qname):
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


def test_abc_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_abc_classification

    got = {
        r["abc"]: (r["n_parts"], r["revenue_cents"], r["rev_share"])
        for r in q_abc_classification(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    import numpy as np

    # HALF_UP like the engines (numpy .round() is banker's)
    li["cents"] = np.floor(
        li["l_extendedprice"] * (1 - li["l_discount"]) * 100 + 0.5
    ).astype(int)
    rev = li.groupby("l_partkey")["cents"].sum().reset_index()
    rev = rev.sort_values(
        ["cents", "l_partkey"], ascending=[False, True]
    ).reset_index(drop=True)
    total = int(rev["cents"].sum())
    want: dict[str, list[int]] = {}
    cum = 0
    for _, row in rev.iterrows():
        cum += int(row["cents"])
        # engine round() is HALF_UP; python round() is banker's
        share = math.floor(cum / total * 1e6 + 0.5) / 1e6
        cls = "A" if share <= 0.8 else ("B" if share <= 0.95 else "C")
        want.setdefault(cls, []).append(int(row["cents"]))
    for cls, vals in want.items():
        n, cents, shr = got[cls]
        assert (n, cents) == (len(vals), sum(vals))
        assert abs(shr - sum(vals) / total) < 1e-6
    assert set(got) == set(want)


def test_ndcg_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_ndcg_at_k

    got = {
        r["source"]: (r["dcg"], r["idcg"], r["ndcg"])
        for r in q_ndcg_at_k(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    d["rel"] = [_h60(f"{i}:rel") % 4 for i in d["doc_id"]]

    def dcg(rels):
        return round(
            sum(
                (2**r - 1) / math.log2(i + 2)
                for i, r in enumerate(rels[:10])
            ),
            6,
        )

    for src, g in d.groupby("source"):
        sys_rels = list(
            g.sort_values(
                ["n_chars", "doc_id"], ascending=[False, True]
            )["rel"]
        )
        ideal_rels = list(
            g.sort_values(["rel", "doc_id"], ascending=[False, True])["rel"]
        )
        gd, gi, gn = got[src]
        assert abs(gd - dcg(sys_rels)) < 1e-6
        assert abs(gi - dcg(ideal_rels)) < 1e-6
        assert abs(gn - gd / gi) < 1e-5
        assert gd <= gi + 1e-9  # system can never beat the ideal


def test_srm_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_srm_check

    got = {
        r["split"]: (r["n_obs"], r["expected"], r["chi2_part"])
        for r in q_srm_check(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    buckets = [_h60(f"{i}:split") % 10000 for i in d["doc_id"]]
    obs = {
        "train": sum(1 for b in buckets if b < 9000),
        "val": sum(1 for b in buckets if 9000 <= b < 9500),
        "test": sum(1 for b in buckets if b >= 9500),
    }
    n = len(buckets)
    ratios = {"train": 0.9, "val": 0.05, "test": 0.05}
    for split, cnt in obs.items():
        exp = n * ratios[split]
        g_n, g_exp, g_chi = got[split]
        assert g_n == cnt
        assert abs(g_exp - exp) < 1e-6
        assert abs(g_chi - (cnt - exp) ** 2 / exp) < 1e-5
    assert sum(v[0] for v in got.values()) == n


def test_peaks_match_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_peak_detection

    got = {
        r["day_idx"]: r["revenue_cents"]
        for r in q_peak_detection(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o["d"] = o["o_orderdate"].astype("int64") // DAY_US
    import numpy as np

    o["cents"] = np.floor(o["o_totalprice"] * 100 + 0.5).astype(int)
    daily = o.groupby("d")["cents"].sum().sort_index()
    days, vals = list(daily.index), list(daily.values)
    want = {}
    for i in range(3, len(vals) - 3):
        v = vals[i]
        if v > max(vals[i - 3 : i]) and v > max(vals[i + 1 : i + 4]):
            want[int(days[i])] = int(v)
    assert got == want
    # a peak is defined against PRESENT neighbors, never edge rows
    assert all(days[3] <= d <= days[-4] for d in got)


def test_dispersion_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_price_dispersion

    got = {
        r["part_key"]: (
            r["n_lines"],
            r["min_cents"],
            r["max_cents"],
            r["spread"],
        )
        for r in q_price_dispersion(spark, SF_DIR).collect()
    }

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    li = li[li["l_quantity"] > 0].copy()
    import numpy as np

    li["unit"] = np.floor(
        li["l_extendedprice"] * 100 / li["l_quantity"] + 0.5
    ).astype(int)
    want = {}
    for pk, g in li.groupby("l_partkey"):
        n, lo, hi = len(g), int(g["unit"].min()), int(g["unit"].max())
        spread = round((hi - lo) / lo, 6)
        if n >= 5 and spread >= 0.05:
            want[pk] = (n, lo, hi)
    assert set(got) == set(want)
    for pk, (n, lo, hi) in want.items():
        gn, glo, ghi, gs = got[pk]
        assert (gn, glo, ghi) == (n, lo, hi)
        assert abs(gs - (hi - lo) / lo) < 1e-6


def _shingles(text: str, n: int = 3) -> set:
    toks = text.strip().split()
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


def test_containment_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_containment_dedup

    got = {
        (r["doc_a"], r["doc_b"]): (
            r["n_common"],
            r["containment_a"],
            r["containment_b"],
        )
        for r in q_containment_dedup(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sh = {int(r.doc_id): _shingles(r.text) for r in d.itertuples()}
    ids = sorted(sh)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            ca = round(inter / len(sh[a]), 6)
            cb = round(inter / len(sh[b]), 6)
            if max(ca, cb) >= 0.8:
                want[(a, b)] = (inter, ca, cb)
    assert got == want
    assert want, "fixture must contain at least one containment pair"


def test_containment_catches_superstring_jaccard_misses(spark):
    """The operator's reason to exist: a short doc embedded in a long
    one has containment 1.0 but Jaccard |A|/|B| below any useful
    threshold."""
    from llmaix_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"tok{i}" for i in range(100))
    df = spark.createDataFrame(
        [(1, short), (2, long)], ["doc_id", "text"]
    )
    rows = containment_pairs(df, 0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["containment_a"] == 1.0
    # Jaccard for the same pair is tiny — the symmetric join misses it
    assert r["n_common"] / (4 + 104 - r["n_common"]) < 0.05
