"""Plan pins, partition invariance, and python twins for the round-51
wave (scaling-law fit / median of means / AMS F2 / systematic sampling
/ permutation entropy / SLO burn rate).
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


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().strip().split(" ") if t]


# ---------------------------------------------------------------------------
# structural properties


def test_scaling_more_data_helps(spark):
    from llmaix_spark.plans.queries import q_scaling_law_fit

    rows = {r["train_pct"]: r for r in q_scaling_law_fit(spark, SF_DIR).collect()}
    assert set(rows) == {10, 30, 50, 90}
    # nested subsets: token counts grow, held-out xent improves
    assert (
        rows[10]["train_tokens"]
        < rows[30]["train_tokens"]
        < rows[50]["train_tokens"]
        < rows[90]["train_tokens"]
    )
    assert rows[90]["heldout_xent"] < rows[10]["heldout_xent"]
    slopes = {r["loglog_slope"] for r in rows.values()}
    assert len(slopes) == 1
    assert slopes.pop() < 0  # the law has the right sign


def test_mom_close_on_clean_data(spark):
    from llmaix_spark.plans.queries import q_median_of_means

    row = q_median_of_means(spark, SF_DIR).collect()[0]
    # no adversarial contamination here: MoM tracks the mean closely
    assert row["rel_gap"] < 0.1
    assert row["median_of_means"] > 0


def test_ams_reasonable(spark):
    from llmaix_spark.plans.queries import q_ams_f2_sketch

    row = q_ams_f2_sketch(spark, SF_DIR).collect()[0]
    assert row["true_f2"] > 0 and row["ams_estimate"] > 0
    # a median of 16 unbiased estimators lands within a small factor
    assert row["rel_err"] < 1.0


def test_systematic_replicates_unbiasedish(spark):
    from llmaix_spark.plans.queries import q_systematic_sampling_bias

    rows = q_systematic_sampling_bias(spark, SF_DIR).collect()
    assert len(rows) == 4
    tms = {r["true_mean"] for r in rows}
    assert len(tms) == 1
    for r in rows:
        assert abs(r["rel_bias"]) < 0.25  # 1/16 sample of ~1.5k rows


def test_pe_bounds(spark):
    from llmaix_spark.plans.queries import q_permutation_entropy

    row = q_permutation_entropy(spark, SF_DIR).collect()[0]
    assert 1 <= row["n_patterns"] <= 6
    assert 0 <= row["normalized_pe"] <= 1 + 1e-9
    # order counts are noisy day to day → complexity is high
    assert row["normalized_pe"] > 0.5


def test_burn_rate_sane(spark):
    from llmaix_spark.plans.queries import q_slo_burn_rate

    row = q_slo_burn_rate(spark, SF_DIR).collect()[0]
    assert row["n_days"] > 0
    # the 7-day window smooths: its max can't exceed the 1-day max
    assert row["max_burn_7d"] <= row["max_burn_1d"] + 1e-9
    assert 0 <= row["n_page_days"] <= row["n_days"]


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "scaling_law_fit",
        "median_of_means",
        "ams_f2_sketch",
        "systematic_sampling_bias",
        "permutation_entropy",
        "slo_burn_rate",
    ],
)
def test_wave51_partition_invariance(spark, qname):
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


def test_scaling_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_scaling_law_fit

    got = {r["train_pct"]: r for r in q_scaling_law_fit(spark, SF_DIR).collect()}

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    docs = [
        (
            _h60(f"{int(r.doc_id)}:split") % 10000,
            _tokens(r.text),
        )
        for r in d.itertuples()
    ]
    test: Counter = Counter()
    for bk, toks in docs:
        if bk >= 9000:
            test.update(toks)
    pts = []
    for pct in (10, 30, 50, 90):
        train: Counter = Counter()
        for bk, toks in docs:
            if bk < pct * 100:
                train.update(toks)
        ntr, v = sum(train.values()), len(train)
        sx = sum(
            _rnd(-math.log((train.get(w, 0) + 1) / (ntr + v)) * tc * 1e9)
            for w, tc in test.items()
        )
        nt = sum(test.values())
        xent = sx / (nt * 1e9)
        pts.append((ntr, xent))
        g = got[pct]
        assert g["train_tokens"] == ntr
        assert abs(g["heldout_xent"] - xent) < 1e-6
    lx = [math.log(n) for n, _ in pts]
    ly = [math.log(x) for _, x in pts]
    k = len(pts)
    slope = (
        k * sum(a * b for a, b in zip(lx, ly)) - sum(lx) * sum(ly)
    ) / (k * sum(a * a for a in lx) - sum(lx) ** 2)
    assert abs(got[10]["loglog_slope"] - slope) < 1e-5


def test_mom_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_median_of_means

    row = q_median_of_means(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    buckets = defaultdict(lambda: [0, 0])
    for p, k in zip(o["o_totalprice"], o["o_orderkey"]):
        b = _h60(f"{int(k)}:mom") % 16
        buckets[b][0] += _rnd(p * 100)
        buckets[b][1] += 1
    means = sorted(s / n for s, n in buckets.values())
    mom = means[7]
    total = sum(s for s, _ in buckets.values())
    n = sum(n for _, n in buckets.values())
    assert row["n"] == n
    assert abs(row["plain_mean"] - total / n / 100) < 1e-6
    assert abs(row["median_of_means"] - mom / 100) < 1e-6


def test_ams_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_ams_f2_sketch

    row = q_ams_f2_sketch(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    cnt = Counter(int(k) for k in li["l_partkey"])
    true = sum(c * c for c in cnt.values())
    ests = []
    for j in range(16):
        z = sum(
            (1 if _h60(f"{k}:ams{j}") % 2 == 0 else -1) * c
            for k, c in cnt.items()
        )
        ests.append(z * z)
    med = sorted(ests)[7]
    assert row["true_f2"] == true
    assert row["ams_estimate"] == med
    assert abs(row["rel_err"] - abs(med - true) / true) < 1e-6


def test_systematic_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_systematic_sampling_bias

    got = {r["sample_offset"]: r for r in q_systematic_sampling_bias(spark, SF_DIR).collect()}

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    rows = sorted(
        zip(o["o_orderdate"], o["o_orderkey"].astype(int),
            [_rnd(p * 100) for p in o["o_totalprice"]])
    )
    tm = sum(c for _, _, c in rows) / len(rows)
    for off in range(4):
        sel = [c for i, (_, _, c) in enumerate(rows) if i % 16 == off]
        g = got[off]
        assert g["n_sampled"] == len(sel)
        est = sum(sel) / len(sel)
        assert abs(g["estimate"] - est / 100) < 1e-6
        assert abs(g["rel_bias"] - (est - tm) / tm) < 1e-6


def test_pe_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_permutation_entropy

    row = q_permutation_entropy(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    daily = sorted(Counter(o["o_orderdate"].dt.date).items())
    ys = [y for _, y in daily]
    pats: Counter = Counter()
    for a, b, c in zip(ys, ys[1:], ys[2:]):
        p = (
            f"{(a < b) + (a < c)}"
            f"{(b <= a) + (b < c)}"
            f"{(c <= a) + (c <= b)}"
        )
        pats[p] += 1
    t = sum(pats.values())
    h = sum(
        _rnd(-(n / t) * math.log(n / t) * 1e9) for n in pats.values()
    )
    assert row["n_patterns"] == len(pats)
    assert abs(row["entropy_nats"] - h / 1e9) < 1e-6
    assert abs(row["normalized_pe"] - h / 1e9 / math.log(6)) < 1e-6


def test_burn_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_slo_burn_rate

    row = q_slo_burn_rate(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    days = sorted(
        Counter(e["ts"].dt.date).keys()
    )
    n = Counter(e["ts"].dt.date)
    err = Counter(e.loc[e.event_type == "error", "ts"].dt.date)
    b1s, b7s, pages = [], [], 0
    for i, d in enumerate(days):
        win = days[max(0, i - 6) : i + 1]
        n7 = sum(n[x] for x in win)
        e7 = sum(err.get(x, 0) for x in win)
        b1 = round((err.get(d, 0) / n[d]) / 0.1, 6)
        b7 = round((e7 / n7) / 0.1, 6)
        b1s.append(b1)
        b7s.append(b7)
        pages += 1 if (b1 > 2.0 and b7 > 2.0) else 0
    assert row["n_days"] == len(days)
    assert abs(row["max_burn_1d"] - max(b1s)) < 1e-9
    assert abs(row["max_burn_7d"] - max(b7s)) < 1e-9
    assert row["n_page_days"] == pages
