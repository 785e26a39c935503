"""Plan pins, partition invariance, and python twins for the round-44
wave (Good-Turing / Count-Min sketch / matching ATT / join-size
estimation / order-statistic median CI / Markov removal attribution).
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
# plan pins / structural properties


def test_good_turing_bounded_grain(spark):
    from llmaix_spark.plans.queries import q_good_turing

    plan = _phys(q_good_turing(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    rows = {r["r"]: r for r in q_good_turing(spark, SF_DIR).collect()}
    assert all(1 <= r <= 10 for r in rows)
    # only r = 1 carries the unseen-mass estimate
    assert rows[1]["unseen_mass"] is not None
    assert all(v["unseen_mass"] is None for k, v in rows.items() if k != 1)


def test_cms_overestimates_only(spark):
    """The CMS guarantee: point queries never underestimate."""
    from llmaix_spark.plans.queries import q_count_min_sketch

    rows = q_count_min_sketch(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["overestimate"] >= 0
        assert r["est_cnt"] >= r["true_cnt"]


def test_att_broadcast_dims(spark):
    from llmaix_spark.plans.queries import q_matching_att

    plan = _phys(q_matching_att(spark, SF_DIR))
    assert "SortMergeJoin" not in plan


def test_join_size_single_pass(spark):
    from llmaix_spark.plans.queries import q_join_size_estimate

    plan = _phys(q_join_size_estimate(spark, SF_DIR))
    assert "Join" not in plan  # it's ONE grouped aggregate, never a join


def test_median_ci_ordering(spark):
    from llmaix_spark.plans.queries import q_median_ci_order_stats

    row = q_median_ci_order_stats(spark, SF_DIR).collect()[0]
    assert row["ci_lo"] <= row["median"] <= row["ci_hi"]


def test_removal_effect_bounds(spark):
    from llmaix_spark.plans.queries import q_markov_removal_attribution

    rows = {r["channel"]: r for r in q_markov_removal_attribution(spark, SF_DIR).collect()}
    assert set(rows) == {"click", "error", "view"}
    full = {r["f_full"] for r in rows.values()}
    assert len(full) == 1  # one shared full-chain baseline
    for r in rows.values():
        # knocking out a channel can only lose probability mass
        assert 0 <= r["f_removed"] <= r["f_full"] <= 1
        assert 0 <= r["removal_effect"] <= 1


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "good_turing",
        "count_min_sketch",
        "matching_att",
        "join_size_estimate",
        "median_ci_order_stats",
        "markov_removal_attribution",
    ],
)
def test_wave44_partition_invariance(spark, qname):
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


def test_good_turing_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_good_turing

    got = {r["r"]: r for r in q_good_turing(spark, SF_DIR).collect()}

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    occ: Counter = Counter()
    for r in d.itertuples():
        occ.update(_shingle_list(r.text))
    nr = Counter(occ.values())
    nn = sum(occ.values())
    for r in sorted(nr):
        if r > 10:
            continue
        g = got[r]
        assert g["n_r"] == nr[r]
        assert g["n_r1"] == nr.get(r + 1, 0)
        assert abs(g["r_star"] - (r + 1) * nr.get(r + 1, 0) / nr[r]) < 1e-6
        if r == 1:
            assert abs(g["unseen_mass"] - nr[1] / nn) < 1e-6
    # GT discounts singletons: r*(1) < 1 on a heavy-singleton corpus
    assert got[1]["r_star"] < 1.0


def test_cms_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_count_min_sketch

    got = {r["part_id"]: r for r in q_count_min_sketch(spark, SF_DIR).collect()}

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    keys = [int(k) for k in li["l_partkey"]]
    sketch: Counter = Counter()
    for k in keys:
        for j in range(4):
            sketch[(j, _h60(f"{k}:cms{j}") % 1024)] += 1
    true = Counter(keys)
    top = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    for k, tc in top:
        est = min(sketch[(j, _h60(f"{k}:cms{j}") % 1024)] for j in range(4))
        g = got[k]
        assert (g["true_cnt"], g["est_cnt"]) == (tc, est)
        assert abs(
            g["err_vs_epsilon_n"] - (est - tc) / (len(keys) / 1024)
        ) < 1e-6


def test_att_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_matching_att

    row = q_matching_att(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    cents = [_rnd(p * 100) for p in m["o_totalprice"]]
    trt = [int(n) % 2 for n in m["c_nationkey"]]
    mc = max(cents)
    cells = defaultdict(lambda: [0, 0])
    for t, cc in zip(trt, cents):
        s = min(9, cc * 10 // (mc + 1))
        cells[(t, s)][0] += 1
        cells[(t, s)][1] += cc
    strata = sorted(
        s for s in range(10) if (1, s) in cells and (0, s) in cells
    )
    ntt = sum(cells[(1, s)][0] for s in strata)
    att_cm = sum(
        _rnd(
            cells[(1, s)][0]
            * (
                cells[(1, s)][1] / cells[(1, s)][0]
                - cells[(0, s)][1] / cells[(0, s)][0]
            )
            * 1e4
            / ntt
        )
        for s in strata
    )
    m1 = sum(cc for t, cc in zip(trt, cents) if t) / sum(trt)
    m0 = sum(cc for t, cc in zip(trt, cents) if not t) / (
        len(trt) - sum(trt)
    )
    assert (row["n_treated"], row["n_strata"]) == (ntt, len(strata))
    assert abs(row["att"] - att_cm / 1e6) < 1e-6
    assert abs(row["naive_diff"] - (m1 - m0) / 100) < 1e-4


def test_join_size_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_join_size_estimate

    row = q_join_size_estimate(spark, SF_DIR).collect()[0]

    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    per = defaultdict(lambda: [0, 0, 0])
    for ok, k in zip(li["l_orderkey"], li["l_partkey"]):
        ok, k = int(ok), int(k)
        st = per[k]
        st[0] += 1
        st[1] += 1 if _h60(f"{ok}:{k}:ra") % 16 == 0 else 0
        st[2] += 1 if _h60(f"{ok}:{k}:rb") % 16 == 0 else 0
    true = sum(c * c for c, _, _ in per.values())
    key_sum = sum(
        c * c for k, (c, _, _) in per.items() if _h60(f"{k}:js") % 16 == 0
    )
    row_sum = sum(a * b for _, a, b in per.values())
    assert row["true_size"] == true
    assert row["key_sample_est"] == key_sum * 16
    assert row["row_sample_est"] == row_sum * 256
    assert abs(row["key_sample_err"] - abs(key_sum * 16 - true) / true) < 1e-6
    assert abs(row["row_sample_err"] - abs(row_sum * 256 - true) / true) < 1e-6


def test_median_ci_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_median_ci_order_stats

    row = q_median_ci_order_stats(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cs = sorted(_rnd(p * 100) for p in o["o_totalprice"])
    n = len(cs)
    k1, k2 = (n + 1) // 2, n // 2 + 1
    med = (cs[k1 - 1] + cs[k2 - 1]) / (2 if k1 != k2 else 1) / (
        100 * (1 if k1 != k2 else 1)
    )
    if k1 == k2:
        med = cs[k1 - 1] / 100
    else:
        med = (cs[k1 - 1] + cs[k2 - 1]) / 200
    klo = int(math.floor((n - 1.96 * math.sqrt(n)) / 2))
    khi = int(math.ceil((n + 1.96 * math.sqrt(n)) / 2)) + 1
    assert row["n_orders"] == n
    assert abs(row["median"] - med) < 1e-6
    assert abs(row["ci_lo"] - cs[klo - 1] / 100) < 1e-6
    assert abs(row["ci_hi"] - cs[khi - 1] / 100) < 1e-6


def test_removal_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_markov_removal_attribution

    got = {r["channel"]: r for r in q_markov_removal_attribution(spark, SF_DIR).collect()}

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e.assign(
        us=e["ts"].astype("datetime64[ns]").astype("int64") // 1000
    ).sort_values(["user_id", "us", "event_id"])
    pairs: Counter = Counter()
    for _, g in e.groupby("user_id"):
        types = list(g["event_type"])
        for a, b in zip(types, types[1:]):
            pairs[(a, b)] += 1
    tot: Counter = Counter()
    for (a, _), nn in pairs.items():
        tot[a] += nn
    p = {k: nn / tot[k[0]] for k, nn in pairs.items() if k[0] != "purchase"}
    states = sorted(set(e["event_type"]) - {"purchase"})

    def absorb(removed=None):
        pf = {
            k: v for k, v in p.items() if removed is None or k[1] != removed
        }
        d_nano = {
            s: _rnd(pf.get((s, "purchase"), 0.0) * 1e9) for s in states
        }
        f = {s: 0 for s in states}
        for _ in range(4):
            nf = {}
            for s in states:
                spread = sum(
                    _rnd(pv * f[j])
                    for (i, j), pv in pf.items()
                    if i == s and j != "purchase" and j in f
                )
                nf[s] = d_nano[s] + spread
            f = nf
        return f["signup"]

    full = absorb()
    for ch in ("click", "error", "view"):
        rem = absorb(ch)
        g = got[ch]
        assert abs(g["f_full"] - ((full + 500) // 1000) / 1e6) < 1e-9
        assert abs(g["f_removed"] - ((rem + 500) // 1000) / 1e6) < 1e-9
        assert abs(g["removal_effect"] - round(1 - rem / full, 6)) < 1e-9
