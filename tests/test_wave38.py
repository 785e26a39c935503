"""Plan pins, partition invariance, and python twins for the round-38
wave (Markov stationary distribution / HITS / dedup keep-policy sweep /
split dup leakage / BH multiple-testing FDR / PII density scan).
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rnd(x: float) -> int:
    """round-half-up for positive doubles (Spark round / DuckDB round)."""
    return int(math.floor(x + 0.5))


# ---------------------------------------------------------------------------
# plan pins


def test_stationary_no_cartesian(spark):
    from llmaix_spark.plans.queries import q_transition_stationary

    plan = _phys(q_transition_stationary(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_hits_no_cartesian_and_persisted_edges(spark):
    from llmaix_spark.plans.queries import q_hits_bipartite

    plan = _phys(q_hits_bipartite(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the result is localCheckpointed (so the persisted iteration state
    # could be unpersisted eagerly) — the final plan is a checkpoint scan
    assert "Scan ExistingRDD" in plan


def test_keep_policy_body_runs_once(spark):
    """The LSH+CC body is localCheckpointed into a 1-row table; the
    three policy rows are projections — no join, no shuffle left."""
    from llmaix_spark.plans.queries import q_dedup_keep_policy

    plan = _phys(q_dedup_keep_policy(spark, SF_DIR))
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_split_leakage_broadcasts_split(spark):
    from llmaix_spark.plans.queries import q_split_dup_leakage

    plan = _phys(q_split_dup_leakage(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_fdr_broadcast_dims(spark):
    from llmaix_spark.plans.queries import q_multiple_testing_fdr

    plan = _phys(q_multiple_testing_fdr(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pii_scan_single_scan(spark):
    from llmaix_spark.plans.queries import q_pii_scan

    plan = _phys(q_pii_scan(spark, SF_DIR))
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "transition_stationary",
        "hits_bipartite",
        "dedup_keep_policy",
        "split_dup_leakage",
        "multiple_testing_fdr",
        "pii_scan",
    ],
)
def test_wave38_partition_invariance(spark, qname):
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


def test_stationary_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_transition_stationary

    got = {
        r["state"]: r["stationary_p"]
        for r in q_transition_stationary(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e.assign(us=e["ts"].astype("datetime64[ns]").astype("int64") // 1000).sort_values(
        ["user_id", "us", "event_id"]
    )
    pairs: dict[tuple[str, str], int] = {}
    for _, g in e.groupby("user_id"):
        types = list(g["event_type"])
        for a, b in zip(types, types[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    tot: dict[str, int] = {}
    for (a, _), n in pairs.items():
        tot[a] = tot.get(a, 0) + n
    p = {k: n / tot[k[0]] for k, n in pairs.items()}
    states = sorted(set(e["event_type"]))
    k = len(states)
    v = {s: _rnd(1e9 / k) for s in states}
    for _ in range(5):
        raw: dict[str, int] = {}
        for (a, b), pr in p.items():
            raw[b] = raw.get(b, 0) + _rnd(v[a] * pr)
        m = sum(raw.values())
        v = {s: _rnd(raw.get(s, 0) * (1e9 / m)) for s in states}
    want = {s: ((n + 500) // 1000) / 1e6 for s, n in v.items()}
    assert got == want
    # it is a (rounded) probability distribution
    assert abs(sum(got.values()) - 1.0) < 1e-5
    assert all(x >= 0 for x in got.values())


def test_hits_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_hits_bipartite

    got = {
        r["auth_id"]: r["authority"]
        for r in q_hits_bipartite(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    edges = sorted(
        {(int(r.o_custkey), int(r.l_partkey)) for r in m.itertuples()}
    )
    auth = {a: 10**9 for _, a in edges}
    for _ in range(2):
        hraw: dict[int, int] = {}
        for h, a in edges:
            hraw[h] = hraw.get(h, 0) + auth[a]
        hm = sum(hraw.values())
        hub = {h: _rnd(r * (1e9 / hm)) for h, r in hraw.items()}
        araw: dict[int, int] = {}
        for h, a in edges:
            araw[a] = araw.get(a, 0) + hub[h]
        am = sum(araw.values())
        auth = {a: _rnd(r * (1e9 / am)) for a, r in araw.items()}
    want = {a: ((n + 500) // 1000) / 1e6 for a, n in auth.items()}
    assert got == want


def test_keep_policy_invariants(spark):
    from llmaix_spark.plans.queries import q_dedup_keep_policy

    rows = {r["policy"]: r for r in q_dedup_keep_policy(spark, SF_DIR).collect()}
    assert set(rows) == {"min_id", "max_id", "longest"}
    totals = {
        (r["n_groups"], r["n_docs"], r["kept_chars"] + r["removed_chars"])
        for r in rows.values()
    }
    # the cluster table is shared: one group count, one corpus size
    assert len(totals) == 1
    n_groups, n_docs, total_chars = next(iter(totals))
    assert 0 < n_groups <= n_docs
    # keeping the longest doc per group dominates any id-based policy
    assert rows["longest"]["kept_chars"] >= rows["min_id"]["kept_chars"]
    assert rows["longest"]["kept_chars"] >= rows["max_id"]["kept_chars"]
    for r in rows.values():
        assert 0 < r["kept_chars"] <= total_chars
        assert abs(r["kept_share"] - round(r["kept_chars"] / total_chars, 6)) < 1e-9


def test_split_leakage_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_split_dup_leakage

    got = {
        (r["split_lo"], r["split_hi"]): (r["n_pairs"], r["is_leak"])
        for r in q_split_dup_leakage(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    def shingles(text):
        toks = text.strip().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sh = {int(r.doc_id): shingles(r.text) for r in d.itertuples()}

    def split_of(doc_id):
        b = _h60(f"{doc_id}:split") % 10000
        return "train" if b < 9000 else ("val" if b < 9500 else "test")

    want: dict[tuple[str, str], int] = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                lo, hi = sorted((split_of(a), split_of(b)))
                want[(lo, hi)] = want.get((lo, hi), 0) + 1
    assert {k: v[0] for k, v in got.items()} == want
    for (lo, hi), (_, leak) in got.items():
        assert leak == (lo != hi)


def test_fdr_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_multiple_testing_fdr

    got = {r["nation"]: r for r in q_multiple_testing_fdr(spark, SF_DIR).collect()}

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nt = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        nt, left_on="c_nationkey", right_on="n_nationkey"
    )
    stats = {}
    for nation, g in m.groupby("n_name"):
        stats[nation] = (len(g), int((g["o_orderpriority"] == "1-URGENT").sum()))
    tn = sum(n for n, _ in stats.values())
    tu = sum(u for _, u in stats.values())
    rows = []
    for nation, (n, u) in stats.items():
        pp = tu / tn
        z = (u / n - (tu - u) / (tn - n)) / math.sqrt(
            pp * (1.0 - pp) * (1.0 / n + 1.0 / (tn - n))
        )
        x = abs(z) / math.sqrt(2.0)
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = (
            (((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592
        ) * t
        rows.append((nation, n, u, z, round(poly * math.exp(-x * x), 8)))
    mm = len(rows)
    rows.sort(key=lambda r: (r[4], r[0]))
    ind = [1 if r[4] <= (i + 1) * 0.05 / mm else 0 for i, r in enumerate(rows)]
    for i, (nation, n, u, z, p) in enumerate(rows):
        g = got[nation]
        assert (g["n_orders"], g["n_urgent"]) == (n, u)
        assert abs(g["z_stat"] - z) < 1e-5
        assert abs(g["p_value"] - p) < 1.5e-8
        assert g["p_rank"] == i + 1
        assert g["rejected"] == (max(ind[i:]) == 1)
    # some nation is extreme enough to reject at sf0.001, and BH is a
    # step-up: the rejected set is a prefix of the p-ranked order
    ranks = sorted(r["p_rank"] for r in got.values() if r["rejected"])
    assert ranks == list(range(1, len(ranks) + 1))


def test_pii_scan_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_pii_scan

    got = {r["lang"]: r for r in q_pii_scan(spark, SF_DIR).collect()}

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    re_email = re.compile(r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}")
    re_phone = re.compile(r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}")
    re_long = re.compile(r"[0-9]{9,}")
    agg: dict[str, list[int]] = {}
    for r in d.itertuples():
        doc_id = int(r.doc_id)
        text = r.text
        if doc_id % 7 == 0:
            text += f" reach me at user{doc_id}@mail.example.com"
        if doc_id % 11 == 0:
            text += f" call +1-555-{doc_id % 10000:04d}"
        text = text.lower()
        e = len(re_email.findall(text))
        p = len(re_phone.findall(text))
        lo = len(re_long.findall(text))
        a = agg.setdefault(r.lang, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += 1 if e + p > 0 else 0
        a[2] += e
        a[3] += p
        a[4] += lo
    assert set(got) == set(agg)
    for lang, (nd, dw, ne, np_, nl) in agg.items():
        g = got[lang]
        assert (
            g["n_docs"], g["docs_with_pii"], g["n_emails"],
            g["n_phones"], g["n_long_ids"],
        ) == (nd, dw, ne, np_, nl)
        assert abs(g["pii_per_doc"] - round((ne + np_) / nd, 6)) < 1e-9
    # the synthetic injection guarantees the patterns are exercised
    assert sum(a[2] for a in agg.values()) > 0
    assert sum(a[3] for a in agg.values()) > 0
