"""Plan pins, partition invariance, and python twins for the round-40
wave (TextRank keywords / IPF raking / Lindley queue wait / Brier
decomposition / Markov entropy rate / session-gap sweep).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rnd(x: float) -> int:
    return int(math.floor(x + 0.5))


# ---------------------------------------------------------------------------
# plan pins


def test_textrank_topk_over_checkpointed_state(spark):
    """The rank loop runs on localCheckpointed ≤150-row state; the
    returned plan is a map-side top-k over it — never a full sort or
    a re-execution of the corpus scan."""
    from llmaix_spark.plans.queries import q_textrank_keywords

    plan = _phys(q_textrank_keywords(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Scan ExistingRDD" in plan
    assert "parquet" not in plan.lower()


def test_ipf_loop_checkpointed(spark):
    """The IPF loop runs at the 125-cell grain on localCheckpointed
    state — the returned plan never re-executes the orders scan."""
    from llmaix_spark.plans.queries import q_ipf_raking

    plan = _phys(q_ipf_raking(spark, SF_DIR))
    assert "Scan ExistingRDD" in plan
    assert "parquet" not in plan.lower()


def test_lindley_no_joins(spark):
    from llmaix_spark.plans.queries import q_queue_wait_lindley

    plan = _phys(q_queue_wait_lindley(spark, SF_DIR))
    assert "Join" not in plan
    assert "rangepartitioning" not in plan


def test_brier_one_grouped_pass(spark):
    from llmaix_spark.plans.queries import q_brier_decomposition

    plan = _phys(q_brier_decomposition(spark, SF_DIR))
    assert "SortMergeJoin" not in plan


def test_entropy_rate_broadcast_dims(spark):
    from llmaix_spark.plans.queries import q_markov_entropy_rate

    plan = _phys(q_markov_entropy_rate(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_gap_sweep_single_scan(spark):
    from llmaix_spark.plans.queries import q_session_gap_sweep

    plan = _phys(q_session_gap_sweep(spark, SF_DIR))
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "textrank_keywords",
        "ipf_raking",
        "queue_wait_lindley",
        "brier_decomposition",
        "markov_entropy_rate",
        "session_gap_sweep",
    ],
)
def test_wave40_partition_invariance(spark, qname):
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


def test_textrank_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_textrank_keywords

    got = [
        (r["keyword"], r["score"])
        for r in q_textrank_keywords(spark, SF_DIR).collect()
    ]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    tok = []
    for r in d.itertuples():
        words = r.text.lower().strip().split(" ")
        tok.extend(
            (int(r.doc_id), i, w)
            for i, w in enumerate(words)
            if w and len(w) >= 4
        )
    cnt = Counter(w for _, _, w in tok)
    vocab = set(
        w for w, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:150]
    )
    by_pos = {(doc, pos): w for doc, pos, w in tok if w in vocab}
    co: Counter = Counter()
    for (doc, pos), w in by_pos.items():
        wb = by_pos.get((doc, pos + 1))
        if wb is not None and wb != w:
            co[(w, wb)] += 1
    edges: Counter = Counter()
    for (w, wb), c in co.items():
        edges[(w, wb)] += c
        edges[(wb, w)] += c
    tw: Counter = Counter()
    for (w, _), c in edges.items():
        tw[w] += c
    n = len(vocab)
    tele = _rnd(0.15 * 1e9 / n)
    pr = {w: 10**9 // n for w in vocab}
    for _ in range(3):
        contrib: Counter = Counter()
        for (w, wb), c in edges.items():
            contrib[wb] += _rnd(pr[w] * 0.85 * c / tw[w])
        pr = {w: tele + contrib.get(w, 0) for w in vocab}
    want = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [k for k, _ in got] == [k for k, _ in want]
    for (_, gs), (_, wn) in zip(got, want):
        assert abs(gs - wn / 1e9) < 1e-9


def test_ipf_matches_python_and_margins(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_ipf_raking

    got = {
        (r["nation"], r["priority"]): (r["n"], r["raked_weight"], r["rake_factor"])
        for r in q_ipf_raking(spark, SF_DIR).collect()
    }

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nt = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        nt, left_on="c_nationkey", right_on="n_nationkey"
    )
    cells = {
        k: len(g) for k, g in m.groupby(["n_name", "o_orderpriority"])
    }
    total = sum(cells.values())
    nations = sorted({k[0] for k in cells})
    tr = _rnd(total * 1e9 / len(nations))
    tc = defaultdict(int)
    for (nat, pri), n in cells.items():
        tc[pri] += n * 10**9
    w = {k: n * 10**9 for k, n in cells.items()}
    for _ in range(3):
        rs = defaultdict(int)
        for (nat, pri), wn in w.items():
            rs[nat] += wn
        w = {k: _rnd(wn * (tr / rs[k[0]])) for k, wn in w.items()}
        cs = defaultdict(int)
        for (nat, pri), wn in w.items():
            cs[pri] += wn
        w = {k: _rnd(wn * (tc[k[1]] / cs[k[1]])) for k, wn in w.items()}
    assert set(got) == set(w)
    for k, wn in w.items():
        gn, gw, gf = got[k]
        assert gn == cells[k]
        assert abs(gw - wn / 1e9) < 1e-6
        assert abs(gf - wn / (cells[k] * 1e9)) < 1e-6
    # the final pass is a column pass: priority margins are preserved
    # to within one nano per cell
    for pri, target in tc.items():
        achieved = sum(wn for (_, p), wn in w.items() if p == pri)
        assert abs(achieved - target) <= len(nations)


def test_lindley_matches_sequential_simulation(spark):
    """The parallel prefix closed form must replay the SEQUENTIAL
    Lindley recursion exactly."""
    import pandas as pd

    from llmaix_spark.plans.queries import q_queue_wait_lindley

    got = {r["user_id"]: r for r in q_queue_wait_lindley(spark, SF_DIR).collect()}

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e.assign(us=e["ts"].astype("datetime64[ns]").astype("int64") // 1000)
    nontrivial = 0
    for u, g in e.groupby("user_id"):
        ts = sorted(zip(g["us"].astype(int), g["event_id"].astype(int)))
        if len(ts) < 2:
            assert int(u) not in got
            continue
        s_us = (ts[-1][0] - ts[0][0]) // (len(ts) - 1)
        waits = [0]
        for (t0, _), (t1, _) in zip(ts, ts[1:]):
            waits.append(max(0, waits[-1] + s_us - (t1 - t0)))
        row = got[int(u)]
        assert row["n_events"] == len(ts)
        assert abs(row["service_s"] - s_us / 1e6) < 1e-6
        assert abs(row["max_wait_s"] - max(waits) / 1e6) < 1e-6
        assert abs(row["mean_wait_s"] - sum(waits) / len(waits) / 1e6) < 1e-6
        if max(waits) > 0:
            nontrivial += 1
    # at critical load the backlog profile is nonzero for every user
    # with any burstiness — the operator isn't degenerate on the fixture
    assert nontrivial > 0


def test_brier_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_brier_decomposition

    row = q_brier_decomposition(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    cs = [min(_rnd(v * 100), 50000) for v in e["value"]]
    ys = [1 if t == "purchase" else 0 for t in e["event_type"]]
    n = len(cs)
    brier = sum((c - 50000 * y) ** 2 for c, y in zip(cs, ys)) / (n * 2.5e9)
    bins = defaultdict(lambda: [0, 0, 0])
    for c, y in zip(cs, ys):
        b = bins[min(9, c // 5000)]
        b[0] += 1
        b[1] += c
        b[2] += y
    ty = sum(ys)
    rel_n = sum(
        _rnd(nk * ((sc - 50000.0 * sy) / (nk * 50000.0)) ** 2 * 1e9)
        for nk, sc, sy in bins.values()
    )
    res_n = sum(
        _rnd(nk * (sy / nk - ty / n) ** 2 * 1e9)
        for nk, _, sy in bins.values()
    )
    rel, res = rel_n / (n * 1e9), res_n / (n * 1e9)
    unc = (ty / n) * (1 - ty / n)
    assert row["n_events"] == n
    assert abs(row["brier"] - brier) < 1e-6
    assert abs(row["reliability"] - rel) < 1e-6
    assert abs(row["resolution"] - res) < 1e-6
    assert abs(row["uncertainty"] - unc) < 1e-6
    # Murphy identity: the remainder is the within-bin forecast
    # variance, which is nonnegative
    assert abs(row["within_bin_var"] - (brier - rel + res - unc)) < 2e-6
    assert row["within_bin_var"] >= -1e-6
    assert row["resolution"] <= row["uncertainty"] + 1e-6


def test_entropy_rate_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_markov_entropy_rate

    row = q_markov_entropy_rate(spark, SF_DIR).collect()[0]

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e.assign(us=e["ts"].astype("datetime64[ns]").astype("int64") // 1000).sort_values(
        ["user_id", "us", "event_id"]
    )
    pairs: Counter = Counter()
    for _, g in e.groupby("user_id"):
        types = list(g["event_type"])
        for a, b in zip(types, types[1:]):
            pairs[(a, b)] += 1
    tot: Counter = Counter()
    for (a, _), nn in pairs.items():
        tot[a] += nn
    states = sorted(set(e["event_type"]))
    k = len(states)
    # stationary distribution, same nano discipline as wave38's twin
    v = {s: _rnd(1e9 / k) for s in states}
    for _ in range(5):
        raw: Counter = Counter()
        for (a, b), nn in pairs.items():
            raw[b] += _rnd(v[a] * (nn / tot[a]))
        m = sum(raw.values())
        v = {s: _rnd(raw.get(s, 0) * (1e9 / m)) for s in states}
    pi_u = {s: (nano + 500) // 1000 for s, nano in v.items()}
    ln2 = math.log(2.0)
    h = Counter()
    for (a, b), nn in pairs.items():
        p = nn / tot[a]
        h[a] += _rnd(-p * (math.log(p) / ln2) * 1e9)
    dot = sum(pi_u[s] * h.get(s, 0) for s in states)
    assert row["n_states"] == k
    assert abs(row["entropy_rate_bits"] - dot / 1e15) < 2e-6
    assert abs(row["max_entropy_bits"] - math.log(k) / ln2) < 1e-6
    # the chain is less surprising than uniform noise
    assert 0 < row["entropy_rate_bits"] <= row["max_entropy_bits"]
    assert abs(row["efficiency"] - (dot / 1e15) / (math.log(k) / ln2)) < 1e-5


def test_gap_sweep_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_session_gap_sweep

    got = {
        r["gap_s"]: (
            r["n_sessions"], r["n_events"],
            r["events_per_session"], r["active_hours"],
        )
        for r in q_session_gap_sweep(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e = e.assign(us=e["ts"].astype("datetime64[ns]").astype("int64") // 1000)
    diffs = []
    n_users = e["user_id"].nunique()
    for _, g in e.groupby("user_id"):
        ts = sorted(zip(g["us"].astype(int), g["event_id"].astype(int)))
        diffs.extend(t1 - t0 for (t0, _), (t1, _) in zip(ts, ts[1:]))
    n_events = len(e)
    for gap_s in (900, 1800, 3600):
        g_us = gap_s * 1_000_000
        ns = n_users + sum(1 for d in diffs if d > g_us)
        act = sum(d for d in diffs if d <= g_us)
        gn, ge, eps, ah = got[gap_s]
        assert (gn, ge) == (ns, n_events)
        assert abs(eps - n_events / ns) < 1e-6
        assert abs(ah - act / 3.6e9) < 1e-6
    # a larger gap can only merge sessions
    assert got[900][0] >= got[1800][0] >= got[3600][0]
    # and can only add active time
    assert got[900][3] <= got[1800][3] <= got[3600][3]
