"""Plan pins, partition invariance, and python twins for the round-41
wave (TF-IDF cosine pairs / group-sequential OBF / diff-in-diff /
RAKE keyphrases / decision-stump gain / greedy set cover).
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


def _shingles(text: str, n: int = 3) -> list[str]:
    toks = text.strip().split()
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


# ---------------------------------------------------------------------------
# plan pins


def test_tfidf_weights_computed_once(spark):
    """The weighted postings table is localCheckpointed and reused by
    the norm, blocking, and dot stages."""
    from llmaix_spark.plans.queries import q_tfidf_cosine_pairs

    plan = _phys(q_tfidf_cosine_pairs(spark, SF_DIR))
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan


def test_obf_no_smj(spark):
    from llmaix_spark.plans.queries import q_sequential_obf

    plan = _phys(q_sequential_obf(spark, SF_DIR))
    assert "SortMergeJoin" not in plan


def test_did_broadcast_dims(spark):
    from llmaix_spark.plans.queries import q_did_estimator

    plan = _phys(q_did_estimator(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rake_word_scores_broadcast(spark):
    from llmaix_spark.plans.queries import q_rake_keyphrases

    plan = _phys(q_rake_keyphrases(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_stump_no_joins(spark):
    from llmaix_spark.plans.queries import q_decision_stump_gain

    plan = _phys(q_decision_stump_gain(spark, SF_DIR))
    assert "Join" not in plan


def test_cover_curve_properties(spark):
    from llmaix_spark.plans.queries import q_greedy_set_cover

    rows = sorted(
        tuple(r) for r in q_greedy_set_cover(spark, SF_DIR).collect()
    )
    assert [r[0] for r in rows] == [1, 2, 3, 4, 5]
    # greedy marginal gains are non-increasing; coverage only grows
    for a, b in zip(rows, rows[1:]):
        assert b[2] <= a[2]
        assert b[3] >= a[3]
        assert b[4] >= a[4]
    assert rows[-1][4] <= 1.0


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "tfidf_cosine_pairs",
        "sequential_obf",
        "did_estimator",
        "rake_keyphrases",
        "decision_stump_gain",
        "greedy_set_cover",
    ],
)
def test_wave41_partition_invariance(spark, qname):
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


def test_tfidf_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_tfidf_cosine_pairs

    got = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in q_tfidf_cosine_pairs(spark, SF_DIR).collect()
    }
    assert got, "fixture near-dups must produce candidate pairs"

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    tf: dict[int, Counter] = {
        int(r.doc_id): Counter(_shingles(r.text)) for r in d.itertuples()
    }
    n_docs = len(tf)
    df_: Counter = Counter()
    for c in tf.values():
        df_.update(set(c))
    wu = {
        doc: {
            w: _rnd(t * math.log(n_docs / df_[w]) * 1e6)
            for w, t in c.items()
        }
        for doc, c in tf.items()
    }
    norm2 = {doc: sum(v * v for v in ws.values()) for doc, ws in wu.items()}
    # rare-token blocking
    by_rare: dict[str, list[int]] = defaultdict(list)
    for doc, c in tf.items():
        for w in c:
            if df_[w] <= 20:
                by_rare[w].append(doc)
    cand = set()
    for docs_ in by_rare.values():
        docs_ = sorted(docs_)
        for i, a in enumerate(docs_):
            for b in docs_[i + 1 :]:
                cand.add((a, b))
    want = {}
    for a, b in cand:
        dot = sum(wu[a][w] * wb for w, wb in wu[b].items() if w in wu[a])
        cos = round(
            dot / (math.sqrt(norm2[a]) * math.sqrt(norm2[b])), 6
        )
        if cos >= 0.3:
            want[(a, b)] = cos
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9


def test_obf_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_sequential_obf

    got = {r["look"]: r for r in q_sequential_obf(spark, SF_DIR).collect()}

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    us = o["o_orderdate"].astype("datetime64[ns]").astype("int64") // 1000
    lo, hi = int(us.min()), int(us.max())
    lk = [min(3, (int(u) - lo) * 3 // (hi - lo + 1) + 1) for u in us]
    trt = [int(k) % 2 for k in o["o_orderkey"]]
    y = [1 if p == "1-URGENT" else 0 for p in o["o_orderpriority"]]
    bounds = {1: 3.471, 2: 2.454, 3: 2.004}
    stopped = False
    for look in (1, 2, 3):
        sel = [i for i, k in enumerate(lk) if k <= look]
        nt = sum(trt[i] for i in sel)
        nc = len(sel) - nt
        yt = sum(y[i] for i in sel if trt[i])
        yc = sum(y[i] for i in sel if not trt[i])
        pp = (yt + yc) / (nt + nc)
        z = (yt / nt - yc / nc) / math.sqrt(
            pp * (1 - pp) * (1 / nt + 1 / nc)
        )
        g = got[look]
        assert g["n_cum"] == len(sel)
        assert abs(g["z_stat"] - z) < 1e-5
        assert g["obf_bound"] == bounds[look]
        crossed = abs(round(z, 6)) > bounds[look]
        assert g["crossed"] == crossed
        stopped = stopped or crossed
        assert g["stopped_by_now"] == stopped
    # OBF boundaries tighten monotonically
    assert got[1]["obf_bound"] > got[2]["obf_bound"] > got[3]["obf_bound"]


def test_did_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_did_estimator

    row = q_did_estimator(spark, SF_DIR).collect()[0]

    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    c = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    us = m["o_orderdate"].astype("datetime64[ns]").astype("int64") // 1000
    mid = int((int(us.min()) + int(us.max())) / 2)
    cells = defaultdict(lambda: [0, 0, 0])
    for u, nat, price in zip(us, m["c_nationkey"], m["o_totalprice"]):
        key = (int(nat) % 2, 1 if int(u) >= mid else 0)
        cents = _rnd(price * 100)
        cells[key][0] += 1
        cells[key][1] += cents
        cells[key][2] += cents * cents
    mean = {k: s / n for k, (n, s, _) in cells.items()}
    von = {
        k: (ss - s * (s / n)) / (n - 1) / n
        for k, (n, s, ss) in cells.items()
    }
    did = ((mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])) / 100
    se = math.sqrt(sum(von.values())) / 100
    assert row["n_orders"] == sum(n for n, _, _ in cells.values())
    assert abs(row["control_pre"] - mean[(0, 0)] / 100) < 1e-4
    assert abs(row["treated_post"] - mean[(1, 1)] / 100) < 1e-4
    assert abs(row["did"] - did) < 1e-4
    assert abs(row["se"] - se) < 1e-4
    assert abs(row["t_stat"] - did / se) < 1e-3


def test_rake_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_rake_keyphrases

    got = [
        (r["phrase"], r["n_words"], r["n_occurrences"], r["score"])
        for r in q_rake_keyphrases(spark, SF_DIR).collect()
    ]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    phrases = []
    for r in d.itertuples():
        words = r.text.lower().strip().split(" ")
        run: list[str] = []
        for w in words:
            if w and len(w) >= 4:
                run.append(w)
            elif run:
                phrases.append(run)
                run = []
        if run:
            phrases.append(run)
    freq: Counter = Counter()
    deg: Counter = Counter()
    for ph in phrases:
        for w in ph:
            freq[w] += 1
            deg[w] += len(ph)
    su = {w: _rnd(deg[w] * 1e6 / freq[w]) for w in freq}
    agg: dict[str, list[int]] = {}
    for ph in phrases:
        text = " ".join(ph)
        score = sum(su[w] for w in ph)
        a = agg.setdefault(text, [len(ph), 0, score])
        a[1] += 1
    want = sorted(
        ((t, nw, no, sc / 1e6) for t, (nw, no, sc) in agg.items()),
        key=lambda x: (-x[3], x[0]),
    )[:15]
    assert [(g[0], g[1], g[2]) for g in got] == [
        (w[0], w[1], w[2]) for w in want
    ]
    for g, w in zip(got, want):
        assert abs(g[3] - round(w[3], 6)) < 1e-9


def test_stump_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_decision_stump_gain

    row = q_decision_stump_gain(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    vals = sorted(
        Counter(
            (int(nc), lang == "en")
            for nc, lang in zip(d["n_chars"], d["lang"])
        ).items()
    )
    per = defaultdict(lambda: [0, 0])
    for (nc, is_en), cnt in vals:
        per[nc][0] += cnt
        per[nc][1] += cnt if is_en else 0
    nn = sum(n for n, _ in per.values())
    pp = sum(p for _, p in per.values())

    def gini(p, n):
        r = p / n
        return 2.0 * r * (1.0 - r)

    best = None
    nl = pl = 0
    for nc in sorted(per):
        nl += per[nc][0]
        pl += per[nc][1]
        if nl >= nn:
            break
        gain = round(
            gini(pp, nn)
            - (nl / nn * gini(pl, nl) + (nn - nl) / nn * gini(pp - pl, nn - nl)),
            6,
        )
        key = (-gain, nc)
        if best is None or key < best[0]:
            best = (key, nl, pl)
    (ngain, thr), nl, pl = best
    assert row["threshold"] == thr
    assert (row["n_left"], row["n_right"]) == (nl, nn - nl)
    assert abs(row["best_gain"] - (-ngain)) < 1e-9
    assert abs(row["gini_parent"] - gini(pp, nn)) < 1e-6
    assert abs(row["left_pos_rate"] - pl / nl) < 1e-6
    assert abs(row["right_pos_rate"] - (pp - pl) / (nn - nl)) < 1e-6
    # a split can't hurt (gain ≥ 0 up to rounding)
    assert row["best_gain"] >= -1e-6


def test_cover_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_greedy_set_cover

    got = sorted(tuple(r) for r in q_greedy_set_cover(spark, SF_DIR).collect())

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sh = {int(r.doc_id): _shingles(r.text) for r in d.itertuples()}
    cnt: Counter = Counter()
    for shingles in sh.values():
        cnt.update(shingles)
    top = set(
        w for w, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    )
    n_univ = len(top)
    dw = {doc: set(s) & top for doc, s in sh.items()}
    covered: set[str] = set()
    want = []
    cum = 0
    for r in range(1, 6):
        gains = sorted(
            ((-(len(ws - covered)), doc) for doc, ws in dw.items() if ws - covered),
        )
        g, doc = -gains[0][0], gains[0][1]
        cum += g
        want.append((r, doc, g, cum, round(cum / n_univ, 6)))
        covered |= dw[doc]
    assert [w[:4] for w in want] == [g[:4] for g in got]
    for g, w in zip(got, want):
        assert abs(g[4] - w[4]) < 1e-9
