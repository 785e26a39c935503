"""Plan pins, partition invariance, and python twins for the round-9
wave (blocking metrics / annotator kappa / encoding planner / spatial
clusters / readability / conversion latency).
"""

from __future__ import annotations

import hashlib

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# plan pins


def test_encoding_planner_two_level_agg_no_sort(spark):
    """Value-grain then column-grain aggregate — both hash aggregates,
    no sort, no rangepartitioning."""
    from llmaix_spark.plans.queries import q_encoding_planner

    plan = _phys(q_encoding_planner(spark, SF_DIR))
    assert "rangepartitioning" not in plan
    assert "SortAggregate" not in plan


def test_conversion_latency_no_global_sort(spark):
    from llmaix_spark.plans.queries import q_conversion_latency

    plan = _phys(q_conversion_latency(spark, SF_DIR))
    assert "rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "blocking_metrics",
        "annotator_kappa",
        "encoding_planner",
        "spatial_clusters",
        "quality_readability",
        "conversion_latency",
    ],
)
def test_wave9_partition_invariance(spark, qname):
    from llmaix_spark.plans import queries as Q

    fn = Q.QUERIES[qname]
    rows = {}
    for n in ("3", "16"):
        spark.conf.set("spark.sql.shuffle.partitions", n)
        df = fn(spark, SF_DIR)
        rows[n] = sorted(
            tuple(
                tuple(v) if isinstance(v, list) else v for v in r
            )
            for r in df.collect()
        )
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    assert rows["3"] == rows["16"]


# ---------------------------------------------------------------------------
# twins / consistency


def test_blocking_metrics_consistent_with_pair_queries(spark):
    """found ⊆ cand and found ⊆ truth by construction; the counters
    must equal the already-value-oracled pair queries' counts."""
    from llmaix_spark.plans.queries import (
        QUERIES,
        q_blocking_metrics,
    )

    row = q_blocking_metrics(spark, SF_DIR).collect()[0]
    truth_n = QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).count()
    found_n = QUERIES["dedup_minhash"](spark, SF_DIR).count()
    assert row["truth_pairs"] == truth_n
    assert row["found_pairs"] == found_n
    assert row["found_pairs"] <= row["cand_pairs"]
    assert row["found_pairs"] <= row["truth_pairs"]
    assert (
        row["total_pairs"]
        == row["n_docs"] * (row["n_docs"] - 1) // 2
    )
    assert 0.0 <= row["reduction_ratio"] <= 1.0
    assert 0.0 <= row["pair_completeness"] <= 1.0


def test_annotator_kappa_matches_python(spark):
    from llmaix_spark.operators.textstats import LANG_MARKERS
    from llmaix_spark.plans.queries import q_annotator_kappa

    row = q_annotator_kappa(spark, SF_DIR).collect()[0]

    import pandas as pd

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")

    def predict(text):
        toks = text.lower().strip().split(" ")
        hits = {
            lang: sum(t in ms for t in toks)
            for lang, ms in LANG_MARKERS.items()
        }
        best = max(hits.values())
        if best == 0:
            return "und"
        for lang in LANG_MARKERS:  # priority order en>de>es>fr
            if hits[lang] == best:
                return lang
        raise AssertionError

    gt = list(d["lang"])
    pred = [predict(t) for t in d["text"]]
    n = len(gt)
    agree = sum(g == p for g, p in zip(gt, pred))
    classes = set(gt) | set(pred)
    s = sum(gt.count(c) * pred.count(c) for c in classes)
    po = agree / n
    pe = s / (n * n)
    kappa = (po - pe) / (1.0 - pe)
    assert (row["n_docs"], row["n_agree"], row["marg_sum"]) == (
        n,
        agree,
        s,
    )
    assert abs(row["kappa"] - kappa) < 1e-6


def test_encoding_planner_matches_python(spark):
    from llmaix_spark.plans.queries import q_encoding_planner

    got = {
        r["column_name"]: (
            r["n_rows"],
            r["n_distinct"],
            r["plain_bytes"],
            r["dict_bytes"],
            r["encoding"],
        )
        for r in q_encoding_planner(spark, SF_DIR).collect()
    }

    import pandas as pd

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    for col in ("event_type", "props", "user_id"):
        vals = [str(v) for v in e[col]]
        n = len(vals)
        uniq = set(vals)
        nd = len(uniq)
        plain = sum(len(v) for v in vals)
        idx_w = 1 if nd <= 256 else 2 if nd <= 65536 else 4
        dictb = sum(len(v) for v in uniq) + n * idx_w
        enc = "dict" if dictb < plain else "plain"
        assert got[col] == (n, nd, plain, dictb, enc), col


def test_spatial_clusters_matches_python_union_find(spark):
    from llmaix_spark.plans.queries import q_spatial_clusters

    got = sorted(
        (r["cluster_id"], r["n_cells"], r["n_points"])
        for r in q_spatial_clusters(spark, SF_DIR).collect()
    )

    import pandas as pd

    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    cells: dict[tuple[int, int], int] = {}
    for k in cust["c_custkey"]:
        cx = (_h60(f"{int(k)}:gx") % 1_000_000) // 50_000
        cy = (_h60(f"{int(k)}:gy") % 1_000_000) // 50_000
        cells[(cx, cy)] = cells.get((cx, cy), 0) + 1
    dense = {c: n for c, n in cells.items() if n >= 6}
    parent = {c: c for c in dense}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (cx, cy) in dense:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx, cy + dy)
                if nb in dense and nb != (cx, cy):
                    ra, rb = find((cx, cy)), find(nb)
                    if ra != rb:
                        parent[ra] = rb
    groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for c in dense:
        groups.setdefault(find(c), []).append(c)
    want = sorted(
        (
            min(f"{cx}:{cy}" for cx, cy in g),
            len(g),
            sum(dense[c] for c in g),
        )
        for g in groups.values()
    )
    assert got == want


def test_quality_readability_matches_python(spark):
    from llmaix_spark.plans.queries import q_quality_readability

    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_sentences"],
            r["n_vowels"],
            r["flesch"],
        )
        for r in q_quality_readability(spark, SF_DIR).collect()
    }

    import pandas as pd

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    for doc_id, text in zip(d["doc_id"], d["text"]):
        w = len(text.strip().split(" "))
        s = max(1, sum(text.count(ch) for ch in ".!?"))
        v = sum(text.lower().count(ch) for ch in "aeiou")
        flesch = 206.835 - 1.015 * (w / s) - 84.6 * (v / w)
        gw, gs, gv, gf = got[doc_id]
        assert (gw, gs, gv) == (w, s, v)
        assert abs(gf - flesch) < 1e-6


def test_conversion_latency_matches_python(spark):
    from llmaix_spark.plans.queries import q_conversion_latency

    got = {
        r["cohort_week"]: (
            r["n_conv"],
            r["p50_latency_us"],
            r["p90_latency_us"],
        )
        for r in q_conversion_latency(spark, SF_DIR).collect()
    }

    import pandas as pd

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["us"] = e["ts"].astype("int64")
    s0 = (
        e[e["event_type"] == "signup"].groupby("user_id")["us"].min()
    )
    day0 = min(v // 86_400_000_000 for v in s0)
    lat_by_cohort: dict[int, list[int]] = {}
    for u, s in s0.items():
        pu = e[
            (e["event_type"] == "purchase")
            & (e["user_id"] == u)
            & (e["us"] >= s)
        ]["us"]
        if len(pu) == 0:
            continue
        week = ((s // 86_400_000_000) - day0) // 7
        lat_by_cohort.setdefault(int(week), []).append(
            int(pu.min() - s)
        )
    want = {}
    for wk, lats in lat_by_cohort.items():
        lats.sort()
        n = len(lats)
        want[wk] = (
            n,
            lats[(n + 1) // 2 - 1],
            lats[(9 * n + 9) // 10 - 1],
        )
    assert got == want
