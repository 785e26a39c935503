"""Plan pins, partition invariance, and python twins for the round-23
wave (incremental dedup / JS divergence / PR gains / RLE lengths /
hour uniformity / corpus datasheet).
"""

from __future__ import annotations

import math

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# plan pins


def test_incremental_no_cartesian(spark):
    from llmaix_spark.plans.queries import q_dedup_incremental

    plan = _phys(q_dedup_incremental(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_js_no_cartesian_counts_broadcast(spark):
    from llmaix_spark.plans.queries import q_lang_divergence_js

    plan = _phys(q_lang_divergence_js(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_gains_windows_bounded(spark):
    from llmaix_spark.plans.queries import q_pr_gains_curve

    plan = _phys(q_pr_gains_curve(spark, SF_DIR))
    # the decile table is checkpointed, so only the 10-row cumulative
    # window remains in the final plan (the ranking window ran once)
    assert plan.count("Window") <= 2


def test_rle_windows_partition_by_user(spark):
    from llmaix_spark.plans.queries import q_rle_lengths

    plan = _phys(q_rle_lengths(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # both windows share the (u, us, eid) sort — never a global sort
    assert "rangepartitioning" not in plan


def test_uniformity_no_window(spark):
    from llmaix_spark.plans.queries import q_hour_uniformity

    plan = _phys(q_hour_uniformity(spark, SF_DIR))
    assert "Window" not in plan


def test_datasheet_broadcast_assembly(spark):
    from llmaix_spark.plans.queries import q_corpus_datasheet

    plan = _phys(q_corpus_datasheet(spark, SF_DIR))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# partition invariance


@pytest.mark.parametrize(
    "qname",
    [
        "dedup_incremental",
        "lang_divergence_js",
        "pr_gains_curve",
        "rle_lengths",
        "hour_uniformity",
        "corpus_datasheet",
    ],
)
def test_wave23_partition_invariance(spark, qname):
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


def _shingles(text: str, n: int = 3) -> set:
    toks = text.strip().split()
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    }


def test_incremental_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_dedup_incremental

    got = {
        r["doc_id"]: r["verdict"]
        for r in q_dedup_incremental(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sh = {int(r.doc_id): _shingles(r.text) for r in d.itertuples()}
    batch = [i for i in sh if i % 5 == 0]
    want = {}
    for a in batch:
        dup_corpus = False
        dup_batch = False
        for b in sh:
            if b == a:
                continue
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            if inter / len(sh[a] | sh[b]) >= 0.5:
                if b % 5 != 0:
                    dup_corpus = True
                elif b < a:
                    dup_batch = True
        want[a] = (
            "dup_of_corpus"
            if dup_corpus
            else ("dup_in_batch" if dup_batch else "unique")
        )
    assert got == want
    assert "dup_of_corpus" in set(got.values())


def test_js_matches_python_and_is_metric_like(spark):
    from collections import Counter

    import pandas as pd

    from llmaix_spark.plans.queries import q_lang_divergence_js

    got = {
        (r["lang_a"], r["lang_b"]): r["js_nano"]
        for r in q_lang_divergence_js(spark, SF_DIR).collect()
    }

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    counts: dict[str, Counter] = {}
    for r in d.itertuples():
        counts.setdefault(r.lang, Counter()).update(
            t for t in r.text.strip().lower().split() if t
        )
    langs = sorted(counts)
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            na = sum(counts[la].values())
            nb = sum(counts[lb].values())
            js = 0
            for t in set(counts[la]) | set(counts[lb]):
                pa = counts[la][t] / na
                pb = counts[lb][t] / nb
                m = (pa + pb) / 2
                term = 0.0
                if pa > 0:
                    term += 0.5 * pa * round(math.log2(pa / m), 9)
                if pb > 0:
                    term += 0.5 * pb * round(math.log2(pb / m), 9)
                js += int(
                    math.copysign(math.floor(abs(term * 1e9) + 0.5), term)
                )
            assert abs(got[(la, lb)] - js) <= 2
            # JS is bounded by 1 bit and non-negative
            assert 0 <= got[(la, lb)] <= 1_000_000_000


def test_gains_matches_python(spark):
    from llmaix_spark.plans.queries import q_pr_gains_curve

    rows = {
        r["decile"]: r for r in q_pr_gains_curve(spark, SF_DIR).collect()
    }
    assert set(rows) == set(range(1, 11))
    # cumulative counts are monotone; the last decile covers everything
    assert rows[10]["recall_at"] == 1.0
    for d in range(2, 11):
        assert rows[d]["cum_n"] > rows[d - 1]["cum_n"]
        assert rows[d]["cum_tp"] >= rows[d - 1]["cum_tp"]
    # precision_at is cum_tp/cum_n exactly
    for d, r in rows.items():
        assert abs(r["precision_at"] - r["cum_tp"] / r["cum_n"]) < 1e-6


def test_rle_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_rle_lengths

    got = {
        (r["event_type"], r["run_len"]): r["n_runs"]
        for r in q_rle_lengths(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["us"] = e["ts"].astype("int64")
    want: dict[tuple, int] = {}
    for _, g in e.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        types = list(g["event_type"])
        i = 0
        while i < len(types):
            j = i
            while j < len(types) and types[j] == types[i]:
                j += 1
            key = (types[i], j - i)
            want[key] = want.get(key, 0) + 1
            i = j
    assert got == want
    # every event is in exactly one run
    assert sum(k[1] * v for k, v in got.items()) == len(e)


def test_uniformity_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_hour_uniformity

    got = {
        r["event_type"]: (r["n_events"], r["df"], r["chi2"])
        for r in q_hour_uniformity(spark, SF_DIR).collect()
    }

    e = pd.read_parquet(f"{SF_DIR}/events.parquet")
    e["hod"] = (e["ts"].astype("int64") // 3_600_000_000) % 24
    for et, g in e.groupby("event_type"):
        n = len(g)
        exp = n / 24.0
        counts = g.groupby("hod").size()
        chi2 = sum((c - exp) ** 2 / exp for c in counts) + (
            24 - len(counts)
        ) * exp
        gn, gdf, gchi = got[et]
        assert (gn, gdf) == (n, 23)
        assert abs(gchi - chi2) < 1e-4


def test_datasheet_matches_python(spark):
    import pandas as pd

    from llmaix_spark.plans.queries import q_corpus_datasheet

    row = q_corpus_datasheet(spark, SF_DIR).collect()[0]

    d = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    toks = [t for x in d["text"] for t in x.strip().lower().split() if t]
    srt = d.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    med = int(srt.loc[(len(d) + 1) // 2 - 1, "n_chars"])
    assert row["n_docs"] == len(d)
    assert row["n_langs"] == d["lang"].nunique()
    assert row["total_chars"] == int(d["n_chars"].sum())
    assert row["min_chars"] == int(d["n_chars"].min())
    assert row["max_chars"] == int(d["n_chars"].max())
    assert row["p50_chars"] == med
    assert row["n_tokens"] == len(toks)
    assert row["vocab"] == len(set(toks))
    assert abs(row["mean_tokens_per_doc"] - len(toks) / len(d)) < 1e-6
