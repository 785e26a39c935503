"""KMV distinct sketch, priority sampling, exact-OLS, BFS, skew
histogram — the round-5 analytics wave. Each test pins the operator
against an independent hand/numpy computation (the oracle-parity run
separately pins the DuckDB twin)."""

import math

import numpy as np
import pytest

from llmaix_spark.operators.graph import bfs_distances
from llmaix_spark.operators.profile import group_ols, skew_histogram
from llmaix_spark.operators.sketches import kmv_distinct, priority_sample


def _hash60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- KMV


def test_kmv_small_group_is_exact(spark):
    """Fewer than k distinct values → estimate == exact count."""
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(10)] * 3, "grp string, v string"
    )
    row = kmv_distinct(df, ["grp"], "v", k=64).collect()[0]
    assert row["n_exact"] == 10
    assert row["kmv_estimate"] == 10.0
    assert row["rel_err"] == 0.0


def test_kmv_matches_python_twin(spark):
    """k < n_distinct: the estimate equals the literal KMV formula on
    the same 60-bit hashes, and lands within the ~1/sqrt(k-2) band."""
    k, n = 16, 2000
    vals = [f"item-{i}" for i in range(n)]
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v string")
    row = kmv_distinct(df, ["grp"], "v", k=k).collect()[0]
    hk = sorted(_hash60(v) for v in vals)[k - 1]
    want = round(float((k - 1) * 2**60) / float(hk), 4)
    assert row["n_exact"] == n
    assert row["kmv_estimate"] == want
    assert abs(row["kmv_estimate"] - n) / n < 4 / math.sqrt(k - 2)


def test_kmv_null_values_ignored(spark):
    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("g", "b")], "grp string, v string"
    )
    row = kmv_distinct(df, ["grp"], "v", k=8).collect()[0]
    assert row["n_exact"] == 2


# ---------------------------------------------------- priority sample


def test_priority_sample_matches_python_twin(spark):
    """The sampled id set, order, and DLT estimates equal the literal
    single-threaded computation on the same hashes."""
    k, n = 8, 200
    rows = [(i, (i * 37) % 995 + 5) for i in range(n)]  # cents weights
    df = spark.createDataFrame(rows, "id bigint, cents bigint")
    got = priority_sample(df, "cents", ["id"], k=k).collect()

    qs = [
        (w * float(2**60) / float(_hash60(str(i)) + 1), i, w)
        for i, w in rows
    ]
    qs.sort(key=lambda t: (-t[0], t[1]))
    tau = qs[k][0]
    want = [
        (r + 1, i, round(w / 100.0, 2), round(max(float(w), tau) / 100.0, 2))
        for r, (q, i, w) in enumerate(qs[:k])
    ]
    assert [
        (r["rank"], r["id"], r["weight"], r["weight_est"]) for r in got
    ] == want


def test_priority_sample_subset_sum_unbiased_shape(spark):
    """n <= k degenerates to the whole population with est == weight
    (τ = 0), preserving the exact subset sum."""
    rows = [(i, 100 * (i + 1)) for i in range(5)]
    df = spark.createDataFrame(rows, "id bigint, cents bigint")
    got = priority_sample(df, "cents", ["id"], k=8).collect()
    assert len(got) == 5
    assert all(r["weight_est"] == r["weight"] for r in got)
    assert sum(r["weight_est"] for r in got) == pytest.approx(
        sum(c for _, c in rows) / 100.0
    )


# --------------------------------------------------------------- OLS


def test_group_ols_matches_exact_twin(spark):
    """Pins the operator to the literal closed form evaluated with
    Python's unbounded integers (exact sufficient statistics) + the
    same final IEEE steps — plus a loose numpy cross-check. numpy
    polyfit itself is NOT the reference at |x| ~ 1.7e9: its normal
    equations lose ~6 digits to conditioning that the exact-integer
    path never sees (centering via a numpy sanity bound only)."""
    xs = [1_700_000_000 + 86_400 * d for d in range(50)]
    ys = [100_000 + 37 * d + ((d * 7919) % 23 - 11) * 10 for d in range(50)]
    df = spark.createDataFrame(
        [("a", x, y) for x, y in zip(xs, ys)], "g string, x bigint, y bigint"
    )
    row = group_ols(df, ["g"], "x", "y").collect()[0]

    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    num, denx, deny = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    slope_raw = float(num) / float(denx)
    want_slope = round(slope_raw, 6)
    want_intercept = round((float(sy) - slope_raw * float(sx)) / float(n), 6)
    want_r2 = round(float(num) * float(num) / (float(denx) * float(deny)), 6)
    assert row["n"] == n
    assert row["slope"] == want_slope
    assert row["intercept"] == want_intercept
    assert row["r2"] == want_r2

    # numpy sanity band on the centered problem (well-conditioned)
    xc = np.array(xs, float) - np.mean(xs)
    s_np, i_np = np.polyfit(xc, np.array(ys, float), 1)
    # the operator output is 6dp-rounded: compare at grid resolution
    assert row["slope"] == pytest.approx(s_np, abs=5.1e-7)
    assert row["intercept"] == pytest.approx(
        i_np - s_np * np.mean(xs), rel=1e-5
    )
    r = np.corrcoef(xs, ys)[0, 1]
    assert row["r2"] == pytest.approx(r * r, abs=1e-4)


def test_group_ols_zero_variance_is_null(spark):
    df = spark.createDataFrame(
        [("a", 5, 1), ("a", 5, 2), ("b", 1, 1), ("b", 2, 3)],
        "g string, x bigint, y bigint",
    )
    rows = {r["g"]: r for r in group_ols(df, ["g"], "x", "y").collect()}
    assert rows["a"]["slope"] is None and rows["a"]["r2"] is None
    assert rows["b"]["slope"] == 2.0


def test_group_ols_partition_invariant(spark):
    """Exact decimal sums: identical output at 1 and 7 partitions
    (the double-summing built-ins cannot promise this)."""
    rows = [("g", 1_600_000_000 + i * 13, (i * 991) % 10_000) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
    a = group_ols(df.coalesce(1), ["g"], "x", "y").collect()[0]
    b = group_ols(df.repartition(7), ["g"], "x", "y").collect()[0]
    assert (a["slope"], a["intercept"], a["r2"]) == (
        b["slope"], b["intercept"], b["r2"]
    )


# --------------------------------------------------------------- BFS


def test_bfs_hand_graph(spark):
    """a-b-c-d chain + e-f island + self-loop + reverse duplicate:
    distances from min node 'a'; the island is unreachable."""
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"),
            ("d", "d"), ("e", "f"),
        ],
        "src string, dst string",
    )
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, max_hops=4).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_max_hops_bound(spark):
    chain = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(9)], "src string, dst string"
    )
    got = bfs_distances(chain, max_hops=3).collect()
    assert {r["node"] for r in got} == {"n0", "n1", "n2", "n3"}
    assert max(r["dist"] for r in got) == 3


def test_bfs_explicit_source(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, source_node="c", max_hops=4).collect()
    }
    assert got == {"c": 0, "b": 1, "a": 2}


# ----------------------------------------------------- skew histogram


def test_skew_histogram_hand_case(spark):
    """Frequencies 1,1,2,3,8 → buckets 0 (two keys), 1 (two keys:
    f=2,3), 3 (one key)."""
    rows = (
        [("k1",), ("k2",)]
        + [("k3",)] * 2
        + [("k4",)] * 3
        + [("k5",)] * 8
    )
    df = spark.createDataFrame(rows, "k string")
    got = {
        r["bucket"]: (r["freq_lo"], r["n_keys"], r["n_rows"], r["row_share"])
        for r in skew_histogram(df, "k").collect()
    }
    assert got == {
        0: (1, 2, 2, round(2 / 15, 6)),
        1: (2, 2, 5, round(5 / 15, 6)),
        3: (8, 1, 8, round(8 / 15, 6)),
    }


def test_skew_histogram_counts_nulls(spark):
    df = spark.createDataFrame(
        [("a",), (None,), (None,), (None,)], "k string"
    )
    got = {r["bucket"]: r["n_keys"] for r in skew_histogram(df, "k").collect()}
    assert got == {0: 1, 1: 1}  # f=1 for 'a', f=3 for NULL


# ------------------------------------------------------- plan shapes


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_kmv_plan_map_side_group_limit(spark):
    """The k-minima selection must run as WindowGroupLimit with a
    Partial (pre-shuffle) pass — each map task ships at most k rows
    per group, the property the 100 TB story rests on."""
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(100)], "grp string, v string"
    )
    plan = _phys(kmv_distinct(df, ["grp"], "v", k=8, include_exact=False))
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan


def test_kmv_sketch_only_mode(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(10)], "grp string, v string"
    )
    out = kmv_distinct(df, ["grp"], "v", k=64, include_exact=False)
    assert out.columns == ["grp", "kmv_estimate"]
    assert out.collect()[0]["kmv_estimate"] == 10.0


def test_priority_sample_plan_no_global_sort(spark):
    """Top-k must plan as TakeOrderedAndProject (per-partition heaps),
    never a rangepartitioned global sort of the corpus."""
    df = spark.createDataFrame(
        [(i, 100 + i) for i in range(500)], "id bigint, cents bigint"
    )
    plan = _phys(priority_sample(df, "cents", ["id"], k=8))
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


# ------------------------------------------------ TWAP and gap audit


def test_time_weighted_avg_hand_case(spark):
    """Value 100 held 3 s then 200 held 1 s → TWAP 125; the final
    observation carries no interval. Plain avg would say 140."""
    from datetime import datetime

    from llmaix_spark.operators.events import time_weighted_avg

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0.replace(second=0), 1, 100.0),
        (1, t0.replace(second=3), 2, 200.0),
        (1, t0.replace(second=4), 3, 999.0),
        (2, t0, 4, 50.0),  # single event: no interval, drops out
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, value double"
    )
    got = {r["user_id"]: r for r in time_weighted_avg(df).collect()}
    assert set(got) == {1}
    assert got[1]["n_intervals"] == 2
    assert got[1]["twap"] == 125.0


def test_sequence_gaps_cross_bucket(spark):
    """Keys 1,2,9,10 with bucket_size=4: the 3-8 gap spans the bucket
    boundary (and the empty bucket [4,8)) — it must come out as ONE
    row from the summary-level pass; 12,15 adds an intra-bucket gap."""
    from llmaix_spark.operators.profile import sequence_gaps

    df = spark.createDataFrame(
        [(k,) for k in (1, 2, 9, 10, 12, 15, 15)], "k bigint"
    )
    got = sorted(
        (r["gap_start"], r["gap_end"], r["gap_len"])
        for r in sequence_gaps(df, "k", bucket_size=4).collect()
    )
    assert got == [(3, 8, 6), (11, 11, 1), (13, 14, 2)]


def test_sequence_gaps_dense_is_empty(spark):
    from llmaix_spark.operators.profile import sequence_gaps

    df = spark.createDataFrame([(k,) for k in range(100)], "k bigint")
    assert sequence_gaps(df, "k", bucket_size=16).count() == 0


# ------------------------- snapshot diff, weighted median, phrase


def test_snapshot_diff_classifies(spark):
    from llmaix_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "k bigint, name string, bal double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (4, "D", 40.0), (5, "e", 50.0)],
        "k bigint, name string, bal double",
    )
    got = {
        r["k"]: r["change"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    # 1 unchanged (filtered); 2 NULL→20.0 update (null-safe compare);
    # 3 delete; 4 name update; 5 insert
    assert got == {2: "update", 3: "delete", 4: "update", 5: "insert"}
    rows = {
        r["k"]: r
        for r in snapshot_diff(
            old, new, ["k"], include_unchanged=True
        ).collect()
    }
    assert rows[1]["change"] == "unchanged"
    assert rows[3]["name_new"] is None and rows[3]["name_old"] == "c"


def test_weighted_median_hand_case(spark):
    from llmaix_spark.operators.profile import weighted_median

    # values (cents): 100 w1, 200 w2, 300 w1 → W=4, threshold 2 → 200
    # group h: heavy first value dominates
    df = spark.createDataFrame(
        [("g", 100, 1), ("g", 200, 2), ("g", 300, 1),
         ("h", 100, 10), ("h", 900, 1), ("h", 900, 2)],
        "grp string, cents bigint, qty bigint",
    )
    got = {
        r["grp"]: (r["n_rows"], r["total_w"], r["median"])
        for r in weighted_median(df, ["grp"], "cents", "qty").collect()
    }
    assert got == {"g": (3, 4, 2.0), "h": (3, 13, 1.0)}


def test_search_phrase_overlaps_and_order(spark):
    from llmaix_spark.operators.textstats import search_phrase

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),       # "a a" overlaps twice
            (2, "a b a b a"),     # "a b" twice, "b a" twice
            (3, "b b"),           # no "a b"
        ],
        "doc_id bigint, text string",
    )
    aa = {r["doc_id"]: r["n_occ"]
          for r in search_phrase(docs, ["a", "a"]).collect()}
    assert aa == {1: 2}
    ab = {r["doc_id"]: r["n_occ"]
          for r in search_phrase(docs, ["a", "b"]).collect()}
    assert ab == {1: 1, 2: 2}
    aba = {r["doc_id"]: r["n_occ"]
           for r in search_phrase(docs, ["a", "b", "a"]).collect()}
    assert aba == {2: 2}


def test_outliers_mad_hand_case(spark):
    """Values 100×9 + one 10000: median 100, MAD 0... degenerate MAD
    flags the spike; a spread case pins the threshold arithmetic."""
    from llmaix_spark.operators.profile import outliers_mad

    spread = [90, 95, 100, 100, 105, 110, 500]
    df = spark.createDataFrame(
        [("g", v) for v in spread], "grp string, cents bigint"
    )
    row = outliers_mad(df, ["grp"], "cents", k=3.0).collect()[0]
    # median 100, devs {10,5,0,0,5,10,400} → MAD 5; threshold 22.239
    assert row["n_rows"] == 7
    assert row["median"] == 1.0
    assert row["mad"] == 0.05
    assert row["n_outliers"] == 1  # only 500


# ---------------------------------------------------- kmv merge


def test_kmv_merge_equals_sketch_of_union(spark):
    """The merged estimate computed from the two part-sketches equals
    the KMV formula applied to the FULL union's hashes — the merge
    property, checked against the literal python twin."""
    from llmaix_spark.operators.sketches import kmv_merge

    k = 16
    a = [f"item-{i}" for i in range(800)]          # part 0
    b = [f"item-{i}" for i in range(400, 1200)]    # part 1, 50% overlap
    df = spark.createDataFrame(
        [("0", v) for v in a] + [("1", v) for v in b], "p string, v string"
    )
    rows = {r["part"]: r for r in kmv_merge(df, "p", "v", k=k).collect()}
    union_hashes = sorted({_hash60(v) for v in set(a) | set(b)})
    want = round(float((k - 1) * 2**60) / float(union_hashes[k - 1]), 4)
    assert rows["ALL"]["n_exact"] == 1200
    assert rows["ALL"]["kmv_estimate"] == want
    for part, vals in (("0", a), ("1", b)):
        hk = sorted(_hash60(v) for v in set(vals))[k - 1]
        assert rows[part]["kmv_estimate"] == round(
            float((k - 1) * 2**60) / float(hk), 4
        )


def test_kmv_merge_small_parts_exact(spark):
    from llmaix_spark.operators.sketches import kmv_merge

    df = spark.createDataFrame(
        [("0", "x"), ("0", "y"), ("1", "y"), ("1", "z")],
        "p string, v string",
    )
    rows = {r["part"]: r for r in kmv_merge(df, "p", "v", k=8).collect()}
    assert rows["0"]["kmv_estimate"] == 2.0
    assert rows["1"]["kmv_estimate"] == 2.0
    assert rows["ALL"]["n_exact"] == 3
    assert rows["ALL"]["kmv_estimate"] == 3.0
