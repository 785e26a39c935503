"""Event funnel stages."""

from datetime import datetime

from llmaix_spark.operators.events import funnel_stages


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, 1, h, m), et) for u, h, m, et in rows],
        "user_id string, ts timestamp, event_type string",
    )


def test_funnel_hand_computed(spark):
    """u1 converts fully; u2 clicks before viewing (click must not
    count — strictly after); u3 only views; u4 never views (stage 0)."""
    e = _ev(spark, [
        ("u1", 9, 0, "view"), ("u1", 9, 5, "click"), ("u1", 9, 9, "buy"),
        ("u2", 8, 0, "click"), ("u2", 9, 0, "view"),
        ("u3", 9, 0, "view"), ("u3", 8, 59, "buy"),
        ("u4", 9, 0, "other"),
    ])
    got = {
        r["stage"]: r["n_users"]
        for r in funnel_stages(e, ["view", "click", "buy"]).collect()
    }
    assert got == {0: 1, 1: 2, 3: 1}


def test_funnel_min_anchoring(spark):
    """The anchor is the FIRST view — a click between first and second
    view counts, even though a later view would also admit it."""
    e = _ev(spark, [
        ("u1", 9, 0, "view"), ("u1", 9, 30, "click"),
        ("u1", 10, 0, "view"),
    ])
    got = {
        r["stage"]: r["n_users"]
        for r in funnel_stages(e, ["view", "click"]).collect()
    }
    assert got == {2: 1}


def test_funnel_conversion_window(spark):
    """With a 10-minute window the 30-minute click no longer
    converts."""
    e = _ev(spark, [
        ("u1", 9, 0, "view"), ("u1", 9, 30, "click"),
        ("u2", 9, 0, "view"), ("u2", 9, 5, "click"),
    ])
    got = {
        r["stage"]: r["n_users"]
        for r in funnel_stages(
            e, ["view", "click"], max_gap_us=600_000_000
        ).collect()
    }
    assert got == {1: 1, 2: 1}


def test_burst_buckets_hand_computed(spark):
    """Type A: bucket counts [1,1,1,1,9] → k=5, S=13, Q=85:
    dev = 9·5−13 = 32, var_k2 = 85·5−169 = 256, z² = 1024/256 = 4.0
    EXACTLY — the strict > gate must exclude it (the float-free
    boundary case). Type B: [1,1,1,1,1,19] → k=6, S=24, Q=366:
    dev = 90, var_k2 = 1620, z² = 8100/1620 = 5.0 > 4 → burst with
    z = sqrt(5)."""
    from datetime import datetime, timedelta

    from llmaix_spark.operators.events import burst_buckets

    rows = []
    t0 = datetime(2024, 1, 1)
    # type A: counts [1,1,1,1,9] → spike z == 2.0 exactly → excluded
    for h in range(4):
        rows.append(("u", t0 + timedelta(hours=h), "A"))
    for i in range(9):
        rows.append(("u", t0 + timedelta(hours=4, minutes=i), "A"))
    # a single-spike profile has z² ≈ k−1, so k ≥ 6 is needed to
    # clear the z > 2 gate; counts [1,1,1,1,1,19]: z² = 8100/1620 = 5
    for h in range(5):
        rows.append(("u", t0 + timedelta(hours=h), "B"))
    for i in range(19):
        rows.append(("u", t0 + timedelta(hours=5, minutes=i), "B"))
    e = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_type string"
    )
    got = burst_buckets(e).collect()
    assert [(r["event_type"], r["n_events"]) for r in got] == [("B", 19)]
    import math

    assert got[0]["z"] == round(math.sqrt(8100 / 1620), 4)


def test_burst_buckets_uniform_no_burst(spark):
    from datetime import datetime, timedelta

    from llmaix_spark.operators.events import burst_buckets

    e = spark.createDataFrame(
        [("u", datetime(2024, 1, 1) + timedelta(hours=h), "A")
         for h in range(6)],
        "user_id string, ts timestamp, event_type string",
    )
    assert burst_buckets(e).count() == 0


def test_transition_matrix_hand_computed(spark):
    """u1: A→B→A; u2: A→B. Pairs: (A,B)x2, (B,A)x1. P(B|A)=1.0,
    P(A|B)=0.5... careful: from B there are 2 departures? u1 B→A only
    → P(A|B)=1.0; totals per src: A:2, B:1."""
    from llmaix_spark.operators.events import transition_matrix

    e = spark.createDataFrame(
        [
            ("u1", 1, datetime(2024, 1, 1, 9, 0), "A"),
            ("u1", 2, datetime(2024, 1, 1, 9, 1), "B"),
            ("u1", 3, datetime(2024, 1, 1, 9, 2), "A"),
            ("u2", 4, datetime(2024, 1, 1, 9, 0), "A"),
            ("u2", 5, datetime(2024, 1, 1, 9, 1), "B"),
        ],
        "user_id string, event_id bigint, ts timestamp, event_type string",
    )
    got = {
        (r["src"], r["dst"]): (r["n"], r["p"])
        for r in transition_matrix(e).collect()
    }
    assert got == {("A", "B"): (2, 1.0), ("B", "A"): (1, 1.0)}


def test_cohort_retention_hand_computed(spark):
    """Two users first active week 0; one returns week 1; a third
    starts week 1. Cohort 0: offset 0 rate 1.0, offset 1 rate 0.5;
    cohort 1: offset 0 rate 1.0."""
    from datetime import timedelta

    from llmaix_spark.operators.events import cohort_retention

    t0 = datetime(1970, 1, 1)  # epoch-aligned weeks
    e = spark.createDataFrame(
        [
            ("u1", t0), ("u2", t0),
            ("u1", t0 + timedelta(days=8)),
            ("u3", t0 + timedelta(days=9)),
        ],
        "user_id string, ts timestamp",
    )
    got = {
        (r["cohort_period"], r["offset"]): (
            r["n_active"], r["n_cohort"], r["retention"]
        )
        for r in cohort_retention(e).collect()
    }
    assert got == {
        (0, 0): (2, 2, 1.0),
        (0, 1): (1, 2, 0.5),
        (1, 0): (1, 1, 1.0),
    }


def test_ohlc_hand_computed(spark):
    """One day, one type: open is the value at the earliest (ts, id),
    close at the latest — a same-timestamp tie resolves by event_id."""
    from llmaix_spark.operators.events import ohlc_buckets

    t = datetime(2024, 1, 1, 12, 0)
    e = spark.createDataFrame(
        [
            ("A", 2, t, 5.0),   # same ts as id 1 — id orders the tie
            ("A", 1, t, 3.0),   # open
            ("A", 3, datetime(2024, 1, 1, 13, 0), 9.0),
            ("A", 4, datetime(2024, 1, 1, 14, 0), 1.0),  # close, low
        ],
        "event_type string, event_id bigint, ts timestamp, value double",
    )
    r = ohlc_buckets(e).collect()[0]
    assert (r["open"], r["high"], r["low"], r["close"]) == (
        3.0, 9.0, 1.0, 1.0
    )
    assert r["n_events"] == 4 and r["total_value"] == 18.0


def test_ewma_exact_hand_computed(spark):
    """depth=2, alpha=1/2: first row ewma = x1; after, (2*x_t + x_{t-1})/3.
    Values chosen so every quotient is exact at 6dp."""
    from llmaix_spark.operators.events import ewma_exact

    e = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 9, 0), "u1", 3.0),
            (2, datetime(2024, 1, 1, 9, 1), "u1", 6.0),
            (3, datetime(2024, 1, 1, 9, 2), "u1", 9.0),
            (4, datetime(2024, 1, 1, 9, 0), "u2", 5.0),
        ],
        "event_id long, ts timestamp, user_id string, value double",
    )
    got = {
        r["event_id"]: (r["window_n"], r["ewma"])
        for r in ewma_exact(e, depth=2).collect()
    }
    assert got[1] == (1, 3.0)          # 300/100
    assert got[2] == (2, 5.0)          # (2*600+300)/300
    assert got[3] == (2, 8.0)          # (2*900+600)/300
    assert got[4] == (1, 5.0)


def test_ewma_window_truncates_at_depth(spark):
    """With depth=2 only the last two observations matter — row 3 of a
    3-row timeline ignores row 1 entirely."""
    from llmaix_spark.operators.events import ewma_exact

    e = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 9, 0), "u1", 1000.0),
            (2, datetime(2024, 1, 1, 9, 1), "u1", 6.0),
            (3, datetime(2024, 1, 1, 9, 2), "u1", 9.0),
        ],
        "event_id long, ts timestamp, user_id string, value double",
    )
    row = {
        r["event_id"]: r["ewma"] for r in ewma_exact(e, depth=2).collect()
    }
    assert row[3] == 8.0  # (2*900 + 600) / 300 — the 1000.0 is gone


def test_rolling_active_users_hand_computed(spark):
    """u1 active day0+day2, u2 day0 only, u3 day8: the 7-day window of
    day 2 sees u1+u2, day 8 sees only u3 (day 2 is 6 days back at day
    8 — inclusive boundary)."""
    from datetime import datetime as dt

    from llmaix_spark.operators.events import rolling_active_users

    e = spark.createDataFrame(
        [
            ("u1", dt(2024, 1, 1, 9)), ("u1", dt(2024, 1, 3, 9)),
            ("u2", dt(2024, 1, 1, 10)),
            ("u3", dt(2024, 1, 9, 9)),
        ],
        "user_id string, ts timestamp",
    )
    got = {
        str(r["day"]): (r["dau"], r["active_w"])
        for r in rolling_active_users(e, window_days=7).collect()
    }
    assert got == {
        "2024-01-01": (2, 2),
        "2024-01-03": (1, 2),   # u1 + u2 (both within 7 days)
        "2024-01-09": (1, 2),   # u3 + u1-from-day3 (6 days back)
    }
