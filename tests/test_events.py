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
