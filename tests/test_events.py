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
