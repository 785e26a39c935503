"""asof_join / range_join: hand-computed semantics."""

import pytest

from llmaix_spark.operators.asof import asof_join, range_join


@pytest.fixture(scope="module")
def quotes(spark):
    # unique per (sym, ts) as the contract requires
    return spark.createDataFrame(
        [
            ("A", 100, 10.0),
            ("A", 200, 11.0),
            ("A", 300, 12.0),
            ("B", 150, 20.0),
        ],
        "sym string, ts bigint, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", 90),    # before any quote -> null
            (2, "A", 200),   # equal ts matches (>=)
            (3, "A", 250),   # between -> 200
            (4, "B", 1000),  # far after -> 150 (tolerance kills it)
            (5, "C", 500),   # key with no quotes -> null
        ],
        "tid bigint, sym string, ts bigint",
    )


def _rows(df):
    return {
        r["tid"]: (r["ts_r"], r["px"]) for r in df.collect()
    }


def test_asof_backward(trades, quotes):
    got = _rows(asof_join(trades, quotes, on="ts", by=["sym"]))
    assert got == {
        1: (None, None),
        2: (200, 11.0),
        3: (200, 11.0),
        4: (150, 20.0),
        5: (None, None),
    }


def test_asof_forward(trades, quotes):
    got = _rows(
        asof_join(trades, quotes, on="ts", by=["sym"], direction="forward")
    )
    assert got == {
        1: (100, 10.0),
        2: (200, 11.0),   # equal ts matches in forward mode too
        3: (300, 12.0),
        4: (None, None),
        5: (None, None),
    }


def test_asof_tolerance(trades, quotes):
    got = _rows(
        asof_join(trades, quotes, on="ts", by=["sym"], tolerance_us=100)
    )
    assert got[4] == (None, None)      # lag 850 > 100 -> nulled
    assert got[3] == (200, 11.0)       # lag 50 kept


def test_asof_bad_direction(trades, quotes):
    with pytest.raises(ValueError):
        asof_join(trades, quotes, direction="sideways")


def test_range_join_buckets_and_bounds(spark):
    ivs = spark.createDataFrame(
        [(1, "u", 100, 350), (2, "u", 400, 401), (3, "v", 0, 1000)],
        "iv_id bigint, k string, s bigint, e bigint",
    )
    pts = spark.createDataFrame(
        [
            ("u", 100),   # == start: IN (half-open)
            ("u", 349),   # last inside
            ("u", 350),   # == end: OUT
            ("u", 400),   # zero-ish interval [400,401)
            ("v", 999),
            ("w", 500),   # key with no interval
        ],
        "k string, p bigint",
    )
    got = sorted(
        (r["iv_id"], r["p"])
        for r in range_join(
            pts, ivs, "p", "s", "e", by=["k"], bucket_width=100
        ).collect()
    )
    # interval 1 spans buckets 1..3 yet each pair appears EXACTLY once
    assert got == [(1, 100), (1, 349), (2, 400), (3, 999)]


def test_range_join_rejects_column_overlap(spark):
    ivs = spark.createDataFrame([(1, 0, 10)], "x bigint, s bigint, e bigint")
    pts = spark.createDataFrame([(1, 5)], "x bigint, p bigint")
    with pytest.raises(ValueError):
        range_join(pts, ivs, "p", "s", "e", by=[], bucket_width=10)
