"""format_time (F8), metadata merge (J6), leaderboard mean (A8)."""

from pyspark.sql import functions as F

from llmaix_spark.functions.util import (
    format_time,
    leaderboard_mean,
    merge_metadata_expr,
)


def test_format_time():
    # reference test table (webapp/llm_processing/tests, format_time cases)
    assert format_time(5.5) == "5.50 s"
    assert format_time(90) == "1.50 min"
    assert format_time(7200) == "2.00 h"
    assert format_time(172800) == "2.00 d"


def test_merge_metadata_tolerant(spark):
    df = spark.createDataFrame(
        [('{"a": "1"}',), ("not json",), (None,)], ["metadata"]
    )
    out = df.select(
        merge_metadata_expr(F.col("metadata"), {"llm_processing": "run42"}).alias("m")
    ).collect()
    import json

    parsed = [json.loads(r["m"]) for r in out]
    assert parsed[0] == {"a": "1", "llm_processing": "run42"}
    # unparseable / null stored metadata → empty map + run keys
    assert parsed[1] == {"llm_processing": "run42"}
    assert parsed[2] == {"llm_processing": "run42"}


def test_leaderboard_mean(spark):
    df = spark.createDataFrame([(0.5, 0.7, 0.9)], ["p", "r", "f1"])
    got = leaderboard_mean(df, ["p", "r", "f1"]).collect()[0]
    assert got["leaderboard_mean"] == 0.7


def test_position_map_span():
    # reference test_text_matching.py: map spans between a text and its
    # cleaned variant (chars removed)
    from llmaix_spark.functions.positions import map_span

    src = "he llo wor ld"
    tgt = "hello world"
    # "wor" in src is [7,10) → in tgt [6,9)
    assert tgt[slice(*map_span(src, tgt, 7, 10))] == "wor"
    # identical texts → identity
    assert map_span("same", "same", 1, 3) == (1, 3)


def test_read_reports_excel_gated(spark, tmp_path):
    from llmaix_spark.sources.readers import read_reports_excel
    import pytest as pt

    # no Excel engine in this container → clean NotImplementedError
    fake = tmp_path / "x.xlsx"
    fake.write_bytes(b"PK\x03\x04 not a real xlsx")
    with pt.raises((NotImplementedError, ValueError, Exception)):
        read_reports_excel(spark, str(fake))


def test_merge_metadata_overwrites_existing_run_key(spark):
    """Re-processing rows whose metadata already carries a previous run's
    entry must OVERWRITE it (reference dict assignment), not throw
    DUPLICATED_MAP_KEY."""
    import json as _json

    from pyspark.sql import functions as F

    from llmaix_spark.functions.util import merge_metadata_expr

    df = spark.createDataFrame(
        [('{"llm_processing": "old", "keep": "me"}',)], ["metadata"]
    )
    [row] = df.select(
        merge_metadata_expr(
            F.col("metadata"), {"llm_processing": "run42"}
        ).alias("m")
    ).collect()
    got = _json.loads(row["m"])
    assert got == {"keep": "me", "llm_processing": "run42"}


def test_ratio_null_propagation():
    from llmaix_spark.functions.fuzzy import ratio

    assert ratio(None, "x") is None
    assert ratio("x", None) is None
    assert ratio("", "") == 100.0
