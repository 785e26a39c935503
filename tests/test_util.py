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
