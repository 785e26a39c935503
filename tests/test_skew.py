"""Adversarial skew: one entity dominating the corpus must not break or
mis-canonicalize the pipeline (north-rule hot-entity handling)."""

import pytest
from pyspark.sql import functions as F

from llmaix_spark.operators.canonicalize import salted_count
from llmaix_spark.pipeline import PipelineConfig, canonical_triples, run_pipeline


def test_pipeline_under_extreme_skew(spark):
    """95% of turns mention the same entity (with surface variants)."""
    hot = [
        ("c%05d" % i, 0, "user",
         ["Hot Entity works at Acme Corporation.",
          "hot entity works at Acme Corporation.",
          "Hot Entxty works at Acme Corporation.",
          "Hot Entity lives in München."][i % 4],
         None, None)
        for i in range(1900)
    ]
    cold = [
        ("d%05d" % i, 0, "user",
         f"Cold Person{i:02d}x works at Vandelay Industries.", None, None)
        for i in range(100)
    ]
    df = spark.createDataFrame(
        hot + cold,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).repartition(8)
    res = run_pipeline(spark, df, PipelineConfig(num_partitions=8))
    triples = canonical_triples(res["edges"])
    subs = {r["subj"] for r in triples.select("subj").distinct().collect()}
    # the hot entity's variants all collapse into one canonical subject
    hot_forms = {s for s in subs if "ent" in s and "hot" in s}
    assert hot_forms == {"hot entity"}, subs
    # node table carries the skew-aware counts
    hot_node = (
        res["nodes"].filter(F.col("canonical_name") == "hot entity").collect()[0]
    )
    # 3 of 4 surface variants are extractable (lowercase is invisible to
    # the capitalized-entity grammar, by design) → ~1425 of 1900
    assert hot_node["n_refs"] >= 1400
    assert "Hot Entxty" in hot_node["aliases"]


def test_salted_count_extreme_skew(spark):
    df = spark.range(0, 200_000).select(
        F.when(F.col("id") % 100 < 99, F.lit("hot")).otherwise(
            F.concat(F.lit("cold"), (F.col("id") % 37).cast("string"))
        ).alias("k")
    )
    got = {r["k"]: r["n"] for r in salted_count(df, "k", salt_buckets=16).collect()}
    assert got["hot"] == 198_000
    assert sum(v for k, v in got.items() if k.startswith("cold")) == 2_000
