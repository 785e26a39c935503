"""Round-6 optimization pins: behavior that the perf rewrites must not
change — pagerank/bfs session-conf restore, the pipeline final-mode
resume short-circuit, write_stage output compaction, and the
array-based fingerprint/verify equivalences."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from llmaix_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(master="local[4]", app_name="test-r06",
                  shuffle_partitions=8)
    yield s


def test_pagerank_restores_shuffle_partitions(spark):
    from llmaix_spark.operators.graph import pagerank

    before = spark.conf.get("spark.sql.shuffle.partitions")
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")],
        "subj_id string, obj_id string",
    )
    out = pagerank(edges, iterations=2)
    assert out.count() == 4
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_bfs_restores_shuffle_partitions_and_distances(spark):
    from llmaix_spark.operators.graph import bfs_distances

    before = spark.conf.get("spark.sql.shuffle.partitions")
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "src string, dst string",
    )
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(edges, max_hops=3).collect()
    }
    # source = lexicographically smallest node 'a'; x/y unreachable
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_pipeline_final_resume_short_circuit(spark, tmp_path):
    """final-mode resume with complete manifests must return the
    materialized tables WITHOUT recomputing (the triples factory must
    not be invoked on the resumed call)."""
    from llmaix_spark.pipeline import PipelineConfig, run_pipeline_from_triples

    triples = spark.createDataFrame(
        [("c1", "Alice", "works_at", "Acme"),
         ("c2", "Bob", "lives_in", "Bonn")],
        "conv_id string, subj_surface string, pred string, obj_surface string",
    )
    out = str(tmp_path / "kg")
    cfg = PipelineConfig(out_dir=out, checkpoint_stages="final", resume=True)
    r1 = run_pipeline_from_triples(spark, lambda: triples, cfg)
    edges1 = sorted(map(tuple, r1["edges"].select(
        "subj_id", "pred", "obj_id").collect()))
    assert edges1

    def boom():
        raise AssertionError("resume hit must not rebuild the DAG")

    r2 = run_pipeline_from_triples(spark, boom, cfg)
    edges2 = sorted(map(tuple, r2["edges"].select(
        "subj_id", "pred", "obj_id").collect()))
    assert edges1 == edges2
    assert r2["nodes"].count() == r1["nodes"].count()


def test_write_stage_compacts_partitioned_output(spark, tmp_path):
    """REBALANCE before the write: file count must track data volume,
    not tasks x partition-values (a 12-partition 6-value input would
    otherwise fragment into up to 72 files)."""
    from llmaix_spark.operators.materialize import write_stage

    df = (
        spark.range(0, 6000)
        .repartition(12)
        .select(
            F.col("id"),
            (F.col("id") % 6).cast("string").alias("pred"),
        )
    )
    back = write_stage(df, str(tmp_path), "edges", partition_by=["pred"])
    assert back.count() == 6000
    files = glob.glob(
        os.path.join(str(tmp_path), "stage=edges", "data", "pred=*", "*.parquet")
    )
    # one advisory-sized file per partition value for tiny data
    assert len(files) <= 12, files


def test_doc_fingerprint_matches_exploded_baseline(spark):
    from llmaix_spark.operators.textstats import doc_fingerprint, ngram_hash_array

    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e"), (3, "x y"),
         (4, "p p p p p p")],
        "doc_id long, text string",
    )
    fast = {
        r["doc_id"]: (r["fp_min"], r["fp_max"], r["fp_n"])
        for r in doc_fingerprint(docs, n=5).collect()
    }
    sh = docs.select(
        "doc_id", F.explode(ngram_hash_array(F.col("text"), 5)).alias("h")
    )
    slow = {
        r["doc_id"]: (r["mn"], r["mx"], r["n"])
        for r in sh.groupBy("doc_id")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"),
             F.countDistinct("h").alias("n"))
        .collect()
    }
    assert fast == slow
    assert 3 not in fast  # too short for a 5-gram: no row, like explode
