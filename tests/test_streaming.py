"""Structured-Streaming ingest: incremental extraction with exactly-once
file semantics."""

import os

import pandas as pd
import pytest

from llmaix_spark.streaming.ingest import start_triples_stream


def _write_batch(path: str, conv_ids: list[str]) -> None:
    rows = []
    for cid in conv_ids:
        rows.append((cid, 0, "user", f"Anna Müller works at Acme Corporation in {cid}.", None, None))
        rows.append((cid, 1, "assistant", "noted", None, None))
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    pq.write_table(pa.Table.from_pandas(df, schema=schema), path)


def test_streaming_incremental_extraction(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    _write_batch(os.path.join(in_dir, "batch1.parquet"), ["c1", "c2"])
    q = start_triples_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out_dir)
    assert got1.select("conv_id").distinct().count() == 2

    # second drop: only the new file is processed (checkpoint dedup)
    _write_batch(os.path.join(in_dir, "batch2.parquet"), ["c3"])
    q2 = start_triples_stream(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir)
    assert got2.select("conv_id").distinct().count() == 3
    # c1/c2 not re-extracted: still exactly one triple each
    counts = {
        r["conv_id"]: r["n"]
        for r in got2.groupBy("conv_id").count().withColumnRenamed("count", "n").collect()
    }
    assert counts == {"c1": 1, "c2": 1, "c3": 1}


def test_streaming_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed micro-batch (fresh
    checkpoint over the same input — the crash-before-offset-commit
    shape) must OVERWRITE its batch_id partition, not append duplicates."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    _write_batch(os.path.join(in_dir, "batch1.parquet"), ["c1", "c2"])

    q = start_triples_stream(spark, in_dir, out_dir, str(tmp_path / "ck1"))
    q.awaitTermination(120)
    # same input replayed from scratch → same batch_id=0 → same rows
    q2 = start_triples_stream(spark, in_dir, out_dir, str(tmp_path / "ck2"))
    q2.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    counts = {
        r["conv_id"]: r["n"]
        for r in got.groupBy("conv_id").count().withColumnRenamed("count", "n").collect()
    }
    assert counts == {"c1": 1, "c2": 1}
