"""Structured-Streaming ingest: transcripts stream → triples stream.

The reference has no streaming operators (SURVEY §2.12 — batch jobs with
socketio progress). This module is the engine's forward-looking ingest
path: new transcript files land in a directory (or Kafka topic on a real
cluster), and triples are extracted incrementally with exactly-once file
semantics via the checkpoint location.

Two subtleties vs the batch pipeline:
  * Conversation assembly is a stateful aggregation over an unbounded
    key space — the streaming flavor processes each micro-batch's
    *complete conversations only* when used with per-conversation files,
    or runs `foreachBatch` delegating to the batch operators (chosen
    here: the batch code is the single source of truth, no semantics
    fork).
  * Linking/canonicalization are global — they stay batch (run
    periodically over the accumulated triples table). Streaming stops at
    triples_raw, the pipeline's only append-only table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from llmaix_spark.operators.extraction import ExtractionConfig, extract_triples
from llmaix_spark.schemas import TRANSCRIPTS


def stream_transcripts(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source transcript stream (parquet drops)."""
    r = spark.readStream.schema(TRANSCRIPTS)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(input_dir)


def start_triples_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: ExtractionConfig | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """transcripts dir → append-only triples_raw parquet.

    foreachBatch reuses the exact batch operators (assembly + mapInPandas
    extraction) per micro-batch: each micro-batch must contain whole
    conversations (one file = one conversation shard set), which the
    file-drop layout guarantees.

    Exactly-once: foreachBatch is only AT-LEAST-once (a crash between the
    data write and the offset commit replays the batch), so the sink must
    be idempotent per batch_id — each batch OVERWRITES its own
    `batch_id=N` partition; a replayed batch rewrites the same partition
    instead of appending duplicates. Readers load `output_dir` as normal
    partitioned parquet."""
    cfg = cfg or ExtractionConfig()
    stream = stream_transcripts(spark, input_dir, max_files_per_trigger)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        triples, _raw = extract_triples(batch_df, cfg)
        triples.write.mode("overwrite").parquet(
            f"{output_dir}/batch_id={batch_id}"
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
