"""Event-time streaming: watermark window counts + stateful sessionizer."""

import os
from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(pa.Table.from_pandas(df, schema=schema), path)


T0 = datetime(2026, 1, 1, 10, 0, 0)


def test_windowed_event_counts(spark, tmp_path):
    from llmaix_spark.streaming.windows import stream_events, windowed_event_counts

    in_dir = str(tmp_path / "ev")
    os.makedirs(in_dir)
    rows = [
        (1, T0, 1, "click", 1.0, "{}"),
        (2, T0 + timedelta(minutes=10), 1, "click", 2.0, "{}"),
        (3, T0 + timedelta(minutes=70), 2, "view", 3.0, "{}"),
    ]
    _write_events(os.path.join(in_dir, "a.parquet"), rows)
    out = windowed_event_counts(stream_events(spark, in_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].hour, r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("select * from wincounts").collect()
    }
    assert got[(10, "click")] == (2, 3.0)
    assert got[(11, "view")] == (1, 3.0)


def test_stateful_sessionizer(spark, tmp_path):
    from llmaix_spark.streaming.windows import sessionize_stateful, stream_events

    in_dir = str(tmp_path / "ev2")
    os.makedirs(in_dir)
    # user 1: two sessions separated by a 2h gap; user 2: one session
    rows = [
        (1, T0, 1, "click", 1.0, "{}"),
        (2, T0 + timedelta(minutes=5), 1, "click", 1.0, "{}"),
        (3, T0 + timedelta(hours=2, minutes=10), 1, "click", 1.0, "{}"),
        (4, T0 + timedelta(minutes=1), 2, "view", 1.0, "{}"),
    ]
    _write_events(os.path.join(in_dir, "a.parquet"), rows)
    out = sessionize_stateful(stream_events(spark, in_dir), gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r["user_id"], r["n_events"])
        for r in spark.sql(
            "select * from sessions order by user_id, session_start"
        ).collect()
    ]
    # only user 1's FIRST session closed (gap exceeded within the batch);
    # the open sessions stay in state until later batches / timeout
    assert (1, 2) in got


def test_stateful_sessionizer_out_of_order_within_batch(spark, tmp_path):
    """A late event that lands between two in-session events must extend
    the session, not move its end backwards and split it (sessions with
    end < start were possible before the min/max state transitions)."""
    from llmaix_spark.streaming.windows import sessionize_stateful, stream_events

    in_dir = str(tmp_path / "ev3")
    os.makedirs(in_dir)
    # all pairwise-adjacent gaps < 30 min once sorted, then a 2h jump
    # closes the session so it is emitted within this batch
    rows = [
        (1, T0 + timedelta(minutes=20), 1, "click", 1.0, "{}"),
        (2, T0, 1, "click", 1.0, "{}"),               # "late" vs event 1
        (3, T0 + timedelta(minutes=40), 1, "click", 1.0, "{}"),
        (4, T0 + timedelta(hours=3), 1, "click", 1.0, "{}"),
    ]
    _write_events(os.path.join(in_dir, "a.parquet"), rows)
    out = sessionize_stateful(stream_events(spark, in_dir), gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_ooo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows_out = spark.sql("select * from sessions_ooo").collect()
    assert len(rows_out) == 1
    r = rows_out[0]
    assert r["n_events"] == 3
    assert r["session_end"] >= r["session_start"]
    assert (r["session_end"] - r["session_start"]).total_seconds() == 2400


def test_stateful_sessionizer_non_utc_session_timezone(spark, tmp_path):
    """Event-time timeouts compare against the UTC watermark; naive
    session-tz epoch extraction skewed them by the tz offset (and west
    of UTC could kill the query with 'timeout earlier than watermark')."""
    from llmaix_spark.streaming.windows import sessionize_stateful, stream_events

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        in_dir = str(tmp_path / "ev4")
        os.makedirs(in_dir)
        rows = [
            (1, T0, 1, "click", 1.0, "{}"),
            (2, T0 + timedelta(minutes=5), 1, "click", 1.0, "{}"),
            (3, T0 + timedelta(hours=2), 1, "click", 1.0, "{}"),
        ]
        _write_events(os.path.join(in_dir, "a.parquet"), rows)
        out = sessionize_stateful(stream_events(spark, in_dir), gap_seconds=1800)
        q = (
            out.writeStream.format("memory")
            .queryName("sessions_tz")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows_out = spark.sql("select * from sessions_tz").collect()
        assert len(rows_out) == 1 and rows_out[0]["n_events"] == 2
        # bounds survive the tz round-trip: 5-minute session
        delta = rows_out[0]["session_end"] - rows_out[0]["session_start"]
        assert delta.total_seconds() == 300
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def _write_docs(path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("text", pa.string()),
        ]
    )
    pq.write_table(pa.Table.from_pandas(df, schema=schema), path)


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Ingest-side exact dedup: a re-crawled document arriving within
    the watermark of its first occurrence is dropped on the SAME
    normalized-content key the batch exact_dedup collapses
    (case/whitespace variants included); distinct content passes. Two
    file drops across two query runs share dedup state through the
    checkpoint."""
    from llmaix_spark.streaming.windows import dedup_doc_stream, stream_docs

    in_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _write_docs(
        os.path.join(in_dir, "a.parquet"),
        [
            (1, T0, "hello world"),
            (2, T0 + timedelta(minutes=1), "other text"),
            (3, T0 + timedelta(minutes=2), "Hello   WORLD"),  # norm-dup of 1
        ],
    )

    def _run():
        q = (
            dedup_doc_stream(stream_docs(spark, in_dir))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run()
    got1 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {1, 2}
    # second drop, new query run: state survives via the checkpoint —
    # the re-crawl of doc 1's content is still inside the watermark
    _write_docs(
        os.path.join(in_dir, "b.parquet"),
        [
            (4, T0 + timedelta(minutes=3), "HELLO  world"),  # dup again
            (5, T0 + timedelta(minutes=4), "fresh content"),
        ],
    )
    _run()
    got2 = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got2 == {1, 2, 5}
