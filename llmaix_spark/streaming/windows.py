"""Event-time streaming aggregations over the events stream.

Beyond the reference (batch-only): tumbling-window counts with a
watermark for late data, and a custom stateful sessionizer via
applyInPandasWithState — the streaming twin of the batch lag()-based
sessionization in plans/queries.q_events_sessionize.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time window counts per event_type with a watermark
    bounding state for late data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def stream_docs(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(input_dir)


def dedup_doc_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup on the normalized content hash with
    WATERMARK-BOUNDED state — the ingest-side twin of the batch
    `dedup.exact_dedup` (a 100 TB firehose re-crawls the same pages
    continuously; deduping at ingest keeps the at-rest table clean
    instead of re-sweeping it):

      * first occurrence of a content hash passes through; duplicates
        arriving within `watermark` of event time are DROPPED inside
        the stateful operator (`dropDuplicatesWithinWatermark` — plain
        streaming dropDuplicates keeps every key forever, an unbounded
        state table at crawl scale; the watermark variant evicts hash
        state once event time passes it, so state is bounded by
        ingest-rate × window, not corpus size);
      * duplicates farther apart than the watermark are NOT caught
        here — that is the periodic batch dedup's job over the at-rest
        table (same division of labor as linking: streaming handles
        the hot window, batch the global sweep).

    The content key reuses `_norm_text` + an 8-byte hash, so what this
    operator drops is exactly what the batch exact_dedup would
    collapse."""
    from llmaix_spark.operators.dedup import _norm_text
    from llmaix_spark.operators.linking import stable_hash60_expr

    keyed = docs.withColumn(
        "_h", stable_hash60_expr(_norm_text(F.col(text_col)))
    )
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stateful(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful operator: per-user session assembly with
    processing-timeout-free event-time gap logic. State = the open
    session; a session closes (and is emitted) when an event arrives more
    than `gap_seconds` after the previous one, or when the group times
    out past the watermark."""

    # applyInPandasWithState hands the UDF SESSION-TZ-naive timestamps,
    # but GroupState event-time timeouts compare against the UTC
    # watermark — extracting epoch ms without localizing first skews the
    # timeout by the tz offset (and west of UTC, setTimeoutTimestamp can
    # land BEFORE the watermark, which kills the query). Capture the tz
    # at plan time and convert to true UTC epoch inside the UDF.
    session_tz = events.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    )

    def _utc_ms(series: pd.Series) -> list[int]:
        s = pd.to_datetime(series)
        s = (
            s.dt.tz_localize(session_tz) if s.dt.tz is None else s
        ).dt.tz_convert("UTC")
        return [int(t.value // 1_000_000) for t in s]

    def _ts(ms: int) -> pd.Timestamp:
        # tz-aware UTC out: Arrow then converts correctly regardless of
        # the session timezone (a naive Timestamp would be re-read as
        # session-local, shifting the emitted session bounds)
        return pd.Timestamp(ms, unit="ms", tz="UTC")

    gap_ms = gap_seconds * 1000

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [_ts(start_ms)],
                    "session_end": [_ts(last_ms)],
                    "n_events": [n],
                }
            )
            return
        ts_ms: list[int] = []
        for pdf in pdfs:
            ts_ms.extend(_utc_ms(pdf["ts"]))
        ts_ms.sort()
        if state.exists:
            start_ms, last_ms, n = state.get
        else:
            start_ms, last_ms, n = ts_ms[0], ts_ms[0], 0
        closed = []
        for t in ts_ms:
            # cross-batch out-of-order events (late but above the
            # watermark) may precede the open session: extending must
            # never move last_ms BACKWARDS (that inverted session bounds
            # and split sessions whose pairwise gaps were all in range)
            if t < start_ms:
                if start_ms - t > gap_ms:
                    closed.append((t, t, 1))  # too early to merge
                else:
                    start_ms = t
                    n += 1
            elif t <= last_ms:
                n += 1  # inside the open window
            elif t - last_ms > gap_ms:
                closed.append((start_ms, last_ms, n))
                start_ms, last_ms, n = t, t, 1
            else:
                last_ms = t
                n += 1
        state.update((start_ms, last_ms, n))
        state.setTimeoutTimestamp(last_ms + gap_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [_ts(s) for s, _e, _n in closed],
                    "session_end": [_ts(e) for _s, e, _n in closed],
                    "n_events": [n_ for _s, _e, n_ in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
