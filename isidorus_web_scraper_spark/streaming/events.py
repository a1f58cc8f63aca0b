"""Structured Streaming ingest over the events stream.

The reference itself needs no streaming engine — its SQS loop maps to
iterative batch rounds (SURVEY.md §2.10). This module covers the
streaming surface a crawl-adjacent pipeline does need: continuous event
ingest with event-time windows + late-data handling, and a custom
stateful operator (sessionization) via applyInPandasWithState.

Batch/stream parity: ``windowed_counts`` over a finite directory with
``trigger(availableNow)`` equals the batch ``events_tumbling_window``
driver query — pinned by tests/test_streaming.py.
"""

from __future__ import annotations

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


def read_event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream (one file per micro-batch in tests; on a real
    cluster this is the Kafka/queue-source drop-in)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def windowed_counts(events: DataFrame, lateness: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour event-time windows with a watermark for late
    data — the streaming twin of the batch events_tumbling_window."""
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame, lateness: str = "1 hour") -> DataFrame:
    """SLIDING event-time windows (size 2 h, slide 1 h): every event
    lands in size/slide = 2 overlapping windows. The third window shape
    (tumbling=windowed_counts, session=sessionized) — trending/rate
    metrics need overlap, and the state-size story changes: watermark
    eviction holds size/slide live panes per key instead of one."""
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_SESSION_OUT = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_SESSION_STATE = "start long, end long, n long"

_GAP_MS = 30 * 60 * 1000


def _sessionize(key, pdfs, state: GroupState):
    """Stateful per-user sessionization: events within a 30-min gap
    merge into one session; a longer gap closes the session and emits
    it. State carries (start_ms, end_ms, count)."""
    (user_id,) = key
    if state.exists:
        start, end, n = state.get
    else:
        start = end = n = None
    out = []
    for pdf in pdfs:
        for ts in sorted(pdf["ts"]):
            ms = int(ts.value // 1_000_000)
            if start is None:
                start, end, n = ms, ms, 1
            elif ms - end <= _GAP_MS:
                end, n = max(end, ms), n + 1
            else:
                out.append((user_id, start, end, n))
                start, end, n = ms, ms, 1
    if start is not None:
        state.update((start, end, n))
    yield pd.DataFrame(
        {
            "user_id": [r[0] for r in out],
            "session_start": [pd.Timestamp(r[1], unit="ms") for r in out],
            "session_end": [pd.Timestamp(r[2], unit="ms") for r in out],
            "n_events": [r[3] for r in out],
        }
    )


def sessionized(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    emits closed sessions; the open session rides in group state."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        _SESSION_OUT,
        _SESSION_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    events: DataFrame, keys: list[str] | None = None, lateness: str = "1 hour"
) -> DataFrame:
    """Streaming deduplication — the seen-set (S9/J2) in streaming
    form: first event per key wins, duplicates arriving within the
    watermark horizon are dropped, and state for keys older than the
    watermark is evicted (bounded state — the property that makes a
    streaming seen-set feasible at 10^10 keys where the batch path
    uses the sharded Bloom + anti-join)."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(keys)


def run_to_memory(
    df: DataFrame, name: str, checkpoint: str, mode: str = "complete"
):
    """Drain a finite stream into an in-memory table (tests/bench)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
