"""Watermarked windowed rollups over event streams (late-data handling).

Batch/stream-unified: the same builder works on a static DataFrame (used by
the oracle-checked harness query) and on a stream with a watermark, where
late events beyond the watermark are dropped and windows finalize exactly
once (append mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_rollup(events: DataFrame, window_len: str = "1 hour",
                          watermark: str | None = None) -> DataFrame:
    """Tumbling-window counts + value sums per event_type. Pass `watermark`
    (e.g. '30 minutes') on streaming input to bound state and drop late data.
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window_len).alias("win"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("win.start").alias("window_start"), "event_type",
                "n", "sum_value")
    )


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (gap-based), batch or streaming."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("sess.start").alias("session_start"),
                F.col("sess.end").alias("session_end"),
                "user_id", "n_events", "sum_value")
    )
