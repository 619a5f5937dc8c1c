"""Structured-Streaming-ready event aggregations (Spark-side extension).

The reference has no streaming (SURVEY.md §2 'Streaming'); this module gives
the engine's windowed aggregations a form that runs identically on a batch
DataFrame and a `readStream` source: event-time tumbling/sliding windows via
`F.window`, with watermarking applied only when the input is streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding) window counts + value sums per event type.

    On a streaming DataFrame a watermark bounds state; on batch it is a no-op
    path (batch has no late data). Output schema is identical in both modes:
    (window_start, window_end, key, n_events, sum_value).
    """
    d = events
    if d.isStreaming:
        d = d.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide) if slide else F.window(
        F.col(ts_col), window_duration
    )
    out = (
        d.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key_col),
            "n_events",
            "sum_value",
        )
    )
    return out


def sessionize(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (gap-based). Streaming-safe via session_window."""
    d = events
    if d.isStreaming:
        d = d.withWatermark(ts_col, watermark)
    return (
        d.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(user_col),
            "n_events",
            "sum_value",
        )
    )
