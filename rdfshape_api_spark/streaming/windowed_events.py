"""Structured-Streaming windowed aggregations with late-data handling.

The reference's streaming surface is per-item validation (comet,
``CometTransformations.scala:115-141``); a training-data pipeline at scale
additionally needs event-time analytics over unbounded streams.  Two
canonical shapes, both pure built-in operators (no Python in the stream):

* :func:`windowed_event_counts` — tumbling/sliding event-time windows +
  watermark: late rows inside the watermark still update their window,
  rows older than the watermark are dropped and the window's state is
  evicted (bounded state at any stream length — the 100 TB/unbounded
  requirement);
* :func:`sessionize_stream` — native ``session_window`` gap sessions,
  the streaming twin of ``functions.textops.sessionize`` (batch, two
  windows over one shuffle).

Both return un-started streaming DataFrames: callers pick sink/output
mode (append emits only watermark-finalized windows; update re-emits
growing ones).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    events: DataFrame,
    window_minutes: int = 60,
    slide_minutes: int | None = None,
    watermark_minutes: int = 120,
) -> DataFrame:
    """Event-time windowed counts per event type with a watermark.

    State bound: at most ``(watermark + window) / slide`` windows per
    type are live; everything older is finalized and evicted — the only
    streaming-agg design that survives an unbounded stream.
    """
    win = (
        F.window(
            "ts", f"{window_minutes} minutes", f"{slide_minutes} minutes"
        )
        if slide_minutes
        else F.window("ts", f"{window_minutes} minutes")
    )
    return (
        events.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_minutes: int = 120,
) -> DataFrame:
    """Gap-based sessions per user over an unbounded stream: native
    ``session_window`` (dynamic-length windows that merge as events
    arrive) + watermark for state eviction."""
    return (
        events.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("sw"),
            "user_id",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
