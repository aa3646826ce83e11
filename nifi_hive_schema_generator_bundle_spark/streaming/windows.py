"""Streaming aggregations with event-time windows + watermarks — the
north-star streaming surface beyond the reference's per-trigger model.

``windowed_event_counts`` is the continuous twin of the batch
``event_type_daily_counts`` query; at scale the state store holds one row
per (window × event_type), watermarking bounds state for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._time import ensure_event_time

__all__ = ["windowed_event_counts", "sessionize_stream"]


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts per key with a late-data watermark;
    pass ``slide`` (< window) for overlapping sliding windows — each
    event then lands in window/slide windows, the standard
    "10-minute counts refreshed every minute" dashboard shape (state
    grows by the same factor; the watermark still bounds it).

    Works on both batch and streaming DataFrames (same plan; streaming
    adds the state store)."""
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        ensure_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias(
                "total_value"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "total_value",
        )
    )


def sessionize_stream(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows (dynamic gap-based) per user — Spark's native
    ``session_window`` keeps this fully stateful-JVM-side (no
    applyInPandasWithState needed for gap semantics)."""
    return (
        ensure_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )
