"""Event-time normalization shared by the streaming operators.

Parquet/JSON sources write event time either as TIMESTAMP (instant,
isAdjustedToUTC=true) or TIMESTAMP_NTZ (wall clock) depending on the
writer; Structured Streaming's watermark/window machinery only accepts
TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise). Every
watermark-carrying operator funnels through ``ensure_event_time`` so
either input type works; the engine pins the session timezone to UTC
(session.get_session), making the NTZ→instant cast exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

__all__ = ["ensure_event_time"]


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Cast ``ts_col`` to TIMESTAMP if it arrived as TIMESTAMP_NTZ."""
    field = df.schema[ts_col] if ts_col in df.columns else None
    if field is not None and isinstance(field.dataType, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df
