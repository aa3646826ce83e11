"""Stream-stream joins and watermarked streaming deduplication.

The reference has no multi-input operators at all (SURVEY §2: single
FlowFile in, `HiveSchemaGenerator.scala:60-125`); these are the
Structured Streaming counterparts the north-star pipeline needs —
exactly-once event correlation (impression⋈click style) and at-ingest
dedup with bounded state.

State-size discipline is the whole design here: every input carries a
watermark, the join carries an event-time range condition, so the state
store evicts rows as the watermark passes instead of growing without
bound. A stream-stream join WITHOUT a time bound keeps every row
forever — at 100 TB/day that is an outage, not an operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._time import ensure_event_time

__all__ = ["dedup_stream", "interval_join_streams", "enrich_stream"]


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    *,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop duplicate records arriving within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps one state entry per key
    only until the watermark passes its event time — the at-scale
    contract: state is O(keys per horizon), not O(keys ever seen),
    which plain streaming ``dropDuplicates`` cannot promise. Duplicates
    separated by more than the horizon are exact-dedup's job downstream
    (operators/dedup.py), by design: ingest dedup absorbs retry storms,
    batch dedup owns history."""
    events = ensure_event_time(events, ts_col)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on a key where the right event happens in
    ``[left_ts, left_ts + within]`` — the impression→click attribution
    shape. Both watermarks plus the interval condition let Spark bound
    the join state on each side (late rows beyond watermark+within are
    evicted). Column names must not collide apart from ``on``; callers
    alias beforehand."""
    lw = ensure_event_time(left, left_ts).withWatermark(left_ts, left_watermark)
    rw = ensure_event_time(right, right_ts).withWatermark(right_ts, right_watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how).drop(rw[on])


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    *,
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static enrichment join — attach dimension attributes
    (user profile, experiment arm, domain metadata) to a stream as it
    flows. The static side is re-evaluated every micro-batch, so a
    file/table-backed dimension picks up out-of-band updates without
    restarting the query — the standard slowly-changing-dim serving
    pattern (pair with ``operators/cdc.scd2_build`` upstream to
    maintain the dimension itself).

    Stateless (no watermark, no state store): each batch is one
    ordinary join, broadcast by default because enrichment dims are
    the textbook small side — at 100 TB of stream the dim broadcast
    happens once per executor per batch, never a shuffle of the
    stream. Set ``broadcast=False`` for dims too big to broadcast
    (Spark then plans a shuffled join per batch; pre-bucket the dim
    on the key to keep that exchange one-sided).

    ``how`` is restricted to the stream-static-legal inner/left (the
    stream side must be preserved or Spark rejects the plan).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"stream-static enrichment must be inner/left, got {how!r}")
    d = F.broadcast(dim) if broadcast else dim
    return events.join(d, on, how)
