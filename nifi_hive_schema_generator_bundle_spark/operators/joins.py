"""Temporal join operators the reference lacks (SURVEY §2 "categories the
reference does NOT have" — joins): as-of join and time-range join,
expressed shuffle-lean for the 100 TB case.

Scale design notes:

* **asof_join** — NOT a join at all physically: both sides are tagged and
  unioned, then a single window pass per key carries the most recent
  right-side payload forward onto each left row. One shuffle (hash by
  key), one sort (by event time within key) — compare with the naive
  ``left.join(right, key).filter(r.ts <= l.ts)`` + argmax, which explodes
  to |left|×|right-per-key| intermediate rows before pruning. Skewed keys
  degrade to a big sort within one partition; mitigate upstream by
  salting the key and re-merging, or pre-filtering right to a time
  horizon.
* **range_join** — interval containment via bucketed equi-join: both
  sides are bucketed by ``time // bucket_width`` (intervals explode to
  every bucket they overlap), so Catalyst executes an equi-join on the
  bucket id instead of a cartesian BroadcastNestedLoopJoin. Bucket width
  should approximate the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join", "interval_join", "coalesce_intervals"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    tolerance: Column | None = None,
    prefix: str = "",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right[right_time] <= left[left_time]`` and the same ``on`` key
    (left-outer semantics: unmatched left rows keep NULL payloads).

    Ties on ``right_time`` within a key resolve to the greatest payload
    struct (deterministic: max over (time, payload...)); a right row at
    exactly ``left_time`` DOES match, mirroring DuckDB/pandas
    ``ASOF JOIN`` / ``merge_asof`` with direction='backward'.

    ``tolerance``: optional max staleness (a Column interval/duration in
    the same unit as the time columns); matches older than
    ``left_time - tolerance`` are nulled out.
    """
    lcols = left.columns
    payload = F.struct(
        F.col(right_time).alias("__t"), *[F.col(c) for c in right_payload]
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )
    l = left.select(
        "*",
        F.col(on).alias("__k"),
        F.col(left_time).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    # right rows (__side=0) sort before left rows at equal timestamps, so
    # the running max at a left row includes same-instant right rows.
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.max("__payload").over(w)
    # window first, THEN drop the right-side rows — filtering first would
    # remove the very rows the carry-forward reads.
    out = merged.withColumn("__match", carried).filter(F.col("__side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "__match",
            F.when(
                F.col("__match.__t") >= F.col("__ts") - tolerance, F.col("__match")
            ),
        )
    sel = [F.col(c) for c in lcols] + [
        F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in right_payload
    ]
    return out.select(*sel)


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_time: str,
    right_start: str,
    right_end: str,
    bucket: Column,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Join left points to right intervals containing them
    (``start <= t < end``) via bucketed equi-join.

    ``bucket`` is a Column expression giving the bucket width in the time
    columns' native unit (e.g. ``F.lit(3600)`` for hourly buckets over
    epoch seconds). Right intervals are exploded to one row per bucket
    they overlap; left points map to exactly one bucket; the equi-join on
    bucket id replaces the otherwise-cartesian range join. AQE handles
    residual skew.
    """
    # floor (not cast) so negative coordinates tile at the documented
    # fixed width — cast truncates toward zero, which makes the
    # zero-straddling bucket double-width (results stay correct because
    # the exact residual predicate rides the join, but the skewed bucket
    # hurts); same rule as interval_join below
    lb = left.withColumn(
        "__b", F.floor(F.col(left_time) / bucket).cast("long")
    )
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / bucket).cast("long"),
                F.floor(F.col(right_end) / bucket).cast("long"),
            )
        ),
    )
    cond = (
        (F.col(left_time) >= F.col(right_start))
        & (F.col(left_time) < F.col(right_end))
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    return lb.join(rb, on="__b").filter(cond).drop("__b")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket: Column,
    closed: bool = False,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Overlap-join two INTERVAL sets (interval × interval, the sibling of
    ``range_join``'s point × interval): emit one row per (left, right)
    pair whose intervals overlap — half-open ``[s, e)`` semantics by
    default (``l_start < r_end AND r_start < l_end``), or closed
    ``[s, e]`` with ``closed=True`` (``<=`` on both comparisons). The
    session-vs-campaign / downtime-vs-deploy / stay-vs-promotion shape
    that a plain equi-join cannot express.

    Physical plan: both sides explode to the fixed-width tiles
    (``floor(t / bucket)``) their interval covers, and the would-be
    cartesian inequality join becomes an equi-join on the tile id plus a
    residual overlap filter. A pair overlapping across k shared tiles
    would match k times, so each pair is CLAIMED exactly once, by the
    first tile the two intervals share — ``tile ==
    greatest(floor(l_start/b), floor(r_start/b))`` — the standard
    tile-dedup rule; no downstream ``distinct`` (and hence no extra
    shuffle) is needed.

    At scale: shuffle volume is rows × tiles-per-interval, so pick
    ``bucket`` near the MEDIAN interval length (a long-tail interval
    costs its own length/bucket tiles, nothing more). Both sides
    partition by tile id, so co-located tiles join locally; AQE handles
    tile skew (hot hours) and broadcasts a small dim side outright.
    """
    # floor (not cast) so negative coordinates — pre-1970 epoch micros —
    # tile at the documented fixed width; cast truncates toward zero,
    # which doubles the zero-straddling bucket (correct but skew-prone)
    b = bucket
    lb = left.withColumn(
        "__lsb", F.floor(F.col(left_start) / b).cast("long")
    ).withColumn("__b", F.explode(F.sequence(
        F.col("__lsb"), F.floor(F.col(left_end) / b).cast("long")
    )))
    rb = right.withColumn(
        "__rsb", F.floor(F.col(right_start) / b).cast("long")
    ).withColumn("__b", F.explode(F.sequence(
        F.col("__rsb"), F.floor(F.col(right_end) / b).cast("long")
    )))
    if closed:
        cond = (F.col(left_start) <= F.col(right_end)) & (
            F.col(right_start) <= F.col(left_end)
        )
    else:
        cond = (F.col(left_start) < F.col(right_end)) & (
            F.col(right_start) < F.col(left_end)
        )
    # first-shared-tile claim: exactly one of the k shared tiles keeps
    # the pair, so no distinct pass
    cond = cond & (F.col("__b") == F.greatest(F.col("__lsb"), F.col("__rsb")))
    if extra_cond is not None:
        cond = cond & extra_cond
    return (
        lb.join(rb, on="__b")
        .filter(cond)
        .drop("__b", "__lsb", "__rsb")
    )


def coalesce_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    *,
    touching_merge: bool = True,
) -> DataFrame:
    """Merge overlapping intervals per key — the gaps-and-islands
    primitive (user activity spans from per-event windows, campaign
    flight consolidation, on-call coverage). Returns one row per
    merged island: (key, ``start_col`` = min start, ``end_col`` = max
    end, n_merged).

    Island detection is the classic prefix trick: within each key
    ordered by (start, end), an interval opens a NEW island iff its
    start exceeds the running max end of every EARLIER interval (an
    interval can be swallowed by a predecessor that is not its
    immediate neighbor, so ``lag(end)`` alone is wrong — the running
    max is the correct witness). ``touching_merge``: [1,2] and [2,3]
    merge when True (closed-interval reading), stay separate when
    False (half-open reading). NULL keys/bounds are dropped.

    Scale: ONE window over (key, start, end) — a single shuffle on the
    key — then a map-side-combinable island aggregate. No join, no
    self-comparison; per-key skew is the window sort, same profile as
    sessionize."""
    pts = df.select(
        F.col(key_col), F.col(start_col), F.col(end_col)
    ).na.drop()
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = (
        F.col(start_col) > prev_max
        if touching_merge
        else F.col(start_col) >= prev_max
    )
    flagged = pts.withColumn(
        "__new", F.when(prev_max.isNull() | opens, 1).otherwise(0)
    ).withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy(key_col, "__island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("__island")
    )
