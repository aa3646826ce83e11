"""Snapshot diff and merge-upsert — change-data capture without a table
format.

Training-data pipelines re-crawl and re-score corpora continuously; the
question "what changed since the last snapshot" and the follow-up
"apply these changes to the base table" are the two primitives a
lakehouse MERGE INTO provides. On plain parquet they are a full-outer
join keyed on the stable id plus a content hash — everything JVM-side,
one shuffle on the key, no Python, no per-row comparisons of wide
columns (the md5 collapses arbitrarily many compare columns into 16
bytes before the join output is materialized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "snapshot_diff",
    "merge_upsert",
    "scd2_build",
    "incremental_agg",
    "merge_incremental_aggs",
]

# distinct from any real value, incl. empty string, so NULL != ''
_NULL_SENTINEL = "\x00<null>\x00"


def _row_hash(cols: list[str]) -> F.Column:
    return F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL)) for c in cols]
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    *,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every key as added / removed / changed between two
    snapshots; unchanged rows are dropped (at 100 TB they're the bulk,
    and they are exactly the rows nobody wants back).

    Returns ``key_cols + (change string)``. ``compare_cols`` defaults
    to every non-key column the frames share."""
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    o = old.select(*key_cols, _row_hash(compare_cols).alias("__oh"))
    n = new.select(*key_cols, _row_hash(compare_cols).alias("__nh"))
    joined = o.join(n, on=key_cols, how="full_outer")
    change = (
        F.when(F.col("__oh").isNull(), F.lit("added"))
        .when(F.col("__nh").isNull(), F.lit("removed"))
        .when(F.col("__oh") != F.col("__nh"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    *,
    delete_missing: bool = False,
) -> DataFrame:
    """MERGE INTO semantics as a DataFrame: rows from ``updates`` win on
    key collision, base rows without an update survive (unless
    ``delete_missing`` — then the updates frame is the full new truth
    and missing keys are deletes). One anti-join shuffle; columns must
    match. Write the result via ``sources.formats.overwrite_partitions``
    for an idempotent partition-level apply."""
    if set(base.columns) != set(updates.columns):
        raise ValueError("merge_upsert requires identical column sets")
    if delete_missing:
        return updates
    kept = base.join(updates.select(*key_cols), on=key_cols, how="left_anti")
    return kept.unionByName(updates)


def scd2_build(
    df: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    *,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Build a slowly-changing-dimension type-2 history from a change
    feed: one versioned row per (key, attribute-state) run, with
    ``valid_from`` / ``valid_to`` half-open validity and an
    ``is_current`` flag on the open row — the warehouse primitive for
    "what did this dimension look like at time T".

    Consecutive feed rows with identical attributes collapse into one
    version (null-safe comparison via the same sentinel hash as
    ``snapshot_diff``); a version's ``valid_to`` is the next version's
    ``valid_from`` (NULL for the current one). ``tiebreak_col`` orders
    same-timestamp rows deterministically (later tiebreak wins the
    instant).

    Plan shape: two windows over the SAME (key, ts, tiebreak)
    partitioning — Catalyst plans one Exchange + one Sort and reuses
    them for both the change detection and the valid_to lead. Rows
    carry (key, attrs, ts): no document-scale payloads, so the single
    shuffle is keyed on the dimension key and the shape holds at any
    fact-table scale.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    h = _row_hash(attr_cols)
    changed = (
        df.select(key_col, *attr_cols, ts_col, *( [tiebreak_col] if tiebreak_col else [] ))
        .withColumn("__h", h)
        .withColumn("__prev", F.lag("__h").over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("__h")))
    )
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return changed.select(
        F.col(key_col),
        *[F.col(c) for c in attr_cols],
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def incremental_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    *,
    dec: str = "decimal(18,2)",
) -> DataFrame:
    """Build the mergeable partial-aggregate shape for a keyed rollup:
    (keys..., n_rows, sum_<c>...) with sums in DECIMAL so merging is
    exact and order-independent. This is the unit a materialized
    rollup stores per batch/partition."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(F.col(c).cast(dec)).alias(f"sum_{c}") for c in sum_cols],
    )


def merge_incremental_aggs(parts: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge partial aggregates produced by ``incremental_agg`` — the
    materialized-view refresh primitive: yesterday's rollup + today's
    delta rollup = today's full rollup, WITHOUT rescanning history.
    Count/sum (and any algebraic aggregate stored as its partials)
    merge by key-wise summation; the whole refresh costs one shuffle
    of rollup-sized tables, never the base data. Averages derive as
    sum/count downstream; non-algebraic aggregates (exact distinct,
    median) need their own mergeable representations (see
    ``functions/timeseries.daily_distinct_sketches`` for the distinct
    case).
    """
    if not parts:
        raise ValueError("nothing to merge")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    val_cols = [c for c in u.columns if c not in keys]
    return u.groupBy(*keys).agg(
        *[F.sum(F.col(c)).alias(c) for c in val_cols]
    )
