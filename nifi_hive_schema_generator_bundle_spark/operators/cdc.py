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

__all__ = ["snapshot_diff", "merge_upsert"]

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
