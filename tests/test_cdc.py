"""Snapshot diff + merge upsert (operators/cdc.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.operators.cdc import (
    merge_upsert,
    snapshot_diff,
)


@pytest.fixture()
def frames(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "id long, s string, v int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c2", 30), (4, "", 40), (5, "e", 50)],
        "id long, s string, v int",
    )
    return old, new


def test_snapshot_diff_classes(spark, frames):
    old, new = frames
    got = {r.id: r.change for r in snapshot_diff(old, new, ["id"]).collect()}
    # 1 removed, 2 unchanged (absent), 3 changed, 4 NULL->'' is a change,
    # 5 added
    assert got == {1: "removed", 3: "changed", 4: "changed", 5: "added"}


def test_snapshot_diff_subset_compare_cols(spark, frames):
    old, new = frames
    got = {
        r.id: r.change
        for r in snapshot_diff(old, new, ["id"], compare_cols=["v"]).collect()
    }
    # comparing only v: 3 and 4 are unchanged
    assert got == {1: "removed", 5: "added"}


def test_merge_upsert_updates_win(spark, frames):
    old, new = frames
    merged = merge_upsert(old, new, ["id"])
    rows = {r.id: (r.s, r.v) for r in merged.collect()}
    assert rows[1] == ("a", 10)      # untouched base survives
    assert rows[3] == ("c2", 30)     # update wins
    assert rows[5] == ("e", 50)      # insert
    assert len(rows) == 5


def test_merge_upsert_delete_missing(spark, frames):
    old, new = frames
    merged = merge_upsert(old, new, ["id"], delete_missing=True)
    assert sorted(r.id for r in merged.collect()) == [2, 3, 4, 5]


def test_merge_upsert_rejects_mismatched_columns(spark, frames):
    old, new = frames
    with pytest.raises(ValueError):
        merge_upsert(old, new.drop("v"), ["id"])


def test_diff_then_upsert_consistency(spark, frames):
    """Applying updates makes a re-diff report nothing but removals of
    keys absent from the update set."""
    old, new = frames
    merged = merge_upsert(old, new, ["id"])
    re_diff = {r.id: r.change for r in snapshot_diff(merged, new, ["id"]).collect()}
    assert re_diff == {1: "removed"}


def test_incremental_agg_merge_equals_full(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.cdc import (
        incremental_agg,
        merge_incremental_aggs,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (1, 2.5), (2, 7.0), (3, 1.0), (3, 1.0)],
        "k long, v double",
    )
    full = incremental_agg(df, ["k"], ["v"])
    merged = merge_incremental_aggs(
        [
            incremental_agg(df.filter("v > 2"), ["k"], ["v"]),
            incremental_agg(df.filter("v <= 2"), ["k"], ["v"]),
        ],
        ["k"],
    )
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, merged.collect()))


def test_merge_incremental_aggs_requires_parts(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.cdc import (
        merge_incremental_aggs,
    )

    try:
        merge_incremental_aggs([], ["k"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
