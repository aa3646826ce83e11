"""Partition diagnostics (partition_stats/skew_ratio) and idempotent
dynamic-partition overwrite (sources/formats.overwrite_partitions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.functions.partitioning import (
    partition_stats,
    skew_ratio,
)
from nifi_hive_schema_generator_bundle_spark.sources.formats import (
    overwrite_partitions,
)


def test_partition_stats_counts_every_row(spark):
    df = spark.range(1000).repartition(8)
    stats = partition_stats(df).collect()
    assert sum(r.n_rows for r in stats) == 1000
    assert len(stats) <= 8


def test_skew_ratio_flags_single_hot_key(spark):
    even = spark.range(1000).repartition(8, "id")
    hot = spark.range(1000).withColumn("k", F.lit(1)).repartition(8, "k")
    assert skew_ratio(even) < 3.0
    assert skew_ratio(hot) >= 7.0  # everything lands in one partition


def test_skew_ratio_empty_frame(spark):
    assert skew_ratio(spark.range(0)) == 1.0


def test_overwrite_partitions_touches_only_written_days(spark, tmp_path):
    out = str(tmp_path / "t")
    d1 = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-02", 2)], "day string, v int"
    )
    overwrite_partitions(d1, out, ["day"])
    # rewrite day 2 only, with a new value
    d2 = spark.createDataFrame([("2024-01-02", 99)], "day string, v int")
    overwrite_partitions(d2, out, ["day"])
    def read_back():
        # partition-dir values are type-inferred (date here); compare as str
        return {
            (str(r.day), r.v)
            for r in spark.read.parquet(out)
            .select(F.col("day").cast("string").alias("day"), "v")
            .collect()
        }

    got = read_back()
    # day 1 intact, day 2 replaced (static overwrite would have dropped day 1)
    assert got == {("2024-01-01", 1), ("2024-01-02", 99)}
    # idempotency: re-running the same day changes nothing
    overwrite_partitions(d2, out, ["day"])
    assert read_back() == got


def test_overwrite_partitions_rejects_unknown_format(spark, tmp_path):
    df = spark.createDataFrame([("a", 1)], "day string, v int")
    with pytest.raises(ValueError):
        overwrite_partitions(df, str(tmp_path / "x"), ["day"], fmt="xml")
