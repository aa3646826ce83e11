"""Partition-layout helpers.

The CPU-heavy narrow operators (shingling, minhash/simhash signatures,
per-token scoring) inherit their parallelism from the input's split
count. That's correct on a real cluster reading TB-scale data (many file
splits), but a small file — one split — would serialize the whole
per-row pipeline onto one core. ``ensure_min_partitions`` is the guard:
a no-op when the scan is already well-split (the 100 TB case — no extra
shuffle), a round-robin repartition when it's underpartitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_min_partitions"]


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` partitions (default: the
    session's default parallelism) iff it currently has fewer. Narrow
    inputs only — do not use after a wide transform whose partitioning
    you want to keep."""
    sc = df.sparkSession.sparkContext
    want = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)
