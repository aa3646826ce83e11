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
from pyspark.sql import functions as F

__all__ = [
    "ensure_min_partitions",
    "salted_join",
    "partition_stats",
    "skew_ratio",
    "zorder_key",
    "distributed_rank",
]


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` partitions (default: the
    session's default parallelism) iff it currently has fewer. Narrow
    inputs only — do not use after a wide transform whose partitioning
    you want to keep."""
    if df.isStreaming:
        return df  # .rdd is illegal on streaming frames; the micro-batch
        # source controls split count there
    sc = df.sparkSession.sparkContext
    want = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)


def salted_join(
    big,
    small,
    on: str | list[str],
    *,
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
):
    """Skew-resistant equi-join: the big side gets a random salt in
    ``[0, n_salts)``, the small side is exploded to every salt value, and
    the join key becomes ``(on..., salt)`` — a single hot key now spreads
    over ``n_salts`` reducers.

    Use when AQE's skew-join can't help (it only splits sort-merge
    partitions, and only when statistics surface the skew — e.g. not
    under a downstream co-partitioning requirement). Cost: the small side
    is shuffled/broadcast ``n_salts``× — keep it the dimension side.
    ``how`` supports inner/left (the salted-small side must stay
    complete for right/full semantics — not offered).
    """
    from pyspark.sql import functions as F

    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    keys = [on] if isinstance(on, str) else list(on)
    bg = big.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    sm = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = bg.join(sm, keys + ["__salt"], how)
    return out.drop("__salt")


def partition_stats(df: DataFrame) -> DataFrame:
    """Rows per physical partition: (partition_id, n_rows) — the skew
    diagnostic. One narrow pass + a tiny aggregate; run it on a stage's
    input when a straggler task shows up before reaching for salting."""
    return (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy(F.col("__pid").alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("partition_id")
    )


def skew_ratio(df: DataFrame) -> float:
    """max/mean rows across partitions (1.0 = perfectly even). Driver-
    side scalar; the decision input for salted_join vs plain join."""
    rows = partition_stats(df).collect()
    if not rows:
        return 1.0
    counts = [r.n_rows for r in rows]
    # mean over ALL partitions, not just non-empty ones — a single hot
    # partition among empties IS the skew case being measured
    n_part = max(df.rdd.getNumPartitions(), len(counts), 1)
    return max(counts) / (sum(counts) / n_part)


def zorder_key(cols: list[str], *, bits: int = 16) -> "F.Column":
    """Interleaved-bit (Morton/Z-order) sort key over integer columns.

    Sorting or range-partitioning by this key clusters rows that are
    close in EVERY listed dimension into the same files, so per-file
    min/max statistics prune multi-dimensional predicates — the
    data-skipping trick single-column sorting can't give you. Columns
    must already be non-negative ints in a bounded domain (rank or
    bucket them first); ``bits`` per dimension caps the key at
    ``bits*len(cols)`` bits (≤ 63 total for a long).

    Pure bit arithmetic in JVM expressions — scales as a narrow
    projection."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a signed long")
    key = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def distributed_rank(df: DataFrame, order, out_col: str) -> DataFrame:
    """Exact global row_number over ``order`` WITHOUT a single-partition
    window — the scalable substitute for `row_number().over(
    Window.orderBy(...))` / global ntile (the concentration_report
    prefix-sum pattern, extracted):

    range-repartition by the order columns, per-partition row_number,
    then fold in per-partition row-count offsets via a broadcast of the
    |partitions|-row offset table (whose own cumulative sum is a
    bounded single-partition window over |partitions| rows — the
    scalar-state exemption).

    ``order`` must be a TOTAL order (carry a unique tiebreak) or ranks
    are nondeterministic. Range boundaries come from sampling and may
    vary run to run; the resulting rank does NOT — it is a pure
    function of the total order (offsets are computed from the actual
    partitions). Output: ``df`` + ``out_col`` (long, 1-based).
    """
    from pyspark.sql import Window

    nparts = max(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")),
        1,
    )
    part = df.repartitionByRange(nparts, *order).withColumn(
        "__dr_pid", F.spark_partition_id()
    )
    per = part.groupBy("__dr_pid").agg(F.count(F.lit(1)).alias("__dr_c"))
    w_off = Window.orderBy("__dr_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per.select(
        "__dr_pid",
        F.coalesce(F.sum("__dr_c").over(w_off), F.lit(0)).alias("__dr_off"),
    )
    wp = Window.partitionBy("__dr_pid").orderBy(*order)
    return (
        part.join(F.broadcast(offsets), "__dr_pid")
        .withColumn(
            out_col,
            (F.row_number().over(wp) + F.col("__dr_off")).cast("long"),
        )
        .drop("__dr_pid", "__dr_off")
    )
