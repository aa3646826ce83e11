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

__all__ = ["ensure_min_partitions", "salted_join"]


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
