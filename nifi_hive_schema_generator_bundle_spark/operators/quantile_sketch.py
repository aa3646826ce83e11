"""Mergeable log-bucket quantile sketch (the DDSketch idea, made
engine-portable).

DDSketch (Masson, Rim & Lee, VLDB 2019) buckets positive values by
``⌈log_γ x⌉`` so every quantile answer has bounded RELATIVE error
(γ−1)/(γ+1), and the sketch is a bucket→count map that merges by
addition — the property that matters at 100 TB: per-partition
histograms combine map-side into one ≤B-row table per group no matter
how many rows flow in, unlike exact percentiles (full sort) or
Greenwald–Khanna (merge-order-dependent state).

Portability twist: the textbook bucket function calls ``log`` per row,
and cross-engine libm is not bit-reproducible — a value landing a ULP
from a bucket boundary would flip buckets between engines and break
hash verification. So the boundaries are computed ONCE on the driver
(`log_bucket_boundaries`) and shipped as float literals to both the
engine and its SQL twin; the per-row bucket index is then a pure
COMPARISON fold (count of boundaries ≤ x) — exact in any engine, and
still O(B) JVM work per row with no shuffle implications. (At B ≈ 100
a comparison fold beats per-row log+floor disagreement; a cluster
deployment chasing the constant can binary-search the same literal
array — semantics identical.)

Quantile read-out: nearest-rank r = ⌈q·n⌉ over the per-group cumulative
counts, answered with the bucket's geometric-midpoint LITERAL — so the
reported estimate is itself a shared literal, hash-safe by
construction. Everything the sketch emits is exact integers + shared
literals; no in-engine float op touches data at all.

Reference parity note: no quantiles exist in the reference bundle
(CreateHQL.scala); this is extension surface (SURVEY.md §2) — the
bounded-state sibling of `operators/sketches.cms_build` for the
"latency/price distribution per group over an unbounded stream"
telemetry question.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "log_bucket_boundaries",
    "bucket_midpoints",
    "log_bucket_histogram",
    "histogram_merge",
    "histogram_quantiles",
]


def log_bucket_boundaries(
    lo: float, hi: float, gamma: float
) -> list[float]:
    """Geometric boundaries lo·γ^i covering [lo, hi] — computed once,
    driver-side, so both engines compare against identical literals.
    Bucket i (0-based) is: 0 → x < lo; i in 1..B−1 → [b_{i−1}, b_i);
    B → x ≥ b_{B−1}. Relative error of the midpoint answer within the
    covered range is ≤ (γ−1)/(γ+1)."""
    if not (lo > 0 and hi > lo and gamma > 1):
        raise ValueError("need 0 < lo < hi and gamma > 1")
    bounds = [lo]
    while bounds[-1] < hi:
        bounds.append(bounds[-1] * gamma)
    return bounds


def bucket_midpoints(boundaries: list[float]) -> list[float]:
    """Representative value per bucket index 0..B: clamped endpoints
    outside the covered range, geometric means inside."""
    mids = [boundaries[0]]
    for a, b in zip(boundaries, boundaries[1:]):
        mids.append(math.sqrt(a * b))
    mids.append(boundaries[-1])
    return mids


def _bucket_index(val: Column, boundaries: list[float]) -> Column:
    """Count of boundaries ≤ val — bit-exact in every engine (no log,
    no floor, no float produced).

    For the usual strictly-increasing boundary list the count equals a
    binary search, emitted as a balanced nested-WHEN tree: ~log2(B)
    codegen'd double comparisons per row instead of a B-step
    interpreted higher-order fold (HOFs don't codegen; at the γ=1.05
    price envelope B=100, and the fold was the measured per-row hot
    loop of the ddsketch entries — guide §4.1/§1.2 "per-task work").
    Identical values: with sorted boundaries, count(b ≤ v) IS the
    search index; a NaN val satisfies every ``>=`` on BOTH paths
    (Spark orders NaN above every double) → top bucket either way. A
    non-monotonic list (never produced by ``log_bucket_boundaries``)
    falls back to the literal fold."""
    if all(a < b for a, b in zip(boundaries, boundaries[1:])):

        def tree(lo: int, hi: int) -> Column:
            # invariant: boundaries[:lo] ≤ val < boundaries[hi:]
            if lo == hi:
                return F.lit(lo)
            mid = (lo + hi) // 2
            return F.when(
                val >= F.lit(boundaries[mid]), tree(mid + 1, hi)
            ).otherwise(tree(lo, mid))

        # NULL val must stay NULL (the fold's semantics: acc + NULL);
        # a bare WHEN tree would route NULL to bucket 0
        return F.when(val.isNull(), F.lit(None).cast("int")).otherwise(
            tree(0, len(boundaries))
        )
    barr = F.array(*[F.lit(b) for b in boundaries])
    return F.aggregate(
        barr,
        F.lit(0),
        lambda acc, b: acc + (val >= b).cast("int"),
    )


def log_bucket_histogram(
    df: DataFrame,
    val_col: str,
    group_cols: list[str],
    boundaries: list[float],
) -> DataFrame:
    """(group…, bucket, cnt) — the mergeable sketch state. One
    map-side-combinable aggregation; ≤ len(boundaries)+1 rows per
    group out of any input size. NULL values are skipped."""
    return (
        df.filter(F.col(val_col).isNotNull())
        .select(
            *group_cols,
            _bucket_index(F.col(val_col), boundaries).alias("bucket"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(*hists: DataFrame) -> DataFrame:
    """Per-bucket count addition — histograms over disjoint slices sum
    to exactly the whole-corpus histogram (same linearity as
    `sketches.cms_merge`)."""
    if not hists:
        raise ValueError("histogram_merge needs at least one histogram")
    u = hists[0]
    for h in hists[1:]:
        u = u.unionByName(h)
    keys = [c for c in u.columns if c != "cnt"]
    return u.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    boundaries: list[float],
    qs: list[float],
) -> DataFrame:
    """(group…, q, n, est) — nearest-rank quantiles answered from the
    sketch: r = ⌈q·n⌉, est = midpoint literal of the first bucket whose
    cumulative count reaches r. All post-sketch work runs on ≤ B rows
    per group."""
    from pyspark.sql import Window

    mids = bucket_midpoints(boundaries)
    marr = F.array(*[F.lit(x) for x in mids])
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*group_cols))
    )
    qdf = cum.select(
        *group_cols,
        "bucket",
        "cum",
        "n",
        F.explode(F.array(*[F.lit(q) for q in qs])).alias("q"),
    )
    rank = F.ceil(F.col("q") * F.col("n"))
    hit = qdf.filter(F.col("cum") >= rank)
    first = hit.groupBy(*group_cols, "q").agg(
        F.min("bucket").alias("bucket"), F.max("n").alias("n")
    )
    return first.select(
        *group_cols,
        "q",
        "n",
        F.element_at(marr, F.col("bucket") + 1).alias("est"),
    )
