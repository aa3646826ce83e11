"""Count-min sketch: bounded-state frequency estimation.

The mergeable-sketch companion to the HLL distinct-count store
(`functions/timeseries.py`): where HLL answers "how many distinct
keys", count-min answers "how often does key k occur" in O(depth ×
width) state regardless of key cardinality — the structure behind
heavy-hitter monitoring over unbounded token streams.

Determinism and portability: bucket ``r`` for a key is the first 8 md5
hex chars of ``"r:key"`` taken mod ``width`` — the same md5 convention
as `functions/sampling.hash_fraction`, so DuckDB replays the entire
grid bit-for-bit (``CAST(concat('0x', substring(md5(...), 1, 8)) AS
BIGINT) % width``) and the estimates are value-hash checkable, unlike
typical seeded sketches.

Spark shape: building the grid is ONE aggregation over keys × depth
whose output cardinality is capped at depth × width rows — map-side
combine collapses each task's partials to the same cap, so at 100 TB
the shuffle carries ≤ tasks × depth × width tiny rows no matter how
many tokens flow in. The grid is **linear**: grids built on disjoint
slices merge by per-cell addition into exactly the whole-corpus grid
(`cms_merge`), which is what makes it a cross-day / cross-run
accumulator. Estimates: ``est(k) = min_r grid[r][bucket_r(k)]`` — an
upper bound on the true count, within ``(e/width) · N`` of it with
probability ``1 − e^−depth`` (Cormode & Muthukrishnan 2005).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.partitioning import ensure_min_partitions

__all__ = [
    "cms_build",
    "cms_merge",
    "cms_lookup",
    "cms_join_size_estimate",
]


def _bucket(key: Column, row: Column, width: int) -> Column:
    """md5-derived bucket of ``key`` in hash row ``row`` — engine-portable."""
    h = F.md5(F.concat(row.cast("string"), F.lit(":"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).cast(
        "int"
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """(hash_row, bucket, cnt) grid counting ``key_col`` occurrences
    (or summing ``weight_col``). NULL keys are skipped. Output ≤
    depth × width rows; the aggregation is map-side combinable to the
    same cap per task."""
    # fan the narrow (key, weight) rows out to the session's parallelism
    # BEFORE the depth-way explode + per-row md5 bucketing (r9, guide
    # §2.5 input parallelism): the grid build is compute-bound on the
    # md5 chain, and a compact parquet scan yields only a handful of
    # input splits — measured at sf0.1 the lineitem grid ran its 2.4 M
    # md5 rows on 3 of 32 cores (2.6 s; ~0.9 s fanned out). The shuffle
    # this buys moves only 9-16 bytes/row.
    rows = ensure_min_partitions(
        df.filter(F.col(key_col).isNotNull()).select(
            F.col(key_col).alias("__k"),
            (
                F.col(weight_col).cast("long") if weight_col else F.lit(1)
            ).alias("__w"),
        )
    )
    fanned = rows.select(
        "__k",
        "__w",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("hash_row"),
    )
    return (
        fanned.select(
            "hash_row",
            _bucket(F.col("__k"), F.col("hash_row"), width).alias("bucket"),
            "__w",
        )
        .groupBy("hash_row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*grids: DataFrame) -> DataFrame:
    """Per-cell sum of grids built with identical depth/width — the
    linearity that makes the sketch an incremental accumulator:
    ``cms_build(a ∪ b) == cms_merge(cms_build(a), cms_build(b))``."""
    if not grids:
        raise ValueError("cms_merge needs at least one grid")
    u = grids[0]
    for g in grids[1:]:
        u = u.unionByName(g)
    return u.groupBy("hash_row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    grid: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """``keys`` + ``est_count`` = min over hash rows of the key's cell
    (0 if a cell is empty — the key was never counted there). depth/
    width must match the build. The grid side is ≤ depth × width rows,
    so the join broadcasts; nothing about the key table shuffles."""
    fanned = keys.select(
        key_col,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("hash_row"),
    ).withColumn("bucket", _bucket(F.col(key_col), F.col("hash_row"), width))
    probed = fanned.join(F.broadcast(grid), ["hash_row", "bucket"], "left")
    est = probed.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
    )
    return keys.join(est, key_col, "left").withColumn(
        "est_count", F.coalesce("est_count", F.lit(0))
    )


def cms_join_size_estimate(
    grid_a: DataFrame, grid_b: DataFrame, *, depth: int | None = None
) -> DataFrame:
    """1-row estimate of ``|A ⋈_k B|`` from the two sides' CMS grids:
    ``min_r Σ_b gridA[r][b] · gridB[r][b]`` (the CMS inner product —
    Cormode & Muthukrishnan's join-size application). Each hash row's
    inner product overestimates the true join size (colliding keys
    multiply); the min over rows tightens it. The whole estimate costs
    one equi-join of two ≤ depth × width tables — no scan of either
    input — which is what query planners want cardinality estimates
    for. Returns (est_join_size BIGINT). ``depth`` is only a sanity
    check that both grids cover the same hash rows."""
    b = grid_b.select(
        F.col("hash_row"),
        F.col("bucket"),
        F.col("cnt").alias("__cnt_b"),
    )
    prods = grid_a.join(b, ["hash_row", "bucket"]).select(
        "hash_row", (F.col("cnt") * F.col("__cnt_b")).alias("__p")
    )
    per_row = prods.groupBy("hash_row").agg(F.sum("__p").alias("__ip"))
    if depth is not None:
        # a hash row missing from the product table means one side had
        # no keys at all in that row — the inner product there is 0
        rows = per_row.sparkSession.range(depth).select(
            F.col("id").cast("int").alias("hash_row")
        )
        per_row = rows.join(per_row, "hash_row", "left").fillna(
            0, subset=["__ip"]
        )
    return per_row.agg(F.min("__ip").cast("long").alias("est_join_size"))
