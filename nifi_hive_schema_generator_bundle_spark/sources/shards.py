"""Training-shard exporter — the write side of the data pipeline.

``functions.sampling.shuffle_shards`` decides WHERE every row goes (a
deterministic, layout-independent md5 shuffle); this module turns that
assignment into the on-disk artifact a dataloader consumes: one
directory per shard (``shard=N/``, each written as a single file in
final shard order) plus a MANIFEST — per-shard row/token totals — that
training jobs use for sizing, resumption, and integrity checks.

Scale shape: the only data movement is the one repartition on the shard
key (each shard then sorts independently by its position column — no
global sort), and the manifest is a shard-keyed partial aggregate of
the same frame. Determinism: same corpus + key + seed + n_shards ⇒
byte-identical shard membership and order on any cluster layout, so a
re-export after a failure converges (mode="overwrite").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.sampling import shuffle_shards

__all__ = ["write_training_shards", "read_training_shards"]


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    key: str,
    n_shards: int,
    seed: str = "",
    token_col: str | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Shard ``df`` deterministically and write ``{path}/data`` +
    ``{path}/manifest``. Returns the manifest DataFrame:
    (shard, n_rows, n_tokens) — ``n_tokens`` NULL when ``token_col``
    is None. Rows keep all their columns plus ``shard``/``shard_pos``
    (the dataloader's resume cursor).

    One shuffle (repartition on the shard id) feeds both the
    partitioned write — one file per shard directory, rows in final
    shard order — and the manifest aggregate."""
    sharded = shuffle_shards(df, key, n_shards=n_shards, seed=seed)
    placed = sharded.repartition(n_shards, "shard").sortWithinPartitions(
        "shard", "shard_pos"
    )
    (
        placed.write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(f"{path}/data")
    )
    tokens = (
        F.sum(F.col(token_col)).alias("n_tokens")
        if token_col is not None
        else F.lit(None).cast("long").alias("n_tokens")
    )
    manifest = (
        sharded.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_rows"), tokens)
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").format(fmt).save(
        f"{path}/manifest"
    )
    return manifest


def read_training_shards(
    spark: SparkSession,
    path: str,
    *,
    shards: list[int] | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Read shards back (all, or a pruned subset — ``shard IN (…)`` is
    a static partition filter, so a dataloader resuming at shard k
    scans only that directory). Rows come back with their ``shard`` /
    ``shard_pos`` columns; order within a shard is restored by
    ``shard_pos`` (parquet row order is not contractual)."""
    out = spark.read.format(fmt).load(f"{path}/data")
    if shards is not None:
        out = out.filter(F.col("shard").isin([int(s) for s in shards]))
    return out
