"""Streaming quantile accumulation — bounded-state latency/price/size
distributions over an unbounded stream.

Exact streaming quantiles need the whole value multiset; the log-bucket
histogram (`operators/quantile_sketch` — the DDSketch idea over
driver-literal boundaries) is the bounded alternative: each micro-batch
folds into ≤ B counts per group, and histogram **linearity** (per-bucket
addition) makes the store an accumulator across batches, runs, and
restarts — quantiles answered from the merged store are IDENTICAL to a
single-pass build over everything ever seen, not approximately so (the
approximation lives entirely in the fixed bucket width, which replay
order cannot change).

Replay safety follows `cms_stream.py`'s contract exactly: the store is
partitioned by ``batch_id``, each batch dynamic-partition-overwrites
ONLY its own delta partition (a crash-replay rewrites the same bytes
instead of double-counting), a batch id behind the store's max raises
(checkpoint reset against a live store), and ``compact_histogram_store``
collapses history partitions by per-bucket sums — estimates unchanged,
linearity again.

State: O(batches × groups × B) between compactions, O(groups × B)
after — never O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.quantile_sketch import (
    histogram_quantiles,
    log_bucket_histogram,
)
from ._store import (
    write_counted,
    durable_fold,
    finish_pending_fold,
    read_store,
    store_batch_ids_or_scan,
    store_max_batch_id,
)

__all__ = [
    "histogram_batch_update",
    "run_histogram_stream",
    "histogram_store",
    "histogram_store_quantiles",
    "compact_histogram_store",
]


# heal-then-read shared by every store module (hoisted round 7)
_read_store = read_store


def histogram_batch_update(
    batch_df: DataFrame,
    batch_id: int,
    *,
    store_dir: str,
    val_col: str,
    group_cols: list[str],
    boundaries: list[float],
) -> int:
    """Fold one micro-batch's histogram delta into the store; returns
    rows written. Reusable from any ``foreachBatch`` or batch loop with
    monotonic batch numbering."""
    spark = batch_df.sparkSession
    if batch_df.isEmpty():
        return 0
    # monotonic-id guard from partition DIRECTORY names (one FS LIST,
    # not a footer scan of every partition — the measured per-batch
    # drift source at high batch counts; see _store.store_max_batch_id)
    top = store_max_batch_id(spark, store_dir)
    if top is not None and batch_id < top:
        raise ValueError(
            f"batch_id {batch_id} is behind the store's max {top}: "
            "the streaming checkpoint was reset against an existing "
            "store. Resume with the original checkpoint or use a "
            "fresh store_dir."
        )
    delta = log_bucket_histogram(
        batch_df, val_col, group_cols, boundaries
    ).withColumn("batch_id", F.lit(batch_id))
    # the returned row count rides the write itself (r9: Dataset.observe
    # — one job, no cache block; the r8 persist+count+write protocol
    # paid a dedicated count job per batch). See _store.write_counted.
    return write_counted(delta, store_dir, ["batch_id"])


def run_histogram_stream(
    stream_df: DataFrame,
    *,
    store_dir: str,
    checkpoint_dir: str,
    val_col: str,
    group_cols: list[str],
    boundaries: list[float],
    compact_every: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the accumulation query: every micro-batch's histogram delta
    lands in its own store partition. ``compact_every=N`` folds the
    store's accumulated per-batch partitions every N batches (after
    the batch-id-N update commits its partition), bounding partition
    count for unbounded drains — the SCALE.md 30-batch sweeps price
    the cadence: ~10 for the sketch-grid stores, 50-100 for the dedup
    stores, where per-batch partials are larger and folds dearer. A
    crash between the fold and the checkpoint commit is safe: the
    replayed batch rewrites only its own (live, kept) partition, and
    the fold itself is crash-safe via the durable_fold commit marker."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        histogram_batch_update(
            batch_df,
            batch_id,
            store_dir=store_dir,
            val_col=val_col,
            group_cols=group_cols,
            boundaries=boundaries,
        )
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_histogram_store(
                batch_df.sparkSession, store_dir, group_cols
            )

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def histogram_store(
    spark, store_dir: str, group_cols: list[str], *, heal: bool = True
) -> DataFrame:
    """The whole-history histogram: per-bucket sum over every delta.
    ``heal=False`` makes the readout
    strictly read-only (no FS mutation; a pending fold is served as
    the consistent post-fold view — see ``_store.read_store``)."""
    store = _read_store(spark, store_dir, heal=heal)
    if store is None:
        raise FileNotFoundError(f"no histogram store at {store_dir}")
    return store.groupBy(*group_cols, "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def histogram_store_quantiles(
    spark,
    store_dir: str,
    group_cols: list[str],
    boundaries: list[float],
    qs: list[float],
    heal: bool = True,
) -> DataFrame:
    """Quantiles over everything ever accumulated — identical to a
    direct single-pass sketch over the union of all batches."""
    return histogram_quantiles(
        histogram_store(spark, store_dir, group_cols, heal=heal),
        group_cols,
        boundaries,
        qs,
    )


def compact_histogram_store(
    spark, store_dir: str, group_cols: list[str], *, keep_last: int = 1
) -> int:
    """Collapse all batch partitions strictly below the newest
    ``keep_last`` into the ``max − keep_last`` partition via per-bucket
    sums (quantile answers unchanged: linearity). Same safety argument
    as ``compact_cms_store``: ids are monotonic and a replay of the
    live max batch only rewrites its own partition."""
    finish_pending_fold(spark, store_dir)
    store = spark.read.parquet(store_dir)
    ids = store_batch_ids_or_scan(spark, store_dir)
    if len(ids) <= keep_last + 1:
        return 0
    cut = ids[-keep_last] if keep_last else ids[-1] + 1
    fold_to = cut - 1
    folded = (
        store.filter(F.col("batch_id") < cut)
        .groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("batch_id", F.lit(fold_to))
    )
    # stage durably, commit, overwrite, delete — one crash-safe protocol
    # (see _store.durable_fold); the stale deletes ride the fold's commit
    # marker so a crash can never leave a double-counting store
    return durable_fold(
        folded, store_dir, stale_ids=[i for i in ids if i < fold_to]
    )
