"""Durable staging for batch-partitioned store compaction.

Every ``compact_*_store`` folds partitions ``batch_id < cut`` into the
``cut − 1`` partition and then deletes the originals. The fold frame
MUST NOT depend (even lazily) on the files being overwritten: a
``.persist()`` + ``count()`` is not enough, because cached blocks can
be evicted or lost (executor failure), and the recompute would then
re-read the mutated store — failing, or worse, double-counting.

``durable_fold`` closes that window: the folded frame is first written
to a sibling temp directory (a real parquet write — durable by
construction), re-read from those files (fresh lineage with no
reference to the store), and only THEN overwritten into place. The
temp directory is removed afterwards. Crash-safety: a crash before the
overwrite leaves the store untouched (plus a stale temp dir the next
fold clobbers); a crash after the overwrite but before the deletes
leaves duplicate pre-``cut`` partitions, which the next compaction
folds again — correct for count/sum stores only because the overwrite
replaced the ``fold_to`` partition atomically per partition, and for
max-merge stores (HLL) because max is idempotent.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame

from ..sources.formats import overwrite_partitions

_TMP_SUFFIX = ".__compact_tmp__"


def durable_fold(
    folded: DataFrame,
    store_dir: str,
    *,
    partition_col: str = "batch_id",
) -> int:
    """Stage ``folded`` durably, then dynamic-overwrite it into
    ``store_dir``. Returns the folded row count. The caller deletes the
    now-redundant source partitions afterwards."""
    spark = folded.sparkSession
    tmp = store_dir.rstrip("/") + _TMP_SUFFIX
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        # the staging write is inside the cleanup scope too: a failed
        # task leaves Spark's partial _temporary output behind otherwise
        folded.write.mode("overwrite").parquet(tmp)
        staged = spark.read.parquet(tmp)
        n = staged.count()
        overwrite_partitions(staged, store_dir, [partition_col], fmt="parquet")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return n
