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


def store_max_batch_id(spark, store_dir: str) -> int | None:
    """Max ``batch_id`` of a batch-partitioned store, read from the
    hive-layout PARTITION DIRECTORY NAMES via the Hadoop FS API — one
    LIST call on any filesystem (local, HDFS, s3a) instead of opening
    every partition's parquet footers. This is the monotonic-id guard
    every ``*_batch_update`` runs per micro-batch; the data-scan
    version was the one measured per-batch drift in the 30-batch
    sweeps (SCALE.md round 6: 0.73 → 1.38 s/batch uncompacted).
    Returns None when the store doesn't exist or has no batch
    partitions. Falls back to a data scan if the directory layout is
    unexpectedly non-hive (store written by something else)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    try:
        path = jvm.org.apache.hadoop.fs.Path(store_dir)
        fs = path.getFileSystem(jsc.hadoopConfiguration())
        if not fs.exists(path):
            return None
        ids = []
        saw_other = False
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if name.startswith("batch_id="):
                try:
                    ids.append(int(name.split("=", 1)[1]))
                except ValueError:
                    saw_other = True
            elif not name.startswith((".", "_")):
                # any other visible content (flat part files, foreign
                # partition columns) → not our layout, scan instead
                saw_other = True
        if ids:
            return max(ids)
        if not saw_other:
            return None
    except Exception:  # noqa: BLE001 — any JVM/FS surprise → data scan
        pass
    # non-hive layout or listing failure: authoritative (slow) fallback
    from pyspark.errors import AnalysisException
    from pyspark.sql import functions as F

    try:
        store = spark.read.parquet(store_dir)
    except AnalysisException:
        return None
    row = store.agg(F.max("batch_id")).collect()[0]
    return None if row[0] is None else int(row[0])


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
