"""Incremental cross-run NEAR-dedup — new batches against a persistent
MinHash signature store.

The exact-fingerprint sibling (``incremental_dedup``) answers "have we
EVER ingested these bytes?"; this module answers the question continuous
crawl pipelines actually need: "have we ever ingested something ~this
document?" — without re-reading any historical text. Two durable parquet
stores carry everything history contributes:

* ``<store>/bands`` — (band, bucket, id), the LSH band keys: the
  candidate-generation index. 8-byte buckets, ``bands`` rows per doc.
* ``<store>/sigs``  — (id, sig), the 64-long MinHash signature: the
  verification side. ~512 B per doc regardless of document size.

Per micro-batch: (1) within-batch near-dedup (``minhash_lsh_pairs`` +
keep-min — first occurrence inside the batch wins), (2) the survivors'
band keys join the band store (strictly earlier batches only) to form
candidates, (3) candidates verify on signature agreement — the unbiased
Jaccard estimator — against the signature store, (4) docs whose best
historical match ≥ threshold are dropped, (5) true survivors append to
the corpus and BOTH stores, partitioned by ``batch_id``.

Replay safety is inherited wholesale from ``incremental_dedup``: a
replayed batch filters history to ``batch_id < N`` (never sees its own
half-written rows) and rewrites its own partitions via dynamic partition
overwrite, so retries converge to the same bytes.

Scale shape: history never rescans text — the band join shuffles
(band, bucket, id) triples and the verify join ships one 512 B signature
per CANDIDATE, not per document. The degenerate-bucket cap drops
hot band buckets (> ``max_bucket`` historical members) from candidate
generation, the same explicit trade as the batch LSH operator. Store
growth is linear in survivors; fold small per-batch partitions with
``compact_store`` periodically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    band_keys,
    dedup_keep_min,
    minhash_lsh_pairs,
    minhash_signatures,
    signature_agreement,
)
from ..sources.formats import overwrite_partitions
from ._store import (
    durable_fold,
    finish_pending_fold,
    read_store,
    store_batch_ids_or_scan,
    store_max_batch_id,
    write_counted,
)

__all__ = [
    "compact_near_dedup_store",
    "near_dedup_batch_against_store",
    "run_incremental_near_dedup",
]


# heal-then-read shared by every store module (hoisted round 7)
_read_store = read_store


def near_dedup_batch_against_store(
    batch_df: DataFrame,
    batch_id: int,
    *,
    store_dir: str,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket: int = 1000,
    fmt: str = "parquet",
    hash_fn: str = "xxhash64",
) -> int:
    """One micro-batch of the incremental near-dedup; returns survivors
    kept. Reusable from any ``foreachBatch`` or a batch loop with its
    own monotonic batch numbering.

    ``hash_fn="md5"`` switches signatures AND band keys to the
    engine-portable forms (the `minhash_lsh_pairs` contract), making the
    whole multi-batch run — within-batch CC dedup, store band join,
    signature-agreement verify — replayable by a SQL oracle
    (`doc_incremental_near_dedup` in plans/queries.py)."""
    spark = batch_df.sparkSession
    if batch_df.isEmpty():
        return 0

    bands_dir = f"{store_dir}/bands"
    sigs_dir = f"{store_dir}/sigs"
    sig_store = _read_store(spark, sigs_dir)
    # monotonic-id guard from partition DIRECTORY names (one FS LIST,
    # not a footer scan of every partition; see _store.store_max_batch_id)
    top = store_max_batch_id(spark, sigs_dir)
    if top is not None and batch_id < top:
        raise ValueError(
            f"batch_id {batch_id} is behind the store's max {top}: "
            "the streaming checkpoint was reset against an existing "
            "store. Resume with the original checkpoint, or point "
            "store_dir/out_dir at fresh locations."
        )

    # (1) within-batch near-dedup, first (min-id) occurrence wins.
    # Signatures are computed ONCE for the whole batch and shared with
    # the LSH pair stage (sigs=) — the shingling + num_perm permutation
    # scan is the expensive stage, and the earlier version paid it
    # twice (once inside minhash_lsh_pairs, once for the store).
    full_sig = minhash_signatures(
        batch_df, text_col, id_col, k=k, num_perm=num_perm, hash_fn=hash_fn
    ).persist()
    pairs = minhash_lsh_pairs(
        batch_df,
        text_col,
        id_col,
        k=k,
        num_perm=num_perm,
        bands=bands,
        threshold=threshold,
        max_bucket=max_bucket,
        hash_fn=hash_fn,
        sigs=full_sig,
    )
    batch_kept = dedup_keep_min(batch_df, pairs, id_col)

    # (2)+(3) candidates vs strictly-earlier history, verified on
    # signature agreement — no text ever leaves the batch
    portable = hash_fn == "md5"
    sig = full_sig.join(
        batch_kept.select(F.col(id_col).alias("id")), "id", "semi"
    ).persist()
    my_bands = band_keys(
        sig, bands=bands, num_perm=num_perm, portable=portable
    ).select("id", "band", "bucket")
    survivors_ids = sig.select("id")
    band_store = _read_store(spark, bands_dir)
    if band_store is not None and sig_store is not None:
        hist_bands = band_store.filter(F.col("batch_id") < batch_id).select(
            "band", "bucket", F.col("id").alias("hist_id")
        )
        hot = (
            hist_bands.groupBy("band", "bucket")
            .count()
            .filter(F.col("count") > max_bucket)
            .select("band", "bucket")
        )
        hist_bands = hist_bands.join(hot, ["band", "bucket"], "anti")
        cand = (
            my_bands.join(hist_bands, ["band", "bucket"])
            .select("id", "hist_id")
            .distinct()
        )
        hist_sigs = sig_store.filter(F.col("batch_id") < batch_id).select(
            F.col("id").alias("hist_id"), F.col("sig").alias("hist_sig")
        )
        dup_ids = (
            cand.join(sig, "id")
            .join(hist_sigs, "hist_id")
            .filter(
                signature_agreement("sig", "hist_sig") >= F.lit(threshold)
            )
            .select("id")
            .distinct()
        )
        survivors_ids = survivors_ids.join(dup_ids, "id", "anti")

    survivors_ids = survivors_ids.persist()
    try:
        # (4)+(5) corpus append + both stores, all partition-overwritten.
        # r9 (VERDICT r8 #2): the three per-batch writes were the bulk
        # of the store protocol's job floor — they now run CONCURRENTLY
        # from a small driver thread pool (guide §2.6: independent jobs
        # back-fill each other's stragglers; at sf0.1 each write is a
        # handful of tiny tasks, so overlap collapses three job floors
        # into ~one), and the kept count rides the signature write via
        # Dataset.observe instead of its own job (_store.write_counted).
        # Safety is unchanged: all three are idempotent dynamic
        # partition overwrites of batch N's own partitions, their
        # mutual ORDER was never part of the replay contract (a crash
        # between any two leaves partials that the checkpoint replay
        # rewrites byte-identically, and the monotonic guard tolerates
        # batch_id == store max for exactly this reason), and the
        # cached frames they share are computed once — Spark's
        # BlockInfoManager serializes concurrent first readers of a
        # cached block, so the history verify lineage does not
        # re-execute per writer.
        out = batch_kept.join(
            survivors_ids.withColumnRenamed("id", id_col), id_col, "semi"
        ).withColumn("ingest_batch", F.lit(batch_id))
        kept_sigs = sig.join(survivors_ids, "id", "semi")
        new_bands = (
            band_keys(
                kept_sigs, bands=bands, num_perm=num_perm, portable=portable
            )
            .select("id", "band", "bucket")
            .withColumn("batch_id", F.lit(batch_id))
        )
        new_sigs = kept_sigs.withColumn("batch_id", F.lit(batch_id))

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            f_out = pool.submit(
                overwrite_partitions, out, out_dir, ["ingest_batch"], fmt=fmt
            )
            f_sigs = pool.submit(
                write_counted, new_sigs, sigs_dir, ["batch_id"]
            )
            f_bands = pool.submit(
                overwrite_partitions, new_bands, bands_dir, ["batch_id"]
            )
            f_out.result()
            f_bands.result()
            n = f_sigs.result()
    finally:
        sig.unpersist()
        full_sig.unpersist()
        survivors_ids.unpersist()
    return n


def compact_near_dedup_store(
    spark, store_dir: str, *, target_files: int = 4
) -> tuple[int, int]:
    """Fold BOTH sub-stores' accumulated per-batch partitions into one
    (VERDICT r6 #6: the last store family without a compactor — one
    tiny parquet partition per micro-batch is the small-files problem;
    cadence 50-100 suffices here per the round-6 30-batch sweep).

    All batches strictly below the current maximum collapse into the
    ``max−1`` partition; rows are carried verbatim (set stores — each
    (id, band, bucket) / (id, sig) row is unique by construction, so
    the fold is a rewrite, not an aggregate, and candidate generation
    and signature verification read exactly the same sets afterwards).
    Safe for the same monotonic-id reasons as
    ``incremental_dedup.compact_fingerprint_store``: every future batch
    id is > max−1, and a replay of batch ``max`` filters
    ``batch_id < max``, which still sees the folded rows and never its
    own. Crash-safe end to end via ``_store.durable_fold``'s commit
    marker (each sub-store recovers independently). Returns
    (band_rows, sig_rows) folded — (0, 0) means nothing was worth
    folding."""
    counts = []
    for sub in ("bands", "sigs"):
        path = f"{store_dir}/{sub}"
        store = _read_store(spark, path)  # heals any pending fold itself
        if store is None:
            counts.append(0)
            continue
        ids = store_batch_ids_or_scan(spark, path)
        if len(ids) < 3:  # nothing worth folding
            counts.append(0)
            continue
        top = ids[-1]
        fold_to = top - 1
        folded = (
            store.filter(F.col("batch_id") < top)
            .drop("batch_id")
            .repartition(target_files)
            .withColumn("batch_id", F.lit(fold_to))
        )
        counts.append(
            durable_fold(
                folded, path, stale_ids=[i for i in ids if i < fold_to]
            )
        )
    return counts[0], counts[1]


def run_incremental_near_dedup(
    stream_df: DataFrame,
    *,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    fmt: str = "parquet",
    compact_every: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the streaming query: each micro-batch is near-deduped
    against all prior history and appended to the corpus + stores.
    ``compact_every=N`` folds the
    store's accumulated per-batch partitions every N batches (after
    the batch-id-N update commits its partition), bounding partition
    count for unbounded drains — the SCALE.md 30-batch sweeps price
    the cadence: ~10 for the sketch-grid stores, 50-100 for the dedup
    stores, where per-batch partials are larger and folds dearer. A
    crash between the fold and the checkpoint commit is safe: the
    replayed batch rewrites only its own (live, kept) partition, and
    the fold itself is crash-safe via the durable_fold commit marker."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        near_dedup_batch_against_store(
            batch_df,
            batch_id,
            store_dir=store_dir,
            out_dir=out_dir,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
            fmt=fmt,
        )
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_near_dedup_store(batch_df.sparkSession, store_dir)

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
