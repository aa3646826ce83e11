#!/usr/bin/env python
"""Phase-level timing for the round-8 top-offender queries (guide §1:
find where the seconds actually go before changing anything).

Each profiled query is decomposed into its real internal phases; every
phase is forced with a noop write (or the action the operator itself
runs) and timed separately, twice (cold + warm), on the bench session
config. Results print as one line per phase.

Usage: python scripts/profile_phases.py <target> [...]
Targets: incnd, bitext_exact, bitext_ann, ddsketch, spanstats, jobfloor
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark():
    from nifi_hive_schema_generator_bundle_spark.session import get_session

    spark = get_session(
        "profile-phases",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


class T:
    def __init__(self):
        self.rows = []

    def __call__(self, label, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        self.rows.append((label, dt))
        print(f"  {dt:7.2f}s  {label}", flush=True)
        return out


def profile_incnd(spark):
    """doc_incremental_near_dedup: 3-batch store replay, phase timings
    for batch 1 (middle batch: has history, moderate size)."""
    import tempfile

    from pyspark.sql import functions as F

    from nifi_hive_schema_generator_bundle_spark.plans.queries import (
        QUERIES,
        load_table,
    )
    from nifi_hive_schema_generator_bundle_spark.streaming.incremental_near_dedup import (
        near_dedup_batch_against_store,
    )
    from nifi_hive_schema_generator_bundle_spark.operators.dedup import (
        band_keys,
        dedup_keep_min,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    t = T()
    # whole-query reference (warm pass after one cold)
    QUERIES["doc_incremental_near_dedup"](spark, SF_DIR).collect()
    t("whole query (warm)", lambda: QUERIES["doc_incremental_near_dedup"](spark, SF_DIR).collect())

    d = load_table(spark, SF_DIR, "documents")
    work = tempfile.mkdtemp(prefix="prof_incnd_")
    for b in range(2):
        t(f"batch {b} full", lambda b=b: near_dedup_batch_against_store(
            d.filter(F.col("doc_id") % 3 == b), b,
            store_dir=f"{work}/store", out_dir=f"{work}/corpus",
            threshold=0.5, num_perm=16, bands=4, max_bucket=10**9,
            hash_fn="md5",
        ))
    # now decompose batch-2-shaped work
    batch_df = d.filter(F.col("doc_id") % 3 == 2)
    t("isEmpty", lambda: batch_df.isEmpty())
    sig = t("minhash_signatures (noop)", lambda: minhash_signatures(
        batch_df, "text", "doc_id", k=3, num_perm=16, hash_fn="md5"))
    noop(sig)
    sigp = minhash_signatures(
        batch_df, "text", "doc_id", k=3, num_perm=16, hash_fn="md5"
    ).persist()
    t("sig persist+count", lambda: sigp.count())
    pairs = minhash_lsh_pairs(
        batch_df, "text", "doc_id", k=3, num_perm=16, bands=4,
        threshold=0.5, max_bucket=10**9, hash_fn="md5", sigs=sigp)
    t("lsh pairs (noop, sigs given)", lambda: noop(pairs))
    kept = dedup_keep_min(batch_df, pairs, "doc_id")
    t("dedup_keep_min incl CC (noop)", lambda: noop(kept))
    t("band_keys on sig (noop)", lambda: noop(
        band_keys(sigp, bands=4, num_perm=16, portable=True)))
    sigp.unpersist()


def profile_bitext(spark, which):
    from pyspark.sql import functions as F

    from nifi_hive_schema_generator_bundle_spark.plans.queries import load_table
    from nifi_hive_schema_generator_bundle_spark.operators.bitext import (
        bitext_margin_scores,
        lsh_bitext_candidates,
        mine_bitext_pairs,
    )

    t = T()
    emb = load_table(spark, SF_DIR, "embeddings").filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == 64)
    )
    src = emb.filter(F.col("vec_id") % 2 == 0)
    tgt = emb.filter(F.col("vec_id") % 2 == 1)
    cands = None
    if which == "ann":
        cands = lsh_bitext_candidates(src, tgt, n_planes=8, band_bits=4, dim=64)
        t("candidates only (noop)", lambda: noop(cands))
    # full mined output
    mined = mine_bitext_pairs(
        src, tgt, k=4, threshold=1.05, mutual_best=True, candidates=cands)
    t("mined cold", lambda: noop(mined))
    t("mined warm", lambda: noop(mined))
    # phase: raw scored pairs (cross or candidate-join + cos)
    s = src.select(F.col("vec_id").alias("src_id"), F.col("embedding").alias("__sv"))
    tt = tgt.select(F.col("vec_id").alias("tgt_id"), F.col("embedding").alias("__tv"))
    from nifi_hive_schema_generator_bundle_spark.operators.bitext import _qdot

    if which == "exact":
        pairs = s.crossJoin(F.broadcast(tt))
    else:
        pairs = cands.join(s, "src_id").join(tt, "tgt_id")
    raw = pairs.select("src_id", "tgt_id", _qdot(F.col("__sv"), F.col("__tv")).alias("qd"))
    t("pairs+qdot only (noop)", lambda: noop(raw))
    t("pairs+qdot only warm", lambda: noop(raw))
    # phase: scored + both windows
    scored = bitext_margin_scores(src, tgt, k=4, candidates=cands)
    t("margin_scores (noop)", lambda: noop(scored))


def profile_ddsketch(spark):
    import tempfile

    from pyspark.sql import functions as F

    from nifi_hive_schema_generator_bundle_spark.plans.queries import (
        QUERIES,
        _ddsketch_params,
        load_table,
    )
    from nifi_hive_schema_generator_bundle_spark.operators.quantile_sketch import (
        log_bucket_histogram,
    )
    from nifi_hive_schema_generator_bundle_spark.streaming.quantile_stream import (
        histogram_batch_update,
    )

    t = T()
    QUERIES["lineitem_ddsketch_incremental"](spark, SF_DIR).collect()
    t("whole query (warm)", lambda: QUERIES["lineitem_ddsketch_incremental"](spark, SF_DIR).collect())
    bounds, _mids, qs = _ddsketch_params()
    li = load_table(spark, SF_DIR, "lineitem").filter(
        F.col("l_extendedprice").isNotNull()
    )
    b0 = li.filter(F.col("l_orderkey") % 3 == 0)
    t("isEmpty", lambda: b0.isEmpty())
    delta = log_bucket_histogram(b0, "l_extendedprice", ["l_returnflag"], bounds)
    t("delta agg (noop)", lambda: noop(delta))
    t("delta agg count", lambda: delta.count())
    store = tempfile.mkdtemp(prefix="prof_dd_")
    t("batch_update full", lambda: histogram_batch_update(
        b0, 0, store_dir=store, val_col="l_extendedprice",
        group_cols=["l_returnflag"], boundaries=bounds))


def profile_jobfloor(spark):
    """Fixed cost of one tiny job / one tiny noop write at this config."""
    from pyspark.sql import functions as F

    t = T()
    df = spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("k"))
    t("tiny noop x1", lambda: noop(df))
    t("tiny noop x1 again", lambda: noop(df))
    agg = df.groupBy("k").count()
    t("tiny shuffle agg noop", lambda: noop(agg))
    t("tiny shuffle agg noop again", lambda: noop(agg))
    t("tiny collect", lambda: agg.collect())
    lc = df.localCheckpoint(eager=False)
    t("localCheckpoint eager", lambda: df.localCheckpoint(eager=True))


def main():
    targets = sys.argv[1:] or ["jobfloor"]
    spark = get_spark()
    for tgt in targets:
        print(f"== {tgt} ==", flush=True)
        if tgt == "incnd":
            profile_incnd(spark)
        elif tgt == "bitext_exact":
            profile_bitext(spark, "exact")
        elif tgt == "bitext_ann":
            profile_bitext(spark, "ann")
        elif tgt == "ddsketch":
            profile_ddsketch(spark)
        elif tgt == "jobfloor":
            profile_jobfloor(spark)
        else:
            print(f"unknown target {tgt}")
    spark.stop()


if __name__ == "__main__":
    main()
