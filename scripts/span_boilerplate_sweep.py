"""Planted-boilerplate sweep for the cross-doc span pair (VERDICT r6 #4).

`top_shared_spans` is two-phase: phase 1 counts 8-byte gram hashes
(text never shuffles), phase 2 re-derives gram TEXT only for positions
whose hash survived the min_docs filter. Its docstring claims phase-2
volume is bounded by ACTUAL cross-doc duplication, not corpus size —
this script verifies that empirically: corpus size held constant
(sf0.1 documents), a fixed ~25-token license banner prepended to a
varying fraction of documents, measuring the phase-2 survivor row
count and wall time of both operators at each planting rate.

Expected: phase-2 rows ≈ (banner grams + boundary grams) × planted
docs + the corpus's organic shared spans — linear in planted docs,
flat in corpus size (the 10× replica sweep covers the corpus-size
axis).

Usage: python scripts/span_boilerplate_sweep.py
Writes /tmp/span_boilerplate_sweep.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RATES = [0.0, 0.1, 0.5, 1.0]
K = 5
BANNER = (
    "this work is licensed under the creative commons attribution "
    "share alike license version four point zero see the full legal "
    "code at the commons archive for terms and conditions"
)


def main() -> None:
    from nifi_hive_schema_generator_bundle_spark.operators.dedup import (
        _gram_positions,
        cross_doc_span_stats,
        top_shared_spans,
    )
    from nifi_hive_schema_generator_bundle_spark.session import get_session

    spark = get_session(
        "span_boilerplate_sweep",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(os.path.join(BASE, "documents.parquet"))
        .select("doc_id", "text")
        .persist()
    )
    n_docs = docs.count()
    banner_tokens = len(BANNER.split())

    rows = []
    for rate in RATES:
        planted = docs.select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 100) < int(rate * 100),
                F.concat(F.lit(BANNER + " "), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        ).persist()
        n_planted = planted.filter(
            (F.col("doc_id") % 100) < int(rate * 100)
        ).count()

        # phase-2 survivor volume: the (id, pos) rows whose gram hash
        # cleared min_docs — exactly the rows whose text gets re-derived
        _toks, _lengths, grams = _gram_positions(planted, K, "text", "doc_id")
        dup = (
            grams.groupBy("gh")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
            .select("gh")
        )
        phase2_rows = grams.join(dup, "gh", "semi").count()

        t0 = time.perf_counter()
        cross_doc_span_stats(planted, k=K).write.format("noop").mode(
            "overwrite"
        ).save()
        t_stats = time.perf_counter() - t0
        t0 = time.perf_counter()
        report = top_shared_spans(planted, k=K, top_n=20)
        top = report.collect()
        t_report = time.perf_counter() - t0
        top_docs = top[0].n_docs if top else 0
        planted.unpersist()
        row = {
            "rate": rate,
            "planted_docs": n_planted,
            "phase2_rows": phase2_rows,
            "rows_per_planted_doc": round(phase2_rows / max(n_planted, 1), 1)
            if n_planted
            else None,
            "t_stats_s": round(t_stats, 2),
            "t_report_s": round(t_report, 2),
            "top_span_n_docs": top_docs,
        }
        rows.append(row)
        print(
            f"| {rate:.0%} | {n_planted} | {phase2_rows} "
            f"| {row['rows_per_planted_doc']} | {t_stats:.2f} "
            f"| {t_report:.2f} | {top_docs} |",
            flush=True,
        )
    with open("/tmp/span_boilerplate_sweep.json", "w") as fh:
        json.dump(
            {
                "n_docs": n_docs,
                "banner_tokens": banner_tokens,
                "k": K,
                "rows": rows,
            },
            fh,
            indent=1,
        )
    spark.stop()


if __name__ == "__main__":
    main()
