"""Streaming quality monitor (streaming/quality_stream.py): per-batch
constraint reports appended to a batch-partitioned history, failure
callback, replay idempotency."""

from __future__ import annotations

import json

from pyspark.sql.types import LongType, StringType, StructField, StructType

from nifi_hive_schema_generator_bundle_spark.streaming.quality_stream import (
    run_quality_stream,
)

SCHEMA = StructType(
    [StructField("id", LongType()), StructField("status", StringType())]
)


def _write(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(
        "\n".join(json.dumps({"id": i, "status": s}) for i, s in rows) + "\n"
    )


def _run(spark, src, report, ckpt, fails):
    q = run_quality_stream(
        spark.readStream.format("json").schema(SCHEMA).load(str(src)),
        str(report),
        checkpoint=str(ckpt),
        not_null=["id"],
        accepted_values={"status": ["ok", "warn"]},
        on_fail=lambda bid, rows: fails.append((bid, [r["rule"] for r in rows])),
    )
    assert q.awaitTermination(120)


def test_quality_stream_reports_per_batch_and_alerts(spark, tmp_path):
    src = tmp_path / "qsrc"
    report = tmp_path / "qreport"
    fails: list = []

    _write(src / "b1.json", [(1, "ok"), (2, "warn")])
    _run(spark, src, report, tmp_path / "ck1", fails)
    assert fails == []  # clean batch

    _write(src / "b2.json", [(3, "ok"), (None, "bogus")])
    _run(spark, src, report, tmp_path / "ck1", fails)
    assert len(fails) == 1
    assert sorted(fails[0][1]) == ["accepted_values", "not_null"]

    rep = spark.read.parquet(str(report))
    rows = {(r["batch_id"], r["rule"]): r for r in rep.collect()}
    assert rows[(0, "not_null")]["passed"]
    assert not rows[(1, "not_null")]["passed"]
    assert rows[(1, "accepted_values")]["violations"] == 1


def test_quality_stream_replay_is_idempotent(spark, tmp_path):
    src = tmp_path / "rsrc"
    report = tmp_path / "rreport"
    _write(src / "b1.json", [(1, "ok")])

    _run(spark, src, report, tmp_path / "rck_a", [])
    # a second run from a FRESH checkpoint reprocesses batch 0: the
    # batch-partitioned dynamic overwrite converges instead of duplicating
    _run(spark, src, report, tmp_path / "rck_b", [])
    rep = spark.read.parquet(str(report))
    assert rep.filter("rule = 'not_null'").count() == 1
