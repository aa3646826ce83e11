"""Stream-stream interval join + watermarked streaming dedup
(streaming/joins.py): cross-batch duplicate suppression and time-bounded
event correlation, driven through real streaming queries."""

from __future__ import annotations

import json

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from nifi_hive_schema_generator_bundle_spark.streaming.joins import (
    dedup_stream,
    interval_join_streams,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("kind", StringType()),
    ]
)


def _write_batch(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(
        "\n".join(
            json.dumps(
                {"event_id": i, "ts": ts, "user_id": u, "kind": k}
            )
            for i, ts, u, k in rows
        )
        + "\n"
    )


def _drain(spark, df, name, ckpt):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_dedup_stream_suppresses_across_batches(spark, tmp_path):
    src = tmp_path / "dsrc"
    sink = str(tmp_path / "dsink")
    ckpt = str(tmp_path / "ck1")

    def drain_to_parquet():
        # file sink (memory sink can't recover from a checkpoint, and
        # cross-batch state recovery is exactly what's under test)
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        out = dedup_stream(stream, ["event_id"], watermark="1 hour")
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return sorted(r.event_id for r in spark.read.parquet(sink).collect())

    # batch 1: event 1 twice (same event_id), event 2 once
    _write_batch(
        src / "b1.json",
        [
            (1, "2024-01-01 10:00:00", 7, "click"),
            (1, "2024-01-01 10:00:00", 7, "click"),
            (2, "2024-01-01 10:05:00", 8, "view"),
        ],
    )
    assert drain_to_parquet() == [1, 2]

    # batch 2, same checkpoint: a replay of event 1 (within the
    # watermark horizon) and a genuinely new event 3
    _write_batch(
        src / "b2.json",
        [
            (1, "2024-01-01 10:00:00", 7, "click"),
            (3, "2024-01-01 10:20:00", 9, "click"),
        ],
    )
    # cross-batch state: the replayed event 1 stays suppressed
    assert drain_to_parquet() == [1, 2, 3]


def test_interval_join_attributes_within_window_only(spark, tmp_path):
    imp_src, clk_src = tmp_path / "imp", tmp_path / "clk"
    _write_batch(
        imp_src / "b.json",
        [
            (10, "2024-01-01 09:00:00", 1, "imp"),
            (11, "2024-01-01 09:00:00", 2, "imp"),
            (12, "2024-01-01 09:00:00", 3, "imp"),
        ],
    )
    _write_batch(
        clk_src / "b.json",
        [
            (20, "2024-01-01 09:30:00", 1, "clk"),  # within 1h → joins
            (21, "2024-01-01 11:30:00", 2, "clk"),  # too late → dropped
            (22, "2024-01-01 08:30:00", 3, "clk"),  # before imp → dropped
        ],
    )
    imps = (
        spark.readStream.schema(SCHEMA)
        .json(str(imp_src))
        .selectExpr("event_id AS imp_id", "ts AS imp_ts", "user_id")
    )
    clks = (
        spark.readStream.schema(SCHEMA)
        .json(str(clk_src))
        .selectExpr("event_id AS clk_id", "ts AS clk_ts", "user_id")
    )
    joined = interval_join_streams(
        imps,
        clks,
        "user_id",
        left_ts="imp_ts",
        right_ts="clk_ts",
        within="1 hour",
    )
    rows = _drain(spark, joined, "attrib", str(tmp_path / "ckj"))
    assert [(r.imp_id, r.clk_id) for r in rows] == [(10, 20)]


def test_interval_join_batch_mode_same_semantics(spark, tmp_path):
    """The same operator runs as a plain batch interval join (watermarks
    are no-ops in batch) — one code path for backfill and live."""
    _write_batch(
        tmp_path / "i" / "b.json",
        [(10, "2024-01-01 09:00:00", 1, "imp"), (11, "2024-01-01 09:00:00", 2, "imp")],
    )
    _write_batch(
        tmp_path / "c" / "b.json",
        [(20, "2024-01-01 09:10:00", 1, "clk"), (21, "2024-01-01 23:00:00", 2, "clk")],
    )
    imps = (
        spark.read.schema(SCHEMA)
        .json(str(tmp_path / "i"))
        .selectExpr("event_id AS imp_id", "ts AS imp_ts", "user_id")
    )
    clks = (
        spark.read.schema(SCHEMA)
        .json(str(tmp_path / "c"))
        .selectExpr("event_id AS clk_id", "ts AS clk_ts", "user_id")
    )
    rows = interval_join_streams(
        imps, clks, "user_id", left_ts="imp_ts", right_ts="clk_ts", within="1 hour"
    ).collect()
    assert [(r.imp_id, r.clk_id) for r in rows] == [(10, 20)]


def test_enrich_stream_attaches_dim_and_sees_dim_updates(spark, tmp_path):
    from nifi_hive_schema_generator_bundle_spark.streaming.joins import (
        enrich_stream,
    )

    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, "bronze"), (2, "silver")], "user_id long, tier string"
    ).write.mode("overwrite").parquet(dim_path)

    src = tmp_path / "esrc"
    _write_batch(src / "b1.json", [(1, "2024-01-01T00:00:00", 1, "view")])

    stream = (
        spark.readStream.format("json").schema(SCHEMA).load(str(src))
    )
    dim = spark.read.parquet(dim_path)
    enriched = enrich_stream(stream, dim, "user_id")
    rows = _drain(spark, enriched, "enrich_sink", str(tmp_path / "eckpt1"))
    assert [r["tier"] for r in rows] == ["bronze"]

    # out-of-band dim update + a second batch: the static side is read
    # at batch time, so a re-drained query sees the NEW tier for the
    # same user without any dim-reload plumbing
    spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    ).write.mode("overwrite").parquet(dim_path)
    _write_batch(src / "b2.json", [(2, "2024-01-01T00:01:00", 2, "click")])
    rows2 = _drain(
        spark,
        enrich_stream(
            spark.readStream.format("json").schema(SCHEMA).load(str(src)),
            spark.read.parquet(dim_path),
            "user_id",
        ),
        "enrich_sink2",
        str(tmp_path / "eckpt2"),
    )
    tiers = {r["user_id"]: r["tier"] for r in rows2}
    assert tiers == {1: "gold", 2: "silver"}


def test_enrich_stream_rejects_right_join(spark):
    from nifi_hive_schema_generator_bundle_spark.streaming.joins import (
        enrich_stream,
    )

    try:
        enrich_stream(None, None, "k", how="right")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_interval_join_left_outer_emits_unmatched_after_watermark(
    spark, tmp_path
):
    """leftOuter stream-stream join: an impression with no click inside
    its window is held in state until BOTH watermarks pass the window
    end, then emitted once with a NULL click — the state-eviction
    semantics that make outer stream joins bounded."""
    imp_src, clk_src = tmp_path / "imp", tmp_path / "clk"
    ckpt = str(tmp_path / "cko")
    _write_batch(
        imp_src / "b0.json",
        [
            (10, "2024-01-01 09:00:00", 1, "imp"),  # will be clicked
            (11, "2024-01-01 09:00:00", 2, "imp"),  # never clicked
        ],
    )
    _write_batch(
        clk_src / "b0.json",
        [(20, "2024-01-01 09:30:00", 1, "clk")],
    )

    def run():
        imps = (
            spark.readStream.schema(SCHEMA)
            .json(str(imp_src))
            .selectExpr("event_id AS imp_id", "ts AS imp_ts", "user_id")
        )
        clks = (
            spark.readStream.schema(SCHEMA)
            .json(str(clk_src))
            .selectExpr("event_id AS clk_id", "ts AS clk_ts", "user_id")
        )
        joined = interval_join_streams(
            imps,
            clks,
            "user_id",
            left_ts="imp_ts",
            right_ts="clk_ts",
            within="1 hour",
            left_watermark="30 minutes",
            right_watermark="30 minutes",
            how="leftOuter",
        )
        # memory sink can't recover a checkpoint across restarts; the
        # two-drain shape needs a real (parquet) sink
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return spark.read.parquet(out).collect()

    out = str(tmp_path / "outp")
    first = {(r.imp_id, r.clk_id) for r in run()}
    assert (10, 20) in first  # the match emits immediately
    # the unmatched impression may not emit yet: watermark hasn't passed
    assert (11, None) not in first
    # advance event time far past 09:00 + within + watermark on BOTH
    # sides so user 2's impression is provably unmatchable
    _write_batch(
        imp_src / "b1.json", [(12, "2024-01-01 13:00:00", 9, "imp")]
    )
    _write_batch(
        clk_src / "b1.json", [(21, "2024-01-01 13:00:00", 9, "clk")]
    )
    second = {(r.imp_id, r.clk_id) for r in run()}
    assert (11, None) in second  # evicted from state as a null match
    # and the matched pair never re-emits
    all_imp11 = [p for p in first | second if p[0] == 11]
    assert all_imp11 == [(11, None)]
