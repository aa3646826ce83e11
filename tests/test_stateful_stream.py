"""applyInPandasWithState streaming dedup: first occurrence wins, later
copies are suppressed across micro-batches."""

from __future__ import annotations

import json
import time

from pyspark.sql.types import LongType, StringType, StructField, StructType

from nifi_hive_schema_generator_bundle_spark.streaming.stateful import (
    streaming_first_occurrence,
)

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def test_streaming_first_occurrence(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write(name, rows):
        p = src / name
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
        time.sleep(0.05)  # distinct mtimes -> deterministic file order

    write("a.json", [{"doc_id": 1, "text": "hello world"},
                     {"doc_id": 2, "text": "foo bar"}])
    write("b.json", [{"doc_id": 3, "text": "  Hello   WORLD "},  # dup of 1
                     {"doc_id": 4, "text": "something else"}])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = streaming_first_occurrence(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "availableNow query should terminate"
    rows = spark.sql("SELECT * FROM dedup_out").collect()
    ids = sorted(r["doc_id"] for r in rows)
    # 3 surviving docs; exactly one of the hello-world pair
    assert len(ids) == 3
    assert 2 in ids and 4 in ids
    assert len({1, 3} & set(ids)) == 1
    # fingerprints unique
    fps = [r["fp"] for r in rows]
    assert len(set(fps)) == len(fps)
