"""NDJSON source/sink tests + differential test of engine inference vs the
single-threaded baseline on exported real data (SURVEY §5d)."""

from __future__ import annotations

import os
import subprocess
import sys

from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.operators.infer import infer_schema_df
from nifi_hive_schema_generator_bundle_spark.plans.lattice import (
    schema_from_json_lines,
)
from nifi_hive_schema_generator_bundle_spark.sources.ndjson import (
    export_table_as_ndjson,
    read_ndjson,
    read_ndjson_lines,
)


def test_export_and_reinfer_roundtrip(spark, sf_smoke_dir, tmp_path):
    from nifi_hive_schema_generator_bundle_spark.plans.queries import load_table

    docs = load_table(spark, sf_smoke_dir, "documents").limit(50)
    out = export_table_as_ndjson(docs, str(tmp_path / "nd"), coalesce=2)
    lines = read_ndjson_lines(spark, out)
    assert lines.count() == 50
    schema = infer_schema_df(lines, "value")
    assert sorted(f.name for f in schema.fields) == sorted(docs.columns)


def test_read_ndjson_corrupt_capture(spark, tmp_path):
    p = tmp_path / "mixed.ndjson"
    p.write_text('{"a": 1}\nbad line\n{"a": 2, "b": "x"}\n')
    df = read_ndjson(spark, str(p), cache=True)
    assert "_corrupt_record" in df.columns
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2 and bad.count() == 1
    assert bad.collect()[0]["_corrupt_record"] == "bad line"
    # primitivesAsString: numbers arrive as strings (lattice scalar rule)
    assert dict(good.select("a").dtypes)["a"] == "string"


def test_differential_engine_vs_baseline_fold(spark, sf_smoke_dir, tmp_path):
    """Engine distributed inference == single-thread reference fold on the
    same exported real-data NDJSON."""
    from nifi_hive_schema_generator_bundle_spark.plans.queries import load_table
    from tests.test_infer import canon

    ev = load_table(spark, sf_smoke_dir, "events").limit(200)
    out = export_table_as_ndjson(ev, str(tmp_path / "ev_nd"), coalesce=1)
    part = [
        os.path.join(out, f)
        for f in os.listdir(out)
        if f.startswith("part-")
    ][0]
    with open(part) as fh:
        expected = schema_from_json_lines(l.strip() for l in fh)
    got = infer_schema_df(read_ndjson_lines(spark, out), "value")
    assert canon(got) == canon(expected)


def test_baseline_ref_script_runs(tmp_path):
    p = tmp_path / "b.ndjson"
    p.write_text('{"a": 1, "b": [1, 2]}\n{"a": "x", "c": {"d": null}}\n')
    res = subprocess.run(
        [sys.executable, "/root/repo/baseline_ref.py", str(p)],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert res.returncode == 0, res.stderr
    import json

    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["valid"] is True and out["lines"] == 2
    assert out["ddl_chars"] > 0
