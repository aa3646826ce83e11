"""Connector-matrix tests: uniform reader + schema-preserving converter
(SURVEY §2 connector extension category; reference reads NDJSON only,
`CreateHQL.scala:8-21`)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.sources.formats import (
    SUPPORTED_FORMATS,
    convert,
    is_format_available,
    read_any,
)


def _docs(spark, sf_smoke_dir):
    from nifi_hive_schema_generator_bundle_spark.plans.queries import load_table

    return load_table(spark, sf_smoke_dir, "documents").select(
        "doc_id", "lang", "text"
    ).limit(40)


@pytest.mark.parametrize("fmt", ["orc", "json", "csv"])
def test_convert_roundtrip_preserves_rows(spark, sf_smoke_dir, tmp_path, fmt):
    df = _docs(spark, sf_smoke_dir)
    out = str(tmp_path / fmt)
    convert(df, out, fmt)
    back = read_any(spark, out, fmt, schema=df.schema)
    assert back.count() == 40
    assert [f.name for f in back.schema.fields] == df.columns
    # value-level check on a stable key column
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == sorted(
        r.doc_id for r in df.select("doc_id").collect()
    )


def test_convert_partition_by_prunes_directories(spark, sf_smoke_dir, tmp_path):
    df = _docs(spark, sf_smoke_dir)
    out = str(tmp_path / "bylang")
    convert(df, out, "parquet", partition_by=["lang"])
    langs = [d for d in os.listdir(out) if d.startswith("lang=")]
    assert len(langs) >= 2
    one = langs[0].split("=", 1)[1]
    scanned = read_any(spark, out, "parquet").filter(F.col("lang") == one)
    # partition pruning: the filter survives to scan as a partition filter
    plan = scanned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
    assert scanned.count() == df.filter(F.col("lang") == one).count()


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        read_any(spark, str(tmp_path), "xml")
    with pytest.raises(ValueError):
        convert(spark.range(1), str(tmp_path / "x"), "xml")


def test_avro_probe_is_boolean_not_crash(spark):
    avail = is_format_available(spark, "avro")
    assert isinstance(avail, bool)
    if not avail:
        with pytest.raises(NotImplementedError):
            read_any(spark, "/nonexistent", "avro")
    assert all(
        is_format_available(spark, f) for f in SUPPORTED_FORMATS if f != "avro"
    )


def test_csv_reader_defaults_no_inference(spark, sf_smoke_dir, tmp_path):
    df = _docs(spark, sf_smoke_dir).select("doc_id", "lang")
    out = str(tmp_path / "csvdef")
    convert(df, out, "csv")
    # without a schema and inferSchema=False every column arrives as string
    back = read_any(spark, out, "csv")
    assert all(t == "string" for _, t in back.dtypes)
