"""File-format connectors beyond NDJSON/parquet (SURVEY §2, connector
extension category).

The reference bundle reads exactly one format — NDJSON FlowFile content —
and writes none (`CreateHQL.scala:8-21` reads lines; the DDL presumes
JSON-SerDe files already in place). Spark gives the rest of the connector
matrix for free; this module pins a uniform entry point so every engine
operator can consume any supported format, plus a schema-preserving
converter (the "re-materialize as a better format" step every 100 TB
pipeline runs before heavy querying: parquet/ORC scans prune columns and
push filters, NDJSON/CSV scans cannot).

Avro needs the external spark-avro package; it is probed at runtime and
reported unsupported when absent rather than failing at import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "SUPPORTED_FORMATS",
    "is_format_available",
    "read_any",
    "convert",
    "overwrite_partitions",
    "compact",
]

# formats built into a stock Spark distribution
SUPPORTED_FORMATS = ("parquet", "orc", "json", "csv", "text", "avro")


def is_format_available(spark: SparkSession, fmt: str) -> bool:
    """True if this Spark build can read/write ``fmt``. Only avro is
    conditional (external package); everything else ships in core."""
    if fmt not in SUPPORTED_FORMATS:
        return False
    if fmt != "avro":
        return True
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.avro.AvroFileFormat"
        )
        return True
    except Exception:
        return False


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str,
    *,
    schema=None,
    header: bool = True,
    infer_schema: bool = False,
) -> DataFrame:
    """Uniform reader over the supported format matrix.

    CSV defaults to header=True and *no* schema inference — inference
    costs an extra full scan of the data, which at 100 TB is a second
    pass you never want; callers pass an explicit ``schema`` instead
    (or opt in with ``infer_schema=True`` on small data).
    """
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {SUPPORTED_FORMATS})")
    if not is_format_available(spark, fmt):
        raise NotImplementedError(
            f"format {fmt!r} not available in this Spark build "
            "(avro requires the spark-avro package)"
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", header).option("inferSchema", infer_schema)
    return reader.format(fmt).load(path)


def convert(
    df: DataFrame,
    path: str,
    fmt: str,
    *,
    mode: str = "error",
    partition_by: list[str] | None = None,
    compression: str | None = None,
    header: bool = True,
) -> None:
    """Schema-preserving re-materialization into ``fmt``.

    ``partition_by`` writes hive-style directory partitions — the scale
    lever: a downstream filter on a partition column prunes whole
    directories before any I/O happens. Compression defaults to the
    format's own default (snappy for parquet/orc) unless overridden.
    """
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {SUPPORTED_FORMATS})")
    if not is_format_available(df.sparkSession, fmt):
        raise NotImplementedError(f"format {fmt!r} not available in this Spark build")
    writer = df.write.mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    if fmt == "csv":
        writer = writer.option("header", header)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    *,
    fmt: str = "parquet",
) -> None:
    """Idempotent partition-level rewrite: replace ONLY the hive
    partitions present in ``df``, leaving sibling partitions untouched
    (dynamic partition overwrite). This is the retryable-backfill
    primitive — re-running a day's job rewrites that day, not the
    table. Static overwrite (Spark's default) would drop every
    partition under ``path``."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {SUPPORTED_FORMATS})")
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .format(fmt)
        .save(path)
    )


def compact(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    target_file_mb: float = 256,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite a directory of small files into ~``target_file_mb`` files.

    The small-files problem is the quiet killer of big scans: a 1 TB
    table in 100k × 10 MB files pays 100k open/footer/seek costs and
    drowns the scheduler in tasks. Reads the current byte size from the
    filesystem, computes the output file count, and rewrites in place
    (atomically per partition-dir via a temp dir + move is the caller's
    concern on object stores; on HDFS-likes overwrite is fine).

    ``sort_by`` additionally clusters rows (e.g. a zorder_key column)
    so min/max file statistics become selective — the data-skipping
    lever. Returns the output file count."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format: {fmt!r} (one of {SUPPORTED_FORMATS})")
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(jpath).getLength()
    n_files = max(1, int(total_bytes / (target_file_mb * 1024 * 1024)) + 1)
    df = spark.read.format(fmt).load(path)
    if sort_by:
        # repartitionByRange + local sort: clustered AND evenly sized
        out = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        out = df.coalesce(n_files) if df.rdd.getNumPartitions() > n_files else df
    tmp = path.rstrip("/") + "__compact_tmp"
    out.write.mode("overwrite").format(fmt).save(tmp)
    fs.delete(jpath, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), jpath)
    written = spark.read.format(fmt).load(path)
    assert written.columns == df.columns
    return n_files
