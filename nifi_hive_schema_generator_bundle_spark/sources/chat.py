"""Chat-transcript NDJSON source — the OpenAI ``messages`` layout.

SFT corpora ship as NDJSON with one conversation per line::

    {"conversation_id": "c1",
     "messages": [{"role": "user", "content": "hi"},
                  {"role": "assistant", "content": "hello"}]}

This source parses that layout into the engine's conversation shape —
an ``array<struct<role, content>>`` ``turns`` column — with the same
two-channel contract as the reference's JSON ingest (``ndjson.py`` O3
routing): malformed JSON lands whole in ``_corrupt_record``; parsed
rows then flow through ``operators.sft.validate_conversations`` for
STRUCTURAL validity (roles, alternation, empty turns), so callers get
three frames: good, malformed-JSON, and structurally-invalid — each
with the reason attached.

Everything is one scan + narrow projections: the JSON parse is Spark's
native reader with an explicit schema (no inference pass), the
validation is a JVM fold. Extra top-level keys are ignored by the
schema, exactly like a production ingest should."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from .ndjson import CORRUPT_COL

__all__ = ["CHAT_SCHEMA", "read_chat_ndjson", "split_chat_validity"]

CHAT_SCHEMA = StructType(
    [
        StructField("conversation_id", StringType()),
        StructField(
            "messages",
            ArrayType(
                StructType(
                    [
                        StructField("role", StringType()),
                        StructField("content", StringType()),
                    ]
                )
            ),
        ),
        StructField(CORRUPT_COL, StringType()),
    ]
)


def read_chat_ndjson(
    spark: SparkSession, path: str, *, cache: bool = True
) -> DataFrame:
    """Parse chat NDJSON into (conversation_id, turns, _corrupt_record).
    Malformed lines keep the raw text in ``_corrupt_record`` with NULLs
    elsewhere (PERMISSIVE mode — one scan, no validate-then-parse double
    pass). Cached by default because the standard next step filters on
    the corrupt column alone (SPARK-21610, as in ``read_ndjson``);
    pass ``cache=False`` for single-pass pipelines that manage their
    own persistence."""
    df = (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .schema(CHAT_SCHEMA)
        .json(path)
    )
    out = df.select(
        "conversation_id",
        F.col("messages").alias("turns"),
        CORRUPT_COL,
    )
    return out.cache() if cache else out


def split_chat_validity(
    df: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Three-way route of a ``read_chat_ndjson`` frame:

    * ``good``    — parsed AND structurally valid (turns column ready
      for ``render_chat``/``preference_pairs``)
    * ``bad_json``— unparseable lines, raw text in ``_corrupt_record``
    * ``invalid`` — parsed but structurally broken, with the
      ``violation`` name from ``validate_conversations``

    Mirrors the engine's success/failure/error channel contract
    (SURVEY O14/O17) on the chat domain."""
    from ..operators.sft import validate_conversations

    bad_json = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        "conversation_id", CORRUPT_COL
    )
    parsed = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    checked = validate_conversations(parsed)
    good = checked.filter(F.col("valid")).drop("valid", "violation")
    invalid = checked.filter(~F.col("valid")).drop("valid")
    return good, bad_json, invalid
