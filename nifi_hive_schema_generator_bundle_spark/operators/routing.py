"""Valid/invalid record routing (SURVEY §2 O3/O14/O16).

The reference routes whole FlowFiles: content is "valid" if org.json can
parse a ``JSONObject`` or ``JSONArray`` from the *first* JSON value
(HiveSchemaGenerator.scala:77-95 — a quirk: later garbage lines still pass
validation, then throw during inference → failure). We route **per
record**, the documented improvement (FIXTURES.md F3b): every line is
independently validated, good lines proceed to inference, bad lines go to
a quarantine side.

Validity predicate stays JVM-side: Spark 4's ``try_parse_json`` (variant
parser, whole-stage codegen) plus a first-char check that mirrors the
reference's object-or-array requirement (a bare scalar like ``5`` is
*invalid* to org.json's JSONObject/JSONArray constructors, so it is
invalid here too). No Python UDF in the hot path.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["is_valid_json", "split_valid", "RoutedFrames"]


class RoutedFrames(NamedTuple):
    """The Spark rendering of the reference's success/failure relationships
    (HiveSchemaGeneratorRelationships.scala:23-39): two DataFrames split by
    the validity predicate, content passed through unmodified."""

    success: DataFrame
    failure: DataFrame


def is_valid_json(col: Column | str) -> Column:
    """True iff the value parses as JSON *and* the first value is an object
    or array (org.json parity — HiveSchemaGenerator.scala:80,85)."""
    c = F.col(col) if isinstance(col, str) else col
    first = F.substring(F.ltrim(c), 1, 1)
    return (
        c.isNotNull()
        & F.try_parse_json(c).isNotNull()
        & first.isin("{", "[")
    )


def split_valid(df: DataFrame, column: str = "value") -> RoutedFrames:
    """Split into (success, failure) on the validity predicate.

    One logical scan; Catalyst plans two filtered reads (or one cached scan
    if the caller persists ``df``). Rows pass through byte-identical —
    the reference's tests assert content unchanged
    (HiveSchemaGeneratorSpec.scala:50-52) and so do ours.
    """
    pred = is_valid_json(column)
    return RoutedFrames(success=df.filter(pred), failure=df.filter(~pred))
