"""The type-merge lattice — the semantic heart of the engine.

Re-expresses the reference's schema-inference semantics
(``CreateHQL.scala:38-66`` — ``prepare`` + ``merge``) over
:mod:`pyspark.sql.types` objects instead of a value-as-type JSON encoding.

The inferred type universe is deliberately tiny (SURVEY §1.3):

* ``StringType``  — any JSON scalar (string, number, bool) and any conflict
* ``ArrayType(T)`` — JSON array; element = merge of all elements
* ``StructType``  — JSON object; fields = union of keys across records
* ``NullType``    — lattice bottom ("no information yet"); absorbed by
  anything; renders as STRING if it survives to output

``merge`` is commutative and associative, which is what makes the fold
distributable: per-partition partial merges combine into a final schema
with no shuffle (combiner-style aggregation).

Lattice rules (SURVEY §1.4; each has a unit test):

1. ``merge(NULL, x) = x``; ``merge(x, NULL) = x``      (CreateHQL.scala:53-54)
2. ``merge(ARRAY[a], ARRAY[b]) = ARRAY[merge(a, b)]``  (CreateHQL.scala:55)
3. ``merge(OBJ a, OBJ b)`` = key-union; shared keys merged recursively
   (CreateHQL.scala:57-61)
4. any other pair → ``STRING``                         (CreateHQL.scala:63-64)

Array normalization (``prepare``, CreateHQL.scala:38-48) happens at
*inference* time here: a JSON array's elements are folded with ``merge``
starting from ``NullType`` — so ``[]`` infers ``ARRAY<NULL>`` (renders
``ARRAY<STRING>``) and ``[1, 2]`` infers ``ARRAY<STRING>`` (two numbers
hit the conflict rule, exactly as the reference's catch-all does).

Column order: the reference scrambles struct key order through a Scala
hash map (CreateHQL.scala:58-61 — effectively unspecified). We canonicalize
to *first-seen* order, documented as an improvement; correctness tests
compare order-insensitively.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql.types import (
    ArrayType,
    DataType,
    NullType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "BOTTOM",
    "finalize_type",
    "infer_json_value",
    "infer_json_line",
    "infer_raw",
    "merge_raw",
    "merge_types",
    "schema_from_json_lines",
    "type_to_dict",
    "type_from_dict",
]

BOTTOM: DataType = NullType()


def infer_json_value(value: Any) -> DataType:
    """Map one parsed JSON value to its lattice type.

    Mirrors the per-record half of ``CreateHQL.merge`` + ``prepare``:
    scalars → STRING, ``null`` → bottom, arrays collapse their elements
    to a single representative via the merge fold, objects keep key order
    (first-seen; ``json.loads`` preserves insertion order).
    """
    if value is None:
        return NullType()
    if isinstance(value, dict):
        return StructType(
            [StructField(k, infer_json_value(v), True) for k, v in value.items()]
        )
    if isinstance(value, (list, tuple)):
        elem: DataType = NullType()
        for item in value:
            elem = merge_types(elem, infer_json_value(item))
        return ArrayType(elem, True)
    # string / int / float / bool — every scalar is STRING (CreateHQL.scala:64,81)
    return StringType()


def infer_json_line(line: str) -> DataType:
    """Parse one NDJSON line and infer its lattice type.

    Raises ``ValueError`` (from ``json.loads``) on malformed input — the
    caller decides whether to route to the failure side (O14) or raise.
    """
    return infer_json_value(json.loads(line))


def merge_types(a: DataType, b: DataType) -> DataType:
    """The commutative join operator (CreateHQL.scala:50-66)."""
    if isinstance(a, NullType):
        return b
    if isinstance(b, NullType):
        return a
    if isinstance(a, ArrayType) and isinstance(b, ArrayType):
        return ArrayType(merge_types(a.elementType, b.elementType), True)
    if isinstance(a, StructType) and isinstance(b, StructType):
        fields: list[StructField] = []
        index: dict[str, int] = {}
        for f in a.fields:
            index[f.name] = len(fields)
            fields.append(f)
        for f in b.fields:
            i = index.get(f.name)
            if i is None:
                index[f.name] = len(fields)
                fields.append(f)
            else:
                fields[i] = StructField(
                    f.name, merge_types(fields[i].dataType, f.dataType), True
                )
        return StructType(fields)
    # "If there is a mismatch, always return string" (CreateHQL.scala:63-64).
    # Total — never raises; the reference's RowMismatch/InconsistentArray
    # error paths are unreachable dead code (SURVEY §1.4 rule 7).
    return StringType()


def schema_from_json_lines(lines) -> DataType:
    """Single-threaded reference fold: ``schema = merge(schema, parse(line))``.

    Starts from an empty STRUCT like ``CreateHQL.scala:12`` (``Json.obj()``),
    so top-level-array content degrades to STRING — which the renderer
    reports as the reference's ``"ERROR"`` definition. Used by unit tests
    and the single-node baseline; the distributed path is
    ``operators.infer``.
    """
    schema: DataType = StructType([])
    for line in lines:
        if line:
            schema = merge_types(schema, infer_json_line(line))
    return schema


def finalize_type(dt: DataType) -> DataType:
    """Collapse surviving lattice bottoms to STRING.

    The reference renders any leftover ``JsNull`` as ``STRING`` via the
    catch-all at CreateHQL.scala:81; this is the structural equivalent for
    consumers that need a real usable ``StructType`` (executable DDL,
    ``from_json``, ``saveAsTable``) instead of rendered text.
    """
    if isinstance(dt, NullType):
        return StringType()
    if isinstance(dt, ArrayType):
        return ArrayType(finalize_type(dt.elementType), True)
    if isinstance(dt, StructType):
        return StructType(
            [StructField(f.name, finalize_type(f.dataType), True) for f in dt.fields]
        )
    return dt


# --- raw-shape lattice (executor hot path) --------------------------------
#
# The exact-inference fold runs once per record on executors; building
# pyspark.sql.types objects there is ~10× slower than folding over the
# plain shapes the ser/de below already uses (None | "s" | [elem] |
# {name: shape}). The typed and raw forms are kept in lockstep —
# ``type_to_dict(infer_json_value(v)) == infer_raw(v)`` by construction
# (property-tested in test_lattice).

def infer_raw(value: Any) -> Any:
    """``infer_json_value`` over raw shapes (executor hot path)."""
    if value is None:
        return None
    if isinstance(value, dict):
        return {k: infer_raw(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        elem: Any = None
        for item in value:
            elem = merge_raw(elem, infer_raw(item))
        return [elem]
    return "s"


def merge_raw(a: Any, b: Any) -> Any:
    """``merge_types`` over raw shapes (executor hot path)."""
    if a is None:
        return b
    if b is None:
        return a
    if isinstance(a, list) and isinstance(b, list):
        return [merge_raw(a[0], b[0])]
    if isinstance(a, dict) and isinstance(b, dict):
        out = dict(a)
        for k, v in b.items():
            out[k] = merge_raw(out[k], v) if k in out else v
        return out
    return "s"


# --- compact ser/de so executors can ship partial schemas to the driver ---

def type_to_dict(dt: DataType) -> Any:
    """Serialize a lattice type to a JSON-able tree (compact, stable)."""
    if isinstance(dt, NullType):
        return None
    if isinstance(dt, StringType):
        return "s"
    if isinstance(dt, ArrayType):
        return [type_to_dict(dt.elementType)]
    if isinstance(dt, StructType):
        return {f.name: type_to_dict(f.dataType) for f in dt.fields}
    raise TypeError(f"not a lattice type: {dt!r}")


def type_from_dict(obj: Any) -> DataType:
    if obj is None:
        return NullType()
    if obj == "s":
        return StringType()
    if isinstance(obj, list):
        return ArrayType(type_from_dict(obj[0]), True)
    if isinstance(obj, dict):
        return StructType(
            [StructField(k, type_from_dict(v), True) for k, v in obj.items()]
        )
    raise TypeError(f"not a serialized lattice type: {obj!r}")
