"""Property-based lattice checks (hypothesis): the merge must be a real
commutative/associative/idempotent join with NULL as identity and STRING
as the absorbing top, on arbitrary JSON shapes — not just the curated
F2 fixtures. Pure Python, no Spark session."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from nifi_hive_schema_generator_bundle_spark.plans.lattice import (
    finalize_type,
    infer_json_value,
    infer_raw,
    merge_raw,
    merge_types,
    type_to_dict,
)

def canon(dt):
    """Order-insensitive comparison form (SURVEY §1.4.6: the reference
    scrambles struct key order; ours keeps first-seen — both are
    order-unspecified, so properties hold up to field order)."""
    from pyspark.sql.types import ArrayType, StructField, StructType

    if isinstance(dt, StructType):
        return StructType(
            sorted(
                (StructField(f.name, canon(f.dataType)) for f in dt.fields),
                key=lambda f: f.name,
            )
        )
    if isinstance(dt, ArrayType):
        return ArrayType(canon(dt.elementType))
    return dt


json_values = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(10**15), max_value=10**15),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=8),
    ),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=6), children, max_size=4),
    ),
    max_leaves=12,
)


@settings(max_examples=200, deadline=None)
@given(json_values, json_values)
def test_merge_commutative(a, b):
    ta, tb = infer_json_value(a), infer_json_value(b)
    assert canon(merge_types(ta, tb)) == canon(merge_types(tb, ta))


@settings(max_examples=150, deadline=None)
@given(json_values, json_values, json_values)
def test_merge_associative(a, b, c):
    ta, tb, tc = (infer_json_value(v) for v in (a, b, c))
    assert canon(merge_types(merge_types(ta, tb), tc)) == canon(
        merge_types(ta, merge_types(tb, tc))
    )


@settings(max_examples=200, deadline=None)
@given(json_values)
def test_merge_idempotent(a):
    t = infer_json_value(a)
    assert merge_types(t, t) == t


@settings(max_examples=200, deadline=None)
@given(json_values)
def test_raw_and_typed_lattices_agree(a):
    assert infer_raw(a) == type_to_dict(infer_json_value(a))


@settings(max_examples=150, deadline=None)
@given(json_values, json_values)
def test_raw_merge_agrees(a, b):
    got = merge_raw(infer_raw(a), infer_raw(b))
    want = type_to_dict(merge_types(infer_json_value(a), infer_json_value(b)))
    assert got == want


@settings(max_examples=150, deadline=None)
@given(st.lists(st.dictionaries(st.text(min_size=1, max_size=4), json_values, max_size=3), min_size=1, max_size=5))
def test_finalized_schema_reparses_all_records_as_strings(objs):
    """Round-trip (SURVEY §5b): the inferred schema, finalized to concrete
    Hive types, must describe every record — every key path present in the
    data exists in the schema."""
    from pyspark.sql.types import ArrayType, StringType, StructType

    schema = None
    for o in objs:
        t = infer_json_value(o)
        schema = t if schema is None else merge_types(schema, t)
    final = finalize_type(schema)

    def covered(value, dt):
        if value is None:
            return True  # explicit nulls are absorbed by any type
        if isinstance(dt, StringType):
            return True  # strings swallow anything (conflict demotion)
        if isinstance(dt, StructType):
            if not isinstance(value, dict):
                return False
            return all(
                k in dt.fieldNames() and covered(v, dt[k].dataType)
                for k, v in value.items()
            )
        if isinstance(dt, ArrayType):
            if not isinstance(value, list):
                return False
            return all(covered(v, dt.elementType) for v in value)
        return True

    for o in objs:
        assert covered(o, final), (o, final.simpleString())
