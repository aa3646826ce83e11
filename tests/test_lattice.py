"""Unit tests for the type-merge lattice — one per SURVEY §1.4 rule,
mirroring the FIXTURES.md F2 edge-case matrix. Pure Python, no Spark."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    NullType,
    StringType,
    StructField,
    StructType,
)

from nifi_hive_schema_generator_bundle_spark.plans.lattice import (
    finalize_type,
    infer_json_line,
    infer_json_value,
    merge_types,
    schema_from_json_lines,
    type_from_dict,
    type_to_dict,
)

S = StringType()
N = NullType()


def struct(**kw):
    return StructType([StructField(k, v, True) for k, v in kw.items()])


def infer_all(*lines):
    return schema_from_json_lines(lines)


# --- infer_json_value -------------------------------------------------------

def test_scalars_are_string():
    for v in ["x", 1, -5, 2.5, True, False, 1522075683510]:
        assert infer_json_value(v) == S


def test_null_is_bottom():
    assert infer_json_value(None) == N


def test_empty_array_infers_array_of_bottom():
    # CreateHQL.scala:42 — [] folds to [JsNull] → renders ARRAY<STRING>
    assert infer_json_value([]) == ArrayType(N, True)


def test_homogeneous_scalar_array_is_array_string():
    # F2f: even [1,2,3] yields ARRAY<STRING> (catch-all hits number pairs)
    assert infer_json_value([1, 2, 3]) == ArrayType(S, True)


def test_object_keeps_first_seen_order():
    t = infer_json_value({"b": 1, "a": 2})
    assert [f.name for f in t.fields] == ["b", "a"]


# --- merge rules ------------------------------------------------------------

def test_null_absorbed_both_sides():
    assert merge_types(N, S) == S
    assert merge_types(S, N) == S
    assert merge_types(N, ArrayType(S)) == ArrayType(S)


def test_f2a_null_then_value():
    assert infer_all('{"a": null}', '{"a": "x"}') == struct(a=S)


def test_f2b_all_null_survives_as_bottom_renders_string():
    t = infer_all('{"a": null}', '{"a": null}', '{"a": null}')
    assert t == struct(a=N)
    assert finalize_type(t) == struct(a=S)


def test_f2c_scalar_kinds_merge_to_string():
    assert infer_all('{"a":1}', '{"a":true}', '{"a":"s"}', '{"a":2.5}') == struct(a=S)


def test_f2d_array_scalar_conflict_demotes_to_string():
    # SURVEY fixture witness: eventOrdinal [645,651] vs 647 → STRING
    assert infer_all('{"a":[1,2]}', '{"a":3}') == struct(a=S)


def test_f2e_array_object_conflict():
    assert infer_all('{"a":[1]}', '{"a":{"b":1}}') == struct(a=S)


def test_object_scalar_conflict():
    assert infer_all('{"a":{"b":1}}', '{"a":7}') == struct(a=S)


def test_f2g_empty_array_merges_with_populated():
    assert infer_all('{"a":[]}', '{"a":["x"]}') == struct(a=ArrayType(S, True))


def test_f2h_nested_arrays():
    assert infer_json_line('{"a":[[1],[2,3]]}') == struct(
        a=ArrayType(ArrayType(S, True), True)
    )


def test_f2i_struct_key_union():
    t = infer_all('{"a":{"x":1}}', '{"a":{"y":"z"}}')
    assert t == struct(a=struct(x=S, y=S))
    assert [f.name for f in t["a"].dataType.fields] == ["x", "y"]


def test_f2l_array_of_structs_unifies_element_keys():
    t = infer_json_line('{"a":[{"x":1},{"x":2,"y":3}]}')
    assert t == struct(a=ArrayType(struct(x=S, y=S), True))


def test_missing_keys_union_across_records():
    # SURVEY §1.4 rule 4 — absent fields keep type from records that have them
    t = infer_all('{"a":1}', '{"b":{"c":2}}', '{"a":2,"d":[1]}')
    assert t == struct(a=S, b=struct(c=S), d=ArrayType(S, True))


def test_merge_commutative_on_samples():
    samples = [
        infer_json_line(s)
        for s in [
            '{"a":1}',
            '{"a":[1]}',
            '{"a":{"x":1}}',
            '{"a":null}',
            '{"a":[{"y":2}]}',
        ]
    ]
    for x in samples:
        for y in samples:
            m1, m2 = merge_types(x, y), merge_types(y, x)
            # commutative up to field order (reference order is unspecified)
            assert sorted_repr(m1) == sorted_repr(m2)


def test_merge_associative_on_samples():
    a = infer_json_line('{"a":1,"b":[1]}')
    b = infer_json_line('{"b":[{"x":1}],"c":null}')
    c = infer_json_line('{"a":{"z":1},"c":2}')
    assert sorted_repr(merge_types(merge_types(a, b), c)) == sorted_repr(
        merge_types(a, merge_types(b, c))
    )


def sorted_repr(dt):
    if isinstance(dt, StructType):
        return (
            "struct",
            tuple(sorted((f.name, sorted_repr(f.dataType)) for f in dt.fields)),
        )
    if isinstance(dt, ArrayType):
        return ("array", sorted_repr(dt.elementType))
    return type(dt).__name__


def test_top_level_array_content_degrades():
    # schema starts as empty struct (CreateHQL.scala:12); a top-level array
    # merges (STRUCT, ARRAY) → STRING → renderer reports ERROR
    assert infer_all('[{"a":1}]') == S


def test_serde_roundtrip():
    t = infer_json_line('{"a":[{"x":1,"n.k":null}],"b":"s","c":[]}')
    assert type_from_dict(type_to_dict(t)) == t


def test_raw_lattice_lockstep_with_typed():
    """infer_raw/merge_raw (executor hot path) must agree with the typed
    lattice on every shape — property-checked over random JSON values."""
    import random

    from nifi_hive_schema_generator_bundle_spark.plans.lattice import (
        infer_raw,
        merge_raw,
    )

    rng = random.Random(7)

    def rand_json(depth=0):
        kinds = ["scalar", "null", "list", "dict"] if depth < 3 else ["scalar", "null"]
        k = rng.choice(kinds)
        if k == "scalar":
            return rng.choice([1, -2.5, True, "s", 10**12])
        if k == "null":
            return None
        if k == "list":
            return [rand_json(depth + 1) for _ in range(rng.randint(0, 3))]
        return {f"k{rng.randint(0, 4)}": rand_json(depth + 1) for _ in range(rng.randint(0, 3))}

    vals = [rand_json() for _ in range(300)]
    for v in vals:
        assert infer_raw(v) == type_to_dict(infer_json_value(v)), v
    for a in vals[:40]:
        for b in vals[:40]:
            got = merge_raw(infer_raw(a), infer_raw(b))
            want = type_to_dict(merge_types(infer_json_value(a), infer_json_value(b)))
            assert got == want, (a, b)
