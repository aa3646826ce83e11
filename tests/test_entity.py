"""Entity resolution (operators/entity): planted-cluster tests."""

from __future__ import annotations

from pyspark.sql import functions as F


def _parts(spark):
    return spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "ted widget"),  # lev 1 from red widget
            (3, "tad widget"),  # lev 1 from ted, 2 from red
            (4, "red widget"),  # exact duplicate of id 1
            (5, "blue bolt"),
            (6, "blur bolt"),  # lev 1 from blue bolt
            (7, "red gizmo"),  # same adjective, different block
            (9, None),  # NULL name: always its own entity
            (10, "aaaa widget"),  # chain: endpoints lev 3 apart, but
            (11, "aaab widget"),  # consecutive links are lev 1 —
            (12, "aabb widget"),  # closure must still merge them all
            (13, "abbb widget"),
        ],
        ["id", "name"],
    )


def _resolved(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.entity import (
        resolve_entities,
    )

    rows = resolve_entities(_parts(spark), "id", "name").collect()
    return {r.id: (r.entity_id, r.canonical_name) for r in rows}


def test_typo_cluster_and_exact_dup_merge(spark):
    got = _resolved(spark)
    # chain red->ted->tad merges; aaaa..abbb merges too, and
    # lev("tad widget","aaab widget")=3 keeps the two clusters apart?
    # No: lev("tad widget","aaaa widget") = 3 > 2 but closure runs over
    # representative links, and lev("tad","aaab") pairs are > 2, so the
    # widget block splits into {1,2,3,4} and {10,11,12,13}.
    assert got[1] == (1, "red widget")
    assert got[2] == (1, "red widget")
    assert got[3] == (1, "red widget")
    assert got[4] == (1, "red widget")  # exact dup follows its name


def test_chain_merges_transitively(spark):
    got = _resolved(spark)
    # endpoints are lev 3 apart — only the closure can merge them
    assert got[10] == (10, "aaaa widget")
    assert got[13] == (10, "aaaa widget")
    assert got[11][0] == 10 and got[12][0] == 10


def test_blocking_prevents_cross_block_pairs(spark):
    got = _resolved(spark)
    # "red gizmo" is lev 6 from "red widget" anyway, but blocking alone
    # must keep it out of the widget comparisons: its own entity
    assert got[7] == (7, "red gizmo")
    assert got[5] == (5, "blue bolt")
    assert got[6] == (5, "blue bolt")


def test_null_name_is_own_entity(spark):
    got = _resolved(spark)
    assert got[9] == (9, None)


def test_blocked_edit_pairs_bounds(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.entity import (
        blocked_edit_pairs,
    )

    pairs = blocked_edit_pairs(
        _parts(spark).filter(F.col("name").isNotNull()), "id", "name"
    ).collect()
    got = {(r.id_a, r.id_b): r.dist for r in pairs}
    assert got[(1, 4)] == 0  # exact duplicate pair included
    assert got[(1, 2)] == 1
    assert (2, 3) in got
    # cross-block pair absent even at tiny distance budget
    assert all(
        not ((a in (1, 2, 3, 4)) and b == 7) for (a, b) in got
    )
    # distance > 2 absent: red widget vs aaaa widget is lev 3
    assert (1, 10) not in got


def test_every_row_labeled_once(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.entity import (
        resolve_entities,
    )

    out = resolve_entities(_parts(spark), "id", "name")
    assert out.count() == _parts(spark).count()
    assert out.select("id").distinct().count() == out.count()


# ---------------------------------------------------------------------------
# golden_record
# ---------------------------------------------------------------------------


def test_golden_record_latest_non_null_per_field(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.entity import (
        golden_record,
    )

    rows = [
        # key, order, phone, email
        (1, 10, "111", None),
        (1, 20, None, "a@x"),   # newer but NULL phone: phone stays 111
        (1, 30, "333", None),   # newest phone wins
        (2, 10, None, None),    # all null: fields stay NULL
        (3, 10, "900", "z@x"),
    ]
    df = spark.createDataFrame(rows, ["k", "o", "phone", "email"])
    got = {
        r.k: (r.n_versions, r.last_seen, r.phone, r.email)
        for r in golden_record(df, "k", "o", ["phone", "email"]).collect()
    }
    assert got[1] == (3, 30, "333", "a@x")
    assert got[2] == (1, 10, None, None)
    assert got[3] == (1, 10, "900", "z@x")


def test_golden_record_tie_breaks_by_value(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.entity import (
        golden_record,
    )

    df = spark.createDataFrame(
        [(1, 10, "b"), (1, 10, "a")], ["k", "o", "v"]
    )
    got = golden_record(df, "k", "o", ["v"]).collect()[0]
    assert got.v == "b"  # max value on equal order
