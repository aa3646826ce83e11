"""Count-min sketch (operators/sketches): planted counts + the two
contracts that make it a sketch — overestimate-only and linearity."""

from __future__ import annotations

from pyspark.sql import functions as F


def _tokens(spark, rows):
    return spark.createDataFrame([(t,) for t in rows], ["tok"])


def _grid_dict(grid):
    return {(r.hash_row, r.bucket): r.cnt for r in grid.collect()}


def test_estimate_upper_bounds_exact(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.sketches import (
        cms_build,
        cms_lookup,
    )

    data = ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + [f"rare{i}" for i in range(30)]
    df = _tokens(spark, data)
    # width 8 forces collisions: estimates must still never undercount
    grid = cms_build(df, "tok", depth=4, width=8)
    cand = df.groupBy("tok").agg(F.count(F.lit(1)).alias("exact"))
    out = cms_lookup(grid, cand, "tok", depth=4, width=8).collect()
    assert len(out) == 33
    assert all(r.est_count >= r.exact for r in out)
    got = {r.tok: r.est_count for r in out}
    assert got["a"] >= 50 and got["b"] >= 20


def test_wide_grid_is_exact_for_planted_tokens(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.sketches import (
        cms_build,
        cms_lookup,
    )

    df = _tokens(spark, ["x"] * 7 + ["y"] * 3)
    grid = cms_build(df, "tok", depth=4, width=4096)
    cand = _tokens(spark, ["x", "y"])
    got = {
        r.tok: r.est_count
        for r in cms_lookup(grid, cand, "tok", depth=4, width=4096).collect()
    }
    # 2 tokens in 4096 buckets: a collision in ALL 4 rows is (2/4096)^4
    assert got == {"x": 7, "y": 3}


def test_absent_key_estimates_zero_when_no_collision(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.sketches import (
        cms_build,
        cms_lookup,
    )

    grid = cms_build(_tokens(spark, ["only"]), "tok", depth=4, width=4096)
    got = cms_lookup(
        grid, _tokens(spark, ["never-seen"]), "tok", depth=4, width=4096
    ).collect()
    assert got[0].est_count == 0


def test_linearity_merge_of_halves_equals_whole(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.sketches import (
        cms_build,
        cms_merge,
    )

    a = _tokens(spark, ["p"] * 4 + ["q"] * 2 + ["r"])
    b = _tokens(spark, ["q"] * 5 + ["s"] * 3)
    whole = _tokens(spark, ["p"] * 4 + ["q"] * 7 + ["r"] + ["s"] * 3)
    merged = cms_merge(
        cms_build(a, "tok", depth=3, width=16),
        cms_build(b, "tok", depth=3, width=16),
    )
    direct = cms_build(whole, "tok", depth=3, width=16)
    assert _grid_dict(merged) == _grid_dict(direct)


def test_weighted_build_and_null_keys_skipped(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.sketches import (
        cms_build,
        cms_lookup,
    )

    df = spark.createDataFrame(
        [("a", 10), ("a", 5), (None, 99), ("b", 1)], ["tok", "w"]
    )
    grid = cms_build(df, "tok", depth=4, width=4096, weight_col="w")
    got = {
        r.tok: r.est_count
        for r in cms_lookup(
            grid, _tokens(spark, ["a", "b"]), "tok", depth=4, width=4096
        ).collect()
    }
    assert got == {"a": 15, "b": 1}
    # the NULL key contributed nothing anywhere
    total = grid.agg(F.sum("cnt")).collect()[0][0]
    assert total == 4 * 16


def test_join_size_estimate_upper_bounds_exact(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.sketches import (
        cms_build,
        cms_join_size_estimate,
    )

    a = _tokens(spark, ["k1"] * 3 + ["k2"] * 2 + ["k9"])
    b = _tokens(spark, ["k1"] * 4 + ["k2"] + ["k7"] * 5)
    # exact: 3*4 + 2*1 = 14 (k9/k7 don't match)
    ga = cms_build(a, "tok", depth=4, width=64)
    gb = cms_build(b, "tok", depth=4, width=64)
    est = cms_join_size_estimate(ga, gb, depth=4).collect()[0].est_join_size
    assert est >= 14
    # wide grid, 4 keys: collisions vanish -> estimate is exact
    ga_w = cms_build(a, "tok", depth=4, width=8192)
    gb_w = cms_build(b, "tok", depth=4, width=8192)
    est_w = cms_join_size_estimate(ga_w, gb_w, depth=4).collect()[0]
    assert est_w.est_join_size == 14


def test_join_size_estimate_disjoint_keys_zero(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.sketches import (
        cms_build,
        cms_join_size_estimate,
    )

    ga = cms_build(_tokens(spark, ["a", "b"]), "tok", depth=3, width=4096)
    gb = cms_build(_tokens(spark, ["c", "d"]), "tok", depth=3, width=4096)
    est = cms_join_size_estimate(ga, gb, depth=3).collect()[0]
    assert est.est_join_size == 0
