"""Pareto frontier (operators/skyline): planted dominance cases vs a
brute-force quadratic check."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F


def _brute(points):
    out = []
    for i, (c, b) in points:
        dominated = any(
            qc <= c and qb >= b and (qc < c or qb > b)
            for j, (qc, qb) in points
            if j != i
        )
        if not dominated:
            out.append(i)
    return sorted(out)


def _run(spark, rows):
    from nifi_hive_schema_generator_bundle_spark.operators.skyline import (
        pareto_frontier,
    )

    df = spark.createDataFrame(rows, ["id", "cost", "benefit"])
    got = sorted(
        r.id
        for r in pareto_frontier(df, "cost", "benefit").collect()
    )
    pts = [(i, (c, b)) for i, c, b in rows if c is not None and b is not None]
    assert got == _brute(pts)
    return got


def test_planted_frontier(spark):
    got = _run(
        spark,
        [
            (1, 1.0, 10),  # frontier: cheapest
            (2, 2.0, 20),  # frontier
            (3, 2.5, 15),  # dominated by 2 (cheaper, bigger)
            (4, 3.0, 20),  # dominated by 2 (same benefit, pricier)
            (5, 3.0, 30),  # frontier
            (6, 1.0, 5),   # dominated by 1 (same cost, smaller)
        ],
    )
    assert got == [1, 2, 5]


def test_duplicates_both_survive_and_same_cost_ties(spark):
    got = _run(
        spark,
        [
            (1, 1.0, 10),
            (2, 1.0, 10),  # exact duplicate: neither dominates
            (3, 1.0, 9),   # dominated within its own cost level
            (4, 0.5, 10),  # strictly cheaper, same benefit: kills 1,2
        ],
    )
    assert got == [4]


def test_duplicate_frontier_points_kept(spark):
    got = _run(spark, [(1, 1.0, 10), (2, 1.0, 10), (3, 2.0, 5)])
    assert got == [1, 2]


def test_nulls_dropped_and_keep_col_mode(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.skyline import (
        pareto_frontier,
    )

    df = spark.createDataFrame(
        [(1, 1.0, 10), (2, None, 99), (3, 2.0, None), (4, 2.0, 5)],
        ["id", "cost", "benefit"],
    )
    out = pareto_frontier(df, "cost", "benefit", keep_col="on_frontier")
    rows = {r.id: r.on_frontier for r in out.collect()}
    assert rows == {1: True, 4: False}


def test_random_grid_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, float(rng.randint(0, 9)), rng.randint(0, 9)) for i in range(80)
    ]
    _run(spark, rows)
