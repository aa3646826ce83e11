"""asof_join / range_join semantics on hand-built frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.operators.joins import (
    asof_join,
    range_join,
)


def _asof(spark, tolerance=None):
    left = spark.createDataFrame(
        [(1, 10, "o1"), (1, 20, "o2"), (2, 15, "o3"), (3, 5, "o4")],
        "k int, t int, name string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 12, 101, "b"), (2, 15, 102, "c"),
         (2, 16, 103, "d"), (9, 1, 104, "e")],
        "k int, t int, eid int, tag string",
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_payload=["eid", "tag"], tolerance=tolerance, prefix="m_",
    )
    return {r["name"]: (r["m_eid"], r["m_tag"]) for r in out.collect()}


def test_asof_backward_with_boundary_and_outer(spark):
    got = _asof(spark)
    assert got["o1"] == (100, "a")  # boundary: right at exactly left_time matches
    assert got["o2"] == (101, "b")  # latest prior, not just any prior
    assert got["o3"] == (102, "c")  # per-key isolation (103 is later)
    assert got["o4"] == (None, None)  # no match -> left-outer NULLs


def test_asof_tolerance(spark):
    got = _asof(spark, tolerance=F.lit(5))
    assert got["o1"] == (100, "a")   # staleness 0 <= 5
    assert got["o2"] == (None, None)  # staleness 8 > 5 -> nulled
    assert got["o3"] == (102, "c")


def test_asof_tie_resolves_to_max_payload(spark):
    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 10, 7, "lo"), (1, 10, 9, "hi")], "k int, t int, eid int, tag string"
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_payload=["eid", "tag"],
    ).collect()
    assert (out[0]["eid"], out[0]["tag"]) == (9, "hi")


def test_range_join_matches_naive(spark):
    pts = spark.createDataFrame(
        [(i, float(i * 7 % 50)) for i in range(40)], "pid int, t double"
    )
    ivs = spark.createDataFrame(
        [(j, float(j * 5), float(j * 5 + 8)) for j in range(10)],
        "iid int, lo double, hi double",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            pts, ivs, left_time="t", right_start="lo", right_end="hi",
            bucket=F.lit(8),
        ).collect()
    )
    want = sorted(
        (r["pid"], r["iid"])
        for r in pts.crossJoin(ivs)
        .filter((F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")))
        .collect()
    )
    assert got == want and len(got) > 0


def test_range_join_negative_coordinates(spark):
    # points and intervals straddling zero: floor-tiling must keep every
    # bucket the declared width (truncation would double the bucket that
    # straddles zero) and the results must still match the naive join
    pts = spark.createDataFrame(
        [(i, float(i * 7 % 50) - 25.0) for i in range(40)], "pid int, t double"
    )
    ivs = spark.createDataFrame(
        [(j, float(j * 5) - 25.0, float(j * 5 - 17.0)) for j in range(10)],
        "iid int, lo double, hi double",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            pts, ivs, left_time="t", right_start="lo", right_end="hi",
            bucket=F.lit(8),
        ).collect()
    )
    want = sorted(
        (r["pid"], r["iid"])
        for r in pts.crossJoin(ivs)
        .filter((F.col("t") >= F.col("lo")) & (F.col("t") < F.col("hi")))
        .collect()
    )
    assert got == want and len(got) > 0


def test_salted_join_matches_plain_join(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.partitioning import (
        salted_join,
    )

    # heavily skewed: 90% of left rows share key 0
    big = spark.createDataFrame(
        [(i, 0 if i % 10 else i % 7) for i in range(1000)], "rid int, k int"
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(7)], "k int, name string")
    plain = {(r["rid"], r["name"]) for r in big.join(small, "k").collect()}
    salted = {
        (r["rid"], r["name"])
        for r in salted_join(big, small, "k", n_salts=8).collect()
    }
    assert salted == plain

    # left join keeps unmatched big rows exactly once
    small2 = small.filter(F.col("k") < 3)
    plain_l = sorted(
        (r["rid"], r["name"]) for r in big.join(small2, "k", "left").collect()
    )
    salted_l = sorted(
        (r["rid"], r["name"])
        for r in salted_join(big, small2, "k", how="left", n_salts=8).collect()
    )
    assert salted_l == plain_l


def _interval_naive(l, r, closed):
    if closed:
        c = (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le"))
    else:
        c = (F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le"))
    return l.crossJoin(r).filter(c)


def test_interval_join_matches_naive_both_semantics(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.joins import (
        interval_join,
    )

    # irregular lengths (including zero-length and multi-bucket spans)
    left = spark.createDataFrame(
        [(i, float(i * 11 % 97), float(i * 11 % 97 + i % 13)) for i in range(60)],
        "lid int, ls double, le double",
    )
    right = spark.createDataFrame(
        [(j, float(j * 17 % 89), float(j * 17 % 89 + (j % 5) * 6)) for j in range(25)],
        "rid int, rs double, re double",
    )
    for closed in (False, True):
        got = sorted(
            (r["lid"], r["rid"])
            for r in interval_join(
                left, right, left_start="ls", left_end="le",
                right_start="rs", right_end="re",
                bucket=F.lit(7.0), closed=closed,
            ).collect()
        )
        want = sorted(
            (r["lid"], r["rid"])
            for r in _interval_naive(left, right, closed).collect()
        )
        assert got == want and len(got) > 0
        # first-shared-tile claim: each overlapping pair exactly once
        assert len(got) == len(set(got))


def test_interval_join_zero_length_and_touching(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.joins import (
        interval_join,
    )

    left = spark.createDataFrame(
        [(1, 10.0, 10.0), (2, 0.0, 5.0)], "lid int, ls double, le double"
    )
    right = spark.createDataFrame(
        [(1, 10.0, 12.0), (2, 5.0, 8.0)], "rid int, rs double, re double"
    )
    half = sorted(
        (r["lid"], r["rid"])
        for r in interval_join(
            left, right, left_start="ls", left_end="le",
            right_start="rs", right_end="re", bucket=F.lit(4.0),
        ).collect()
    )
    # half-open: zero-length [10,10) is empty; touching [0,5)x[5,8) misses
    assert half == []
    closed = sorted(
        (r["lid"], r["rid"])
        for r in interval_join(
            left, right, left_start="ls", left_end="le",
            right_start="rs", right_end="re", bucket=F.lit(4.0),
            closed=True,
        ).collect()
    )
    # closed: the point interval lands on [10,12]'s start; 5 touches both
    assert closed == [(1, 1), (2, 2)]


# ---------------------------------------------------------------------------
# coalesce_intervals
# ---------------------------------------------------------------------------


def _coalesce(spark, rows, **kw):
    from nifi_hive_schema_generator_bundle_spark.operators.joins import (
        coalesce_intervals,
    )

    df = spark.createDataFrame(rows, ["k", "s", "e"])
    out = coalesce_intervals(df, "k", "s", "e", **kw).collect()
    return sorted((r.k, r.s, r.e, r.n_merged) for r in out)


def test_coalesce_intervals_swallowed_interval(spark):
    # [1,10] swallows [2,3]; [4,5] still inside; [11,12] separate.
    # lag(end) alone would wrongly reopen at [4,5] (prev end = 3).
    rows = [(1, 1, 10), (1, 2, 3), (1, 4, 5), (1, 11, 12)]
    assert _coalesce(spark, rows) == [(1, 1, 10, 3), (1, 11, 12, 1)]


def test_coalesce_intervals_touching_semantics(spark):
    rows = [(1, 1, 2), (1, 2, 3)]
    assert _coalesce(spark, rows, touching_merge=True) == [(1, 1, 3, 2)]
    assert _coalesce(spark, rows, touching_merge=False) == [
        (1, 1, 2, 1),
        (1, 2, 3, 1),
    ]


def test_coalesce_intervals_per_key_and_nulls(spark):
    rows = [(1, 1, 5), (2, 1, 5), (1, 3, 8), (None, 0, 9), (2, 99, 100)]
    got = _coalesce(spark, rows)
    assert got == [(1, 1, 8, 2), (2, 1, 5, 1), (2, 99, 100, 1)]


def test_coalesce_intervals_brute_force_random(spark):
    import random

    rng = random.Random(3)
    rows = []
    for k in (1, 2):
        for _ in range(40):
            s = rng.randint(0, 100)
            rows.append((k, s, s + rng.randint(0, 12)))

    def brute(key_rows):
        ivs = sorted((s, e) for _, s, e in key_rows)
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += 1
            else:
                merged.append([s, e, 1])
        return merged

    got = _coalesce(spark, rows)
    exp = sorted(
        (k, s, e, n)
        for k in (1, 2)
        for s, e, n in brute([r for r in rows if r[0] == k])
    )
    assert got == exp


def test_interval_join_negative_coordinates(spark):
    """Pre-1970-style negative coordinates tile with floor(), so the
    zero-straddling bucket keeps the documented fixed width and pairs
    whose first shared tile is negative are still claimed exactly once."""
    from nifi_hive_schema_generator_bundle_spark.operators.joins import (
        interval_join,
    )
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, -25, -5), (2, -3, 4), (3, 5, 9)], ["lid", "ls", "le"]
    )
    right = spark.createDataFrame(
        [(10, -30, -20), (11, -6, -1), (12, 2, 7)], ["rid", "rs", "re"]
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_join(
            left, right, left_start="ls", left_end="le",
            right_start="rs", right_end="re", bucket=F.lit(10),
        ).collect()
    )
    naive = sorted(
        (lr.lid, rr.rid)
        for lr in left.collect()
        for rr in right.collect()
        if lr.ls < rr.re and rr.rs < lr.le
    )
    assert got == naive  # exactly once per overlapping pair, no dups
