"""Margin-based bitext mining (operators/bitext) on planted parallel
pairs."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


@pytest.fixture(scope="module")
def corpora(spark):
    """8 planted parallel pairs (same direction + small noise) plus 12
    unaligned distractors per side, 16-dim."""
    rng = random.Random(11)
    dirs = [
        _unit([rng.gauss(0, 1) for _ in range(16)]) for _ in range(8)
    ]
    src_rows, tgt_rows = [], []
    for i, d in enumerate(dirs):
        src_rows.append((i, [float(x) for x in d]))
        noisy = _unit([x + rng.gauss(0, 0.05) for x in d])
        tgt_rows.append((1000 + i, [float(x) for x in noisy]))
    for j in range(12):
        src_rows.append((100 + j, _unit([rng.gauss(0, 1) for _ in range(16)])))
        tgt_rows.append((1100 + j, _unit([rng.gauss(0, 1) for _ in range(16)])))
    src = spark.createDataFrame(src_rows, ["vec_id", "embedding"])
    tgt = spark.createDataFrame(tgt_rows, ["vec_id", "embedding"])
    return src, tgt


def test_quantized_cosine_matches_true_cosine(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.bitext import (
        quantized_cosine,
    )

    a = [0.5, -0.25, 0.125, 0.75]
    b = [0.1, 0.9, -0.3, 0.2]
    true = sum(x * y for x, y in zip(a, b)) / (
        math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
    )
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    got = df.select(quantized_cosine(F.col("a"), F.col("b")).alias("c")).head().c
    assert got == pytest.approx(true, abs=1e-6)


def test_planted_pairs_are_mined_mutual_best(spark, corpora):
    from nifi_hive_schema_generator_bundle_spark.operators.bitext import (
        mine_bitext_pairs,
    )

    src, tgt = corpora
    got = {
        (r.src_id, r.tgt_id): r.margin
        for r in mine_bitext_pairs(
            src, tgt, k=3, threshold=1.0, mutual_best=True
        ).collect()
    }
    for i in range(8):
        assert (i, 1000 + i) in got, f"planted pair {i} missed"
        assert got[(i, 1000 + i)] > 1.0
    # no planted distractor pair should out-rank a true pair's slots
    for (s, t) in got:
        if s < 100:
            assert t == 1000 + s


def test_candidates_path_matches_exact_on_full_grid(spark, corpora):
    """Passing the full pair grid as candidates = the exact path (the
    ANN contract: same scoring, candidate-restricted neighborhoods)."""
    from nifi_hive_schema_generator_bundle_spark.operators.bitext import (
        mine_bitext_pairs,
    )

    src, tgt = corpora
    grid = src.select(F.col("vec_id").alias("src_id")).crossJoin(
        tgt.select(F.col("vec_id").alias("tgt_id"))
    )
    a = sorted(
        (r.src_id, r.tgt_id, r.cos, r.margin)
        for r in mine_bitext_pairs(
            src, tgt, k=3, threshold=1.0, mutual_best=True
        ).collect()
    )
    b = sorted(
        (r.src_id, r.tgt_id, r.cos, r.margin)
        for r in mine_bitext_pairs(
            src, tgt, k=3, threshold=1.0, mutual_best=True, candidates=grid
        ).collect()
    )
    assert a == b  # bit-equal: same quantized expressions either way


def test_margin_demotes_hub_vectors(spark):
    """A hub (close to everything on the other side) scores high cosine
    but low margin — the reason ratio margin exists."""
    from nifi_hive_schema_generator_bundle_spark.operators.bitext import (
        bitext_margin_scores,
    )

    base = _unit([1.0] * 8)
    # hub src 0 is moderately close to every tgt; src 1 has one sharp match
    rng = random.Random(3)
    src = spark.createDataFrame(
        [(0, base), (1, _unit([1, -1, 1, -1, 1, -1, 1, -1.0]))],
        ["vec_id", "embedding"],
    )
    tgts = []
    for j in range(6):
        tgts.append((10 + j, _unit([1 + rng.gauss(0, 0.2) for _ in range(8)])))
    tgts.append((20, _unit([1, -1, 1, -1, 1, -1, 1, -1.02])))
    tgt = spark.createDataFrame(tgts, ["vec_id", "embedding"])
    rows = bitext_margin_scores(src, tgt, k=3).collect()
    hub_best = max(
        (r for r in rows if r.src_id == 0), key=lambda r: r.margin
    )
    sharp = max((r for r in rows if r.src_id == 1), key=lambda r: r.margin)
    assert sharp.margin > hub_best.margin
    assert sharp.tgt_id == 20


def test_lsh_candidates_always_include_identical_vectors(spark, corpora):
    """An exact-duplicate pair projects to identical signs on EVERY
    plane, so it shares ALL bands — banded LSH can never miss it. The
    noisy planted pairs are near-identical, so the 2x4-bit banding
    should also recover most of them (recall sanity, deterministic:
    pinned planes, no RNG at query time)."""
    from nifi_hive_schema_generator_bundle_spark.operators.bitext import (
        lsh_bitext_candidates,
    )

    src, tgt = corpora
    # clone src 0's vector verbatim onto the tgt side as id 2000
    dup = src.filter(F.col("vec_id") == 0).select(
        F.lit(2000).alias("vec_id"), F.col("embedding")
    )
    cands = lsh_bitext_candidates(
        src, tgt.unionByName(dup), n_planes=8, band_bits=4, dim=16
    )
    got = {(r.src_id, r.tgt_id) for r in cands.collect()}
    assert (0, 2000) in got  # exact duplicate: guaranteed collision
    planted = sum((i, 1000 + i) in got for i in range(8))
    assert planted >= 6, f"banding recovered only {planted}/8 planted pairs"


def test_lsh_candidates_restrict_and_match_exact_on_survivors(spark, corpora):
    """Mining over LSH candidates returns a SUBSET of the exact path's
    scored pairs, and every planted pair surviving candidate generation
    is still mined mutual-best (the rescoring is unchanged)."""
    from nifi_hive_schema_generator_bundle_spark.operators.bitext import (
        lsh_bitext_candidates,
        mine_bitext_pairs,
    )

    src, tgt = corpora
    cands = lsh_bitext_candidates(src, tgt, n_planes=8, band_bits=4, dim=16)
    cand_set = {(r.src_id, r.tgt_id) for r in cands.collect()}
    n_all = src.count() * tgt.count()
    assert 0 < len(cand_set) < n_all  # a real restriction, not the grid
    mined = {
        (r.src_id, r.tgt_id)
        for r in mine_bitext_pairs(
            src, tgt, k=3, threshold=1.0, mutual_best=True, candidates=cands
        ).collect()
    }
    assert mined <= cand_set  # never scores outside the candidate set
    recovered = {(i, 1000 + i) for i in range(8)} & cand_set
    assert recovered <= mined, "a surviving planted pair was not mined"


def test_candidate_neighborhood_stats(spark):
    """The banding health check: a 2-candidate src is starved at k=4,
    a 5-candidate src is not; counts and ppm are exact integers."""
    from nifi_hive_schema_generator_bundle_spark.operators.bitext import (
        candidate_neighborhood_stats,
    )

    pairs = [("a", f"t{i}") for i in range(5)] + [("b", "t0"), ("b", "t9")]
    cand = spark.createDataFrame(pairs, "src_id string, tgt_id string")
    r = candidate_neighborhood_stats(cand, k=4).collect()[0]
    assert r.n_pairs == 7 and r.n_src == 2 and r.n_tgt == 6
    assert r.min_per_src == 2 and r.avg_per_src == 3.5
    assert r.starved_src_ppm == 500_000  # 1 of 2 srcs below k
    # every tgt has <4 candidates in this toy set
    assert r.starved_tgt_ppm == 1_000_000


def test_candidate_neighborhood_stats_counts_zero_candidate_ids(spark):
    """ADVICE r7 #2: an id that retrieved ZERO candidates never appears
    in the candidate set, so without the corpus frames it is invisible
    and starvation under-reports. With src/tgt passed, the id universe
    comes from the corpus and zero-candidate ids read as starved."""
    from nifi_hive_schema_generator_bundle_spark.operators.bitext import (
        candidate_neighborhood_stats,
    )

    pairs = [("a", f"t{i}") for i in range(5)]
    cand = spark.createDataFrame(pairs, "src_id string, tgt_id string")
    # corpus has 4 srcs; b, c, d retrieved nothing at all
    src = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "vec_id string"
    )
    tgt = spark.createDataFrame(
        [(f"t{i}",) for i in range(10)], "vec_id string"
    )
    blind = candidate_neighborhood_stats(cand, k=4).collect()[0]
    assert blind.n_src == 1 and blind.starved_src_ppm == 0  # the blind spot
    r = candidate_neighborhood_stats(cand, k=4, src=src, tgt=tgt).collect()[0]
    assert r.n_src == 4 and r.n_tgt == 10
    assert r.n_pairs == 5  # zero-rows don't inflate the pair count
    assert r.min_per_src == 0
    assert r.starved_src_ppm == 750_000  # 3 of 4 srcs retrieved nothing
    # 5 tgts got 1 candidate each, 5 got none -> all 10 below k=4
    assert r.starved_tgt_ppm == 1_000_000


def test_exact_target_cap_raises_with_actionable_error(spark, corpora, monkeypatch):
    """VERDICT r8 #6: the exact path's driver collect is bounded — a
    target side beyond the cap raises immediately (one limit(cap+1)
    probe job) with a 'pass candidates=' message instead of silently
    OOMing the driver on a corpus-sized target."""
    from nifi_hive_schema_generator_bundle_spark.operators import bitext

    src, tgt = corpora  # tgt has 20 rows
    monkeypatch.setattr(bitext, "_EXACT_TARGET_ROW_CAP", 5)
    with pytest.raises(ValueError, match="candidates="):
        bitext.bitext_margin_scores(src, tgt, k=3)
    # the candidates path is unaffected by the cap
    grid = src.select(F.col("vec_id").alias("src_id")).crossJoin(
        tgt.select(F.col("vec_id").alias("tgt_id"))
    )
    assert (
        bitext.bitext_margin_scores(src, tgt, k=3, candidates=grid).count()
        > 0
    )


def test_null_element_source_vector_scores_null_cos(spark):
    """ADVICE r8 #1: a source vector containing a NULL ELEMENT must
    score NULL cos on the Arrow path (the SQL fold's semantics — a NULL
    term folds the whole sum to NULL), never floor(NaN) int64 garbage.
    Non-finite elements (outside the quantization contract) route to
    the same NULL."""
    from nifi_hive_schema_generator_bundle_spark.operators.bitext import (
        bitext_margin_scores,
    )

    src = spark.createDataFrame(
        [
            (1, [0.6, 0.8]),
            (2, [0.6, None]),          # NULL element
            (3, [0.6, float("nan")]),  # non-finite element
        ],
        "vec_id long, embedding array<double>",
    )
    tgt = spark.createDataFrame(
        [(10, [0.6, 0.8]), (11, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = bitext_margin_scores(src, tgt, k=1).collect()
    cos_by_src = {}
    for r in rows:
        cos_by_src.setdefault(r.src_id, set()).add(
            None if r.cos is None else round(r.cos, 6)
        )
    assert cos_by_src[2] == {None}
    assert cos_by_src[3] == {None}
    assert None not in cos_by_src[1] and 1.0 in cos_by_src[1]
    # and the Arrow path's NULL matches the SQL candidates path's NULL
    # for the NULL-element row (bit-equality contract)
    grid = src.select(F.col("vec_id").alias("src_id")).crossJoin(
        tgt.select(F.col("vec_id").alias("tgt_id"))
    )
    sql_rows = bitext_margin_scores(src, tgt, k=1, candidates=grid).collect()
    sql_cos_2 = {r.cos for r in sql_rows if r.src_id == 2}
    assert sql_cos_2 == {None}


def test_null_element_target_vector_falls_back_to_sql_form(spark):
    """ADVICE r8 #1 (target side): any NULL/non-finite element in the
    target matrix routes the whole exact path to the bit-equal SQL
    form — good pairs keep exact cos, pairs against the degenerate
    target fold to NULL."""
    from nifi_hive_schema_generator_bundle_spark.operators.bitext import (
        bitext_margin_scores,
    )

    src = spark.createDataFrame(
        [(1, [0.6, 0.8])], "vec_id long, embedding array<double>"
    )
    tgt = spark.createDataFrame(
        [(10, [0.6, 0.8]), (11, [0.5, None])],
        "vec_id long, embedding array<double>",
    )
    rows = bitext_margin_scores(src, tgt, k=1).collect()
    by_tgt = {r.tgt_id: r.cos for r in rows}
    assert by_tgt[11] is None
    assert by_tgt[10] == pytest.approx(1.0, abs=1e-6)
