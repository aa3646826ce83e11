"""Round-4 operators: duplicate-span stats/removal, weighted sampling,
triangle counting, bigram LM scoring — planted-answer tests."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Row
from pyspark.sql import functions as F


def _u(key) -> float:
    """The md5 uniform used by functions/sampling.hash_fraction."""
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) / 2**32


# ---------------------------------------------------------------------------
# duplicate_span_stats / remove_duplicate_spans
# ---------------------------------------------------------------------------

SHARED = "the quick brown fox jumps over"  # 6 tokens -> two 5-gram positions


def _span_docs(spark):
    return spark.createDataFrame(
        [
            (1, SHARED + " alpha beta gamma delta epsilon"),
            (2, "zeta eta theta iota kappa " + SHARED),
            (3, "one two three four five six seven eight nine ten"),
            (4, "too short"),
        ],
        ["doc_id", "text"],
    )


def test_duplicate_span_stats_planted(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.dedup import (
        duplicate_span_stats,
    )

    out = {
        r["doc_id"]: r
        for r in duplicate_span_stats(_span_docs(spark), k=5).collect()
    }
    # docs 1 and 2 share the 6-token sentence -> its two 5-grams are
    # duplicated; interval union covers exactly the 6 shared tokens.
    for d in (1, 2):
        assert out[d]["n_dup_grams"] == 2
        assert out[d]["dup_tokens"] == 6
    assert out[1]["n_tokens"] == 11
    assert out[1]["dup_fraction"] == round(6 / 11, 6)
    # unique doc and sub-k doc: zero coverage, rows still present
    assert out[3]["dup_tokens"] == 0 and out[3]["n_dup_grams"] == 0
    assert out[4]["n_tokens"] == 2 and out[4]["dup_fraction"] == 0.0


def test_duplicate_span_stats_within_doc_repeat(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.dedup import (
        duplicate_span_stats,
    )

    # the 5-gram "a b c d e" occurs twice INSIDE one doc -> min_count=2
    # counts total occurrences, and the union of [0,5) and [5,10) is 10
    df = spark.createDataFrame(
        [(1, "a b c d e a b c d e")], ["doc_id", "text"]
    )
    row = duplicate_span_stats(df, k=5).collect()[0]
    assert row["n_dup_grams"] == 2
    assert row["dup_tokens"] == 10
    assert row["dup_fraction"] == 1.0


def test_duplicate_span_overlap_not_double_counted(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.dedup import (
        duplicate_span_stats,
    )

    # docs share a 7-token run -> three overlapping duplicated 5-grams
    # in each doc; union size is 7, not 15
    run = "alpha beta gamma delta epsilon zeta eta"
    df = spark.createDataFrame(
        [(1, run + " one"), (2, run + " two")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in duplicate_span_stats(df, k=5).collect()}
    assert out[1]["n_dup_grams"] == 3
    assert out[1]["dup_tokens"] == 7


def test_remove_duplicate_spans_first_occurrence_survives(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(_span_docs(spark), k=5).collect()
    }
    # doc 1 holds the globally-first occurrence (min doc_id, pos): intact
    assert out[1]["text"].startswith(SHARED)
    assert out[1]["n_kept"] == out[1]["n_tokens"] == 11
    # doc 2's copy of the shared sentence is excised, prefix survives
    assert SHARED not in out[2]["text"]
    assert out[2]["text"].startswith("zeta eta theta iota kappa")
    assert out[2]["n_kept"] == 5
    # untouched docs keep everything
    assert out[3]["n_kept"] == 10
    assert out[4]["n_kept"] == 2


# ---------------------------------------------------------------------------
# weighted_sample
# ---------------------------------------------------------------------------

def test_weighted_sample_matches_reference_formula(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
        weighted_sample,
    )

    rows = [(i, float(1 + (i % 7))) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = sorted(
        r["doc_id"]
        for r in weighted_sample(df, 10, weight_col="w", key="doc_id").collect()
    )
    expect = sorted(
        i for i, w in sorted(
            rows, key=lambda t: -(_u(t[0]) ** (1.0 / t[1]))
        )[:10]
    )
    assert got == expect


def test_weighted_sample_excludes_nonpositive_and_caps_n(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -4.0), (4, None), (5, 2.0)],
        ["doc_id", "w"],
    )
    got = sorted(
        r["doc_id"]
        for r in weighted_sample(df, 99, weight_col="w", key="doc_id").collect()
    )
    assert got == [1, 5]  # zero/negative/null weights excluded; n caps


def test_weighted_sample_partitioning_invariant(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
        weighted_sample,
    )

    rows = [(i, 1.0 + (i % 3)) for i in range(60)]
    a = spark.createDataFrame(rows, ["doc_id", "w"]).repartition(1)
    b = spark.createDataFrame(rows, ["doc_id", "w"]).repartition(16, "doc_id")
    sa = sorted(r["doc_id"] for r in weighted_sample(a, 7, weight_col="w", key="doc_id").collect())
    sb = sorted(r["doc_id"] for r in weighted_sample(b, 7, weight_col="w", key="doc_id").collect())
    assert sa == sb


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------

def test_triangle_count_planted(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.graph import (
        triangle_count,
    )

    # triangle 1-2-3, pendant 4, plus noise: reversed dup edge, self-loop
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 1), (3, 3), (3, 4)],
        ["src", "dst"],
    )
    out = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 0}


def test_triangle_count_k4_and_global_sum(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.graph import (
        triangle_count,
    )

    # complete graph K4: 4 triangles, each node in C(3,2)=3 of them
    edges = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        ["src", "dst"],
    )
    out = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}
    assert sum(out.values()) == 3 * 4


def test_triangle_count_empty_and_triangle_free(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.graph import (
        triangle_count,
    )

    # path graph: no triangles, every node reported with 0
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    out = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert out == {1: 0, 2: 0, 3: 0, 4: 0}


# ---------------------------------------------------------------------------
# bigram_logprob_score
# ---------------------------------------------------------------------------

def test_bigram_logprob_matches_reference_math(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.text import (
        bigram_logprob_score,
    )

    docs = [(1, "a b a b"), (2, "a b c"), (3, "x")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    # reference model computed by hand
    toks = {d: t.split() for d, t in docs}
    pairs = [
        (p, c) for t in toks.values() for p, c in zip(t, t[1:])
    ]
    c2: dict = {}
    for pc in pairs:
        c2[pc] = c2.get(pc, 0) + 1
    c1: dict = {}
    for (p, _), k in c2.items():
        c1[p] = c1.get(p, 0) + k
    cu: dict = {}
    for t in toks.values():
        for w in t:
            cu[w] = cu.get(w, 0) + 1
    total = sum(cu.values())
    lam = 0.9

    def score(d):
        t = toks[d]
        lps = [
            math.log(
                lam * c2[(p, c)] / c1[p] + (1 - lam) * cu[c] / total
            )
            for p, c in zip(t, t[1:])
        ]
        return round(sum(lps) / len(lps), 6)

    out = {r["doc_id"]: r for r in bigram_logprob_score(df, lam=lam).collect()}
    assert out[1]["n_bigrams"] == 3 and out[1]["lm2_score"] == score(1)
    assert out[2]["n_bigrams"] == 2 and out[2]["lm2_score"] == score(2)
    assert out[3]["n_bigrams"] == 0 and out[3]["lm2_score"] is None


def test_bigram_logprob_pure_mle_when_lam_1(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.text import (
        bigram_logprob_score,
    )

    # corpus where every bigram is deterministic: p = 1 everywhere, score 0
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], ["doc_id", "text"]
    )
    out = bigram_logprob_score(df, lam=1.0).collect()
    assert all(r["lm2_score"] == 0.0 for r in out)


# ---------------------------------------------------------------------------
# hard_negatives / reciprocal_rank_fusion
# ---------------------------------------------------------------------------

def test_hard_negatives_planted(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.similarity import (
        hard_negatives,
    )

    # anchor [1,0]: nearest other-label vectors are [0.9,0.1] (label 1)
    # then [0,1] (label 1); same-label [1,0.01] must NOT appear
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.01], 0),
        (2, [0.9, 0.1], 1),
        (3, [0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = hard_negatives(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    got = [(r["vec_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(2, 1), (3, 2)]
    assert all(r["label"] == 1 for r in out)


def test_hard_negatives_excludes_self_even_if_label_differs(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.similarity import (
        hard_negatives,
    )

    rows = [(0, [1.0, 0.0], 0), (1, [0.5, 0.5], 1)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = hard_negatives(df, df, k=5).collect()
    assert all(r["anchor_id"] != r["vec_id"] for r in out)
    assert len(out) == 2  # each anchor mines exactly the other vector


def test_rrf_fusion_math(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.similarity import (
        reciprocal_rank_fusion,
    )

    r1 = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)], ["query_id", "vec_id", "rank"]
    )
    r2 = spark.createDataFrame(
        [(0, 12, 1), (0, 11, 2), (0, 13, 3)], ["query_id", "vec_id", "rank"]
    )
    out = {
        r["vec_id"]: r["fused_rank"]
        for r in reciprocal_rank_fusion([r1, r2], k=4).collect()
    }
    # 11: 1/62+1/62 ; 12: 1/63+1/61 ; 10: 1/61 ; 13: 1/63
    # 1/62+1/62 = .032258; 1/63+1/61 = .032266 -> 12 beats 11
    assert out == {12: 1, 11: 2, 10: 3, 13: 4}


def test_rrf_requires_two_rankings(spark):
    import pytest as _pytest

    from nifi_hive_schema_generator_bundle_spark.operators.similarity import (
        reciprocal_rank_fusion,
    )

    r1 = spark.createDataFrame([(0, 1, 1)], ["query_id", "vec_id", "rank"])
    with _pytest.raises(ValueError):
        reciprocal_rank_fusion([r1])


def test_remove_duplicate_spans_keeps_fully_excised_docs(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    # doc 2 is an exact copy of doc 1: every token of doc 2 is inside a
    # duplicated non-first 5-gram occurrence, so its whole text is
    # excised — the row must survive with empty text, not vanish
    text = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in remove_duplicate_spans(df, k=5).collect()}
    assert set(out) == {1, 2}
    assert out[1]["text"] == text and out[1]["n_kept"] == 6
    assert out[2]["text"] == "" and out[2]["n_kept"] == 0
    assert out[2]["n_tokens"] == 6
