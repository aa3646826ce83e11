"""Unit tests: mixture reweighting and token-budget selection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
    hash_fraction,
    mixture_sample,
)
from nifi_hive_schema_generator_bundle_spark.operators.selection import (
    token_budget_select,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, "en" if i % 10 < 6 else ("fr" if i % 10 < 8 else "de"))
        for i in range(2000)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_hash_fraction_uniform_and_bounded(spark):
    df = spark.range(4000).select(hash_fraction(F.col("id")).alias("u"))
    stats = df.agg(
        F.min("u").alias("lo"), F.max("u").alias("hi"), F.avg("u").alias("mu")
    ).collect()[0]
    assert 0.0 <= stats["lo"] and stats["hi"] < 1.0
    assert 0.45 < stats["mu"] < 0.55


def test_mixture_hits_target_proportions(corpus):
    kept = mixture_sample(
        corpus, "lang", {"en": 0.5, "fr": 0.25, "de": 0.25}, key="doc_id"
    )
    counts = dict(
        kept.groupBy("lang").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    total = sum(counts.values())
    # feasible N: de has 400 docs at target 0.25 → N=1600
    assert total == pytest.approx(1600, rel=0.10)
    assert counts["en"] / total == pytest.approx(0.5, abs=0.06)
    assert counts["fr"] / total == pytest.approx(0.25, abs=0.05)
    assert counts["de"] / total == pytest.approx(0.25, abs=0.05)


def test_mixture_deterministic_across_layouts(corpus):
    t = {"en": 0.4, "fr": 0.3, "de": 0.3}
    a = set(
        r[0]
        for r in mixture_sample(corpus, "lang", t, key="doc_id")
        .select("doc_id")
        .collect()
    )
    b = set(
        r[0]
        for r in mixture_sample(corpus.repartition(13), "lang", t, key="doc_id")
        .select("doc_id")
        .collect()
    )
    assert a == b


def test_mixture_drops_untargeted_strata(corpus):
    kept = mixture_sample(corpus, "lang", {"en": 1.0}, key="doc_id")
    assert kept.select("lang").distinct().collect() == [("en",)]


def test_mixture_infeasible_when_target_stratum_absent(corpus):
    """A target stratum with no rows makes the mixture infeasible: the
    result is explicitly EMPTY, never a silently re-normalized mixture
    (e.g. en=0.5/xx=0.5 with zero xx rows must not return 100% en)."""
    kept = mixture_sample(
        corpus, "lang", {"en": 0.5, "xx_missing": 0.5}, key="doc_id"
    )
    assert kept.count() == 0


def test_mixture_rejects_bad_targets(corpus):
    with pytest.raises(ValueError):
        mixture_sample(corpus, "lang", {}, key="doc_id")
    with pytest.raises(ValueError):
        mixture_sample(corpus, "lang", {"en": 0.0}, key="doc_id")


@pytest.fixture(scope="module")
def scored_docs(spark):
    # quality spread via repetition: every doc is 60 tokens (length
    # saturated), doc i uses i+1 distinct words, so rep_score = (i+1)/60
    # and each doc lands in its own score bucket — no giant bucket that
    # would (correctly) exceed the whole budget by itself
    rows = [
        (i, " ".join(f"t{i}word{j % (1 + i // 2)}" for j in range(60)))
        for i in range(100)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_budget_never_overfilled(scored_docs):
    kept = token_budget_select(scored_docs, 2000)
    total = kept.agg(F.sum("n_tokens")).collect()[0][0]
    assert total is not None and total <= 2000


def test_budget_prefers_higher_quality(scored_docs):
    kept = token_budget_select(scored_docs, 2000)
    worst_kept = kept.agg(F.min("bucket")).collect()[0][0]
    dropped = scored_docs.join(kept.select("doc_id"), "doc_id", "left_anti")
    best_dropped = (
        token_budget_select(scored_docs, 10**9)  # score everything
        .join(dropped.select("doc_id"), "doc_id")
        .agg(F.max("bucket"))
        .collect()[0][0]
    )
    if best_dropped is not None:
        # boundary bucket may tie; nothing dropped may beat the kept floor
        assert best_dropped <= worst_kept


def test_budget_zero_and_huge(scored_docs):
    assert token_budget_select(scored_docs, 0).count() == 0
    assert token_budget_select(scored_docs, 10**9).count() == 100


def test_budget_rejects_negative(scored_docs):
    with pytest.raises(ValueError):
        token_budget_select(scored_docs, -1)


class TestDsirImportanceWeights:
    """Planted-domain tests for selection.dsir_importance_weights."""

    @pytest.fixture(scope="class")
    def weighted(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.selection import (
            dsir_importance_weights,
        )

        # Target docs speak "alpha beta gamma ..."; off-domain docs speak
        # "zig zag zog ..."; probe docs mix. A raw doc written in the
        # target's vocabulary must outscore one written off-domain.
        tgt = "alpha beta gamma delta epsilon zeta eta theta"
        off = "zig zag zog zip zap zup zim zum"
        rows = (
            [(i, tgt, True) for i in range(20)]
            + [(100 + i, off, False) for i in range(20)]
            + [(200, tgt, False), (201, off, False), (202, "solo", False)]
        )
        df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
        out = dsir_importance_weights(df, F.col("is_t"))
        return {r["doc_id"]: r for r in out.collect()}

    def test_target_lookalike_outscores_off_domain(self, weighted):
        assert weighted[200]["dsir_weight"] > weighted[201]["dsir_weight"]
        # and the gap is the whole point: strictly positive vs negative
        assert weighted[200]["dsir_weight"] > 0
        assert weighted[201]["dsir_weight"] < 0

    def test_short_doc_null_weight(self, weighted):
        assert weighted[202]["n_bigrams"] == 0
        assert weighted[202]["dsir_weight"] is None

    def test_one_row_per_input_doc(self, weighted):
        assert len(weighted) == 43
        assert weighted[200]["n_bigrams"] == 7

    def test_weight_is_partitioning_independent(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.selection import (
            dsir_importance_weights,
        )

        rows = [
            (i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(12)), i % 3 == 0)
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
        a = {
            r["doc_id"]: r["dsir_weight"]
            for r in dsir_importance_weights(df.coalesce(1), F.col("is_t")).collect()
        }
        b = {
            r["doc_id"]: r["dsir_weight"]
            for r in dsir_importance_weights(
                df.repartition(16), F.col("is_t")
            ).collect()
        }
        assert a == b

    def test_rejects_bad_params(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.selection import (
            dsir_importance_weights,
        )

        df = spark.createDataFrame([(1, "a b", True)], "doc_id long, text string, is_t boolean")
        with pytest.raises(ValueError):
            dsir_importance_weights(df, F.col("is_t"), n_buckets=0)
        with pytest.raises(ValueError):
            dsir_importance_weights(df, F.col("is_t"), alpha=0.0)


class TestDsirSample:
    def test_keeps_at_most_n_and_prefers_high_weight(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.selection import (
            dsir_sample,
        )

        tgt_text = "alpha beta gamma delta epsilon zeta"
        off_text = "zig zag zog zip zap zup"
        rows = (
            [(i, tgt_text, True) for i in range(10)]
            + [(200 + i, tgt_text, False) for i in range(30)]
            + [(400 + i, off_text, False) for i in range(30)]
            + [(900, "solo", False)]
        )
        df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
        kept = dsir_sample(df, F.col("is_t"), 30).collect()
        assert 0 < len(kept) <= 30
        ids = {r["doc_id"] for r in kept}
        assert 900 not in ids  # <2 tokens -> NULL weight -> never kept
        # Gumbel noise spans a few units; the ~13-unit weight gap between
        # on/off-domain docs dominates, so kept docs skew to the lookalikes
        on_domain = sum(1 for i in ids if i < 400)
        assert on_domain > len(ids) * 0.7

    def test_deterministic_across_partitionings(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.selection import (
            dsir_sample,
        )

        rows = [
            (i, " ".join(f"w{(i * 5 + j) % 11}" for j in range(10)), i % 4 == 0)
            for i in range(80)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
        a = sorted(
            r["doc_id"] for r in dsir_sample(df.coalesce(1), F.col("is_t"), 25).collect()
        )
        b = sorted(
            r["doc_id"]
            for r in dsir_sample(df.repartition(16), F.col("is_t"), 25).collect()
        )
        assert a == b and len(a) <= 25

    def test_zero_keep_and_bad_params(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.selection import (
            dsir_sample,
        )

        df = spark.createDataFrame(
            [(1, "a b c", True), (2, "a b c", False)],
            "doc_id long, text string, is_t boolean",
        )
        assert dsir_sample(df, F.col("is_t"), 0).count() == 0
        with pytest.raises(ValueError):
            dsir_sample(df, F.col("is_t"), -1)
        with pytest.raises(ValueError):
            dsir_sample(df, F.col("is_t"), 5, hist_buckets=0)


# ---------------------------------------------------------------------------
# perplexity_buckets (CCNet head/middle/tail banding)
# ---------------------------------------------------------------------------

class TestPerplexityBuckets:
    def test_per_group_banding(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.selection import (
            perplexity_buckets,
        )

        rows = [
            # lang en: scores 9 > 8 > 7 > 6 > 5 > 4 -> 2 per band
            (1, "en", 9.0), (2, "en", 8.0), (3, "en", 7.0),
            (4, "en", 6.0), (5, "en", 5.0), (6, "en", 4.0),
            # lang xx: its OWN head even though all scores are lower
            (7, "xx", 1.0), (8, "xx", 0.5), (9, "xx", 0.1),
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string, s double")
        got = {
            r.doc_id: r.bucket
            for r in perplexity_buckets(df, "s", group_col="lang").collect()
        }
        assert got == {
            1: "head", 2: "head", 3: "middle", 4: "middle",
            5: "tail", 6: "tail",
            7: "head", 8: "middle", 9: "tail",
        }

    def test_lower_is_better_mode_and_ties(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.selection import (
            perplexity_buckets,
        )

        # raw perplexity: LOWER is better; equal scores tiebreak on id
        rows = [(1, "en", 5.0), (2, "en", 5.0), (3, "en", 80.0)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, p double")
        got = {
            r.doc_id: r.bucket
            for r in perplexity_buckets(
                df, "p", group_col="lang", higher_is_better=False
            ).collect()
        }
        assert got == {1: "head", 2: "middle", 3: "tail"}

    def test_rejects_single_label(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.selection import (
            perplexity_buckets,
        )

        df = spark.createDataFrame([(1, "en", 1.0)], "doc_id long, lang string, s double")
        with pytest.raises(ValueError):
            perplexity_buckets(df, "s", labels=("only",))
