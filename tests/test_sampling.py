"""Deterministic hash split/sample (functions/sampling.py): stability
across partition layouts is the whole point — `df.sample` can't give it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
    hash_bucket,
    hash_sample,
    hash_split,
)


@pytest.fixture(scope="module")
def docs(spark, sf_smoke_dir):
    from nifi_hive_schema_generator_bundle_spark.plans.queries import load_table

    return load_table(spark, sf_smoke_dir, "documents").select("doc_id", "lang")


def test_split_survives_repartition(docs):
    a = {
        r.doc_id: r.split
        for r in hash_split(docs, "doc_id").select("doc_id", "split").collect()
    }
    b = {
        r.doc_id: r.split
        for r in hash_split(docs.repartition(17), "doc_id")
        .select("doc_id", "split")
        .collect()
    }
    assert a == b


def test_split_fraction_near_expected(docs):
    total = docs.count()
    held = hash_split(docs, "doc_id").filter(F.col("split") == "holdout").count()
    # 2/16 expected; allow wide tolerance on small corpora
    assert 0.04 < held / total < 0.22


def test_sample_is_subset_and_nested(docs):
    one = {r.doc_id for r in hash_sample(docs, "doc_id", sixteenths=1).collect()}
    four = {r.doc_id for r in hash_sample(docs, "doc_id", sixteenths=4).collect()}
    assert one <= four  # bucket< k is monotone in k: samples nest
    assert len(four) < docs.count()


def test_buckets_cover_range(docs):
    vals = {
        r.b for r in docs.select(hash_bucket("doc_id").alias("b")).collect()
    }
    assert vals <= set(range(16)) and len(vals) > 8


def test_bad_fraction_rejected(docs):
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", holdout_sixteenths=17)
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", sixteenths=-1)


def test_stratified_sample_rates_differ_by_stratum(docs):
    from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
        stratified_hash_sample,
    )

    before = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    after = {
        r.lang: r.n
        for r in stratified_hash_sample(docs, "doc_id", "lang", {"en": 4})
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # en downsampled to ~4/16; all other strata kept whole
    assert after["en"] < before["en"]
    for lang, n in before.items():
        if lang != "en":
            assert after[lang] == n
    # and the en subset is the same rows hash_sample(4/16) would pick
    from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
        hash_sample,
    )

    en_ids = {
        r.doc_id
        for r in stratified_hash_sample(docs, "doc_id", "lang", {"en": 4})
        .filter(F.col("lang") == "en")
        .collect()
    }
    expect = {
        r.doc_id
        for r in hash_sample(docs.filter(F.col("lang") == "en"), "doc_id", sixteenths=4).collect()
    }
    assert en_ids == expect


def test_stratified_bad_rate_rejected(docs):
    from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
        stratified_hash_sample,
    )

    with pytest.raises(ValueError):
        stratified_hash_sample(docs, "doc_id", "lang", {"en": 20})


def test_hash_bucket_matches_python_hashlib(spark):
    """The Spark md5 bucketing equals an independent Python hashlib
    reference — the cross-engine determinism contract, pinned against a
    third implementation (DuckDB being the second, in the oracle)."""
    import hashlib

    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                    max_size=8, unique=True))
    def check(keys):
        df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
        got = {
            r.doc_id: r.b
            for r in df.select(
                "doc_id", hash_bucket("doc_id").alias("b")
            ).collect()
        }
        for k in keys:
            expect = int(hashlib.md5(str(k).encode()).hexdigest()[0], 16)
            assert got[k] == expect

    check()


def test_exact_stratified_sample_counts_and_determinism(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
        exact_stratified_sample,
    )

    rows = [(i, "a" if i % 3 else "b") for i in range(90)]  # a:60, b:30
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = exact_stratified_sample(df, "lang", 40, key="doc_id")
    counts = dict(
        out.groupBy("lang").count().rdd.map(lambda r: (r[0], r[1])).collect()
    )
    assert counts == {"a": 40, "b": 30}  # capped at stratum size
    a = sorted(r[0] for r in out.select("doc_id").collect())
    b = sorted(
        r[0]
        for r in exact_stratified_sample(
            df.repartition(17), "lang", 40, key="doc_id"
        ).select("doc_id").collect()
    )
    assert a == b  # layout-independent


def test_exact_stratified_sample_rejects_negative(spark):
    import pytest as _pytest

    from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
        exact_stratified_sample,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id long, lang string")
    with _pytest.raises(ValueError):
        exact_stratified_sample(df, "lang", -1, key="doc_id")


# ---------------------------------------------------------------------------
# epoch_upsample (fractional repeat factors)
# ---------------------------------------------------------------------------

def test_epoch_upsample_copy_counts_and_determinism(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
        epoch_upsample,
    )

    rows = [(i, "hi" if i % 2 else "lo") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = epoch_upsample(df, "lang", {"hi": 2.5, "lo": 0.25}, key="doc_id")
    per = {
        (r["doc_id"]): r["n"]
        for r in out.groupBy("doc_id").agg(
            __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
        ).collect()
    }
    # hi rows appear 2 or 3 times; lo rows 0 (absent) or 1
    hi_counts = [per.get(i, 0) for i in range(1, 400, 2)]
    lo_counts = [per.get(i, 0) for i in range(0, 400, 2)]
    assert set(hi_counts) <= {2, 3} and 2 in hi_counts and 3 in hi_counts
    assert set(lo_counts) <= {0, 1} and 0 in lo_counts and 1 in lo_counts
    # expected totals: 200*2.5 = 500, 200*0.25 = 50 (binomial tolerance)
    assert abs(sum(hi_counts) - 500) < 40
    assert abs(sum(lo_counts) - 50) < 25
    # copy index is dense 0..n-1 per doc
    from pyspark.sql import functions as F
    bad = (
        out.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.max("copy_no").alias("m"),
             F.min("copy_no").alias("lo"))
        .filter((F.col("m") != F.col("n") - 1) | (F.col("lo") != 0))
        .count()
    )
    assert bad == 0
    # partition-layout independence
    again = epoch_upsample(
        df.repartition(13), "lang", {"hi": 2.5, "lo": 0.25}, key="doc_id"
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_epoch_upsample_drops_unlisted_strata_and_validates(spark):
    import pytest as _pytest

    from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
        epoch_upsample,
    )

    df = spark.createDataFrame(
        [(1, "keep"), (2, "drop")], "doc_id long, lang string"
    )
    out = epoch_upsample(df, "lang", {"keep": 2.0}, key="doc_id")
    got = [(r["doc_id"], r["copy_no"]) for r in out.collect()]
    assert sorted(got) == [(1, 0), (1, 1)]
    with _pytest.raises(ValueError):
        epoch_upsample(df, "lang", {"keep": -0.5}, key="doc_id")


class TestTemperatureSample:
    def _df(self, spark):
        from pyspark.sql import functions as F

        # 64 'en' rows, 4 'xx' rows: a heavy head and a rare tail
        rows = [(i, "en" if i < 64 else "xx") for i in range(68)]
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def test_alpha_one_is_identity(self, spark):
        from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
            temperature_sample,
        )

        out = temperature_sample(self._df(spark), "lang", alpha=1, key="doc_id")
        assert out.count() == 68

    def test_alpha_half_boosts_tail_share(self, spark):
        from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
            temperature_sample,
        )

        kept = (
            temperature_sample(self._df(spark), "lang", alpha=0.5, key="doc_id")
            .groupBy("lang")
            .count()
            .collect()
        )
        counts = {r["lang"]: r["count"] for r in kept}
        # natural tail share 4/68 ≈ 6%; tempered target is
        # sqrt(4)/(sqrt(64)+sqrt(4)) = 20% — the tail keeps everything
        # (rate 1) while the head is cut toward 4x the tail
        assert counts["xx"] == 4
        assert counts["en"] < 64
        tail_share = counts["xx"] / (counts["xx"] + counts["en"])
        assert tail_share > 4 / 68

    def test_alpha_zero_targets_uniform(self, spark):
        from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
            temperature_sample,
        )

        kept = (
            temperature_sample(self._df(spark), "lang", alpha=0, key="doc_id")
            .groupBy("lang")
            .count()
            .collect()
        )
        counts = {r["lang"]: r["count"] for r in kept}
        # uniform targets: feasible total = 2 * min-stratum; binomial
        # keep means head count lands NEAR the tail count, far from 64
        assert counts["xx"] == 4
        assert counts["en"] <= 16

    def test_partition_layout_invariance(self, spark):
        from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
            temperature_sample,
        )

        a = sorted(
            r["doc_id"]
            for r in temperature_sample(
                self._df(spark), "lang", alpha=0.5, key="doc_id"
            ).collect()
        )
        b = sorted(
            r["doc_id"]
            for r in temperature_sample(
                self._df(spark).repartition(13), "lang", alpha=0.5, key="doc_id"
            ).collect()
        )
        assert a == b

    def test_negative_alpha_raises(self, spark):
        import pytest

        from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
            temperature_sample,
        )

        with pytest.raises(ValueError):
            temperature_sample(self._df(spark), "lang", alpha=-1, key="doc_id")
