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
