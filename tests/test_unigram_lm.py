"""Unigram-LM tokenizer (functions/unigram_lm): training on planted
corpora, hand-checked Viterbi, coverage and determinism properties."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [(i, "abab abab ab cd") for i in range(6)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_train_keeps_frequent_piece_and_all_chars(spark, tiny):
    from nifi_hive_schema_generator_bundle_spark.functions.unigram_lm import (
        train_unigram_vocab,
    )

    vocab = train_unigram_vocab(
        tiny, vocab_size=6, em_iters=1, max_piece_len=4
    )
    pieces = {p for p, _ in vocab}
    # every corpus character survives (coverage guarantee)
    assert {"a", "b", "c", "d"} <= pieces
    assert len(pieces) <= 6
    # the dominant repeated substring family is represented
    assert pieces & {"ab", "abab"}, pieces
    # probabilities normalize
    assert sum(math.exp(lp) for _, lp in vocab) == pytest.approx(1.0, abs=1e-9)


def test_viterbi_hand_checked(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.unigram_lm import (
        _viterbi,
    )

    lp = {"ab": math.log(0.4), "a": math.log(0.2), "b": math.log(0.2),
          "c": math.log(0.2)}
    # P(ab,ab) = 0.16 > P over any char split
    assert _viterbi("abab", lp, 8) == ["ab", "ab"]
    assert _viterbi("abc", lp, 8) == ["ab", "c"]
    # unseen char falls back to a penalized piece, never fails
    assert _viterbi("axb", lp, 8) == ["a", "x", "b"]
    assert _viterbi("", lp, 8) == []


def test_tokenize_and_stats(spark, tiny):
    from nifi_hive_schema_generator_bundle_spark.functions.unigram_lm import (
        train_unigram_vocab,
        unigram_token_stats,
        unigram_tokenize_words,
    )

    vocab = train_unigram_vocab(
        tiny, vocab_size=6, em_iters=1, max_piece_len=4
    )
    toks = {
        r.doc_id: r.pieces
        for r in unigram_tokenize_words(tiny, vocab).collect()
    }
    # each doc: 'abab abab ab cd' — reassembles exactly
    for pieces in toks.values():
        assert "".join(pieces) == "ababababab" + "cd"
    stats = unigram_token_stats(tiny, vocab).collect()
    for r in stats:
        assert r.n_words == 4
        assert r.n_pieces >= 4  # at least one piece per word
        assert r.fertility == pytest.approx(r.n_pieces / 4)


def test_training_deterministic_across_partitionings(spark, tiny):
    from nifi_hive_schema_generator_bundle_spark.functions.unigram_lm import (
        train_unigram_vocab,
    )

    a = train_unigram_vocab(
        tiny.coalesce(1), vocab_size=6, em_iters=1, max_piece_len=4
    )
    b = train_unigram_vocab(
        tiny.repartition(7), vocab_size=6, em_iters=1, max_piece_len=4
    )
    assert a == b  # exact equality incl. float logprobs


def test_train_on_documents_sample(spark, sf_smoke_dir):
    """End-to-end on the real documents table: trains, tokenizes, and
    fertility beats character-splitting."""
    from nifi_hive_schema_generator_bundle_spark.functions.unigram_lm import (
        train_unigram_vocab,
        unigram_token_stats,
    )

    docs = spark.read.parquet(f"{sf_smoke_dir}/documents.parquet").limit(60)
    vocab = train_unigram_vocab(
        docs, vocab_size=150, em_iters=1, max_piece_len=6
    )
    assert len(vocab) <= 150
    stats = unigram_token_stats(docs, vocab)
    row = stats.agg(
        F.avg("fertility").alias("f"),
        F.sum("n_pieces").alias("p"),
        F.sum("n_words").alias("w"),
    ).collect()[0]
    assert row.f >= 1.0
    # multi-char pieces learned => strictly better than char splitting
    avg_word_len = (
        docs.select(
            F.avg(
                F.length(F.regexp_replace("text", r"\s+", ""))
            ).alias("c")
        ).collect()[0].c
    )
    assert row.p < avg_word_len * 60  # fewer pieces than characters
