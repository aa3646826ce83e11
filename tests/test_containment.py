"""Directed containment θ-join (operators/dedup.containment_join):
planted sub-documents, asymmetry, duplicate-clique collapse, short/empty
docs, and the degenerate-corpus bound."""

from __future__ import annotations

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nifi_hive_schema_generator_bundle_spark.operators.dedup import (
    containment_join,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _pairs(df):
    return {
        (r["id_a"], r["id_b"]): r["containment"] for r in df.collect()
    }


def test_planted_subdocument_is_directed(spark):
    """A short doc quoted inside a long one: contained→container hits at
    1.0; the reverse direction fails the threshold — the asymmetry that
    motivates the operator."""
    quote = "the quick brown fox jumps over the lazy dog today"
    container = (
        "intro paragraph with completely different words here . "
        + quote
        + " closing remarks diverge entirely from the quoted passage text"
    )
    got = _pairs(
        containment_join(
            _docs(spark, [quote, container]), threshold=0.8, k=3
        )
    )
    assert got.get((0, 1)) == 1.0
    assert (1, 0) not in got


def test_unigram_mode_and_thresholding(spark):
    """Unigram sets with a known 3/4 containment: passes θ=0.7, fails
    θ=0.8 — the verify divide is by |Sa|, not the union."""
    a = "w1 w2 w3 w4"
    b = "w1 w2 w3 x1 x2 x3 x4 x5"
    lo = _pairs(
        containment_join(_docs(spark, [a, b]), threshold=0.7, k=None)
    )
    assert lo.get((0, 1)) == 0.75
    assert (1, 0) not in lo  # 3/8 < 0.7
    hi = _pairs(
        containment_join(_docs(spark, [a, b]), threshold=0.8, k=None)
    )
    assert (0, 1) not in hi


def test_duplicate_clique_expansion(spark):
    """Identical docs collapse to one representative, then re-expand:
    every ORDERED pair within the clique at 1.0, and cross pairs to a
    containing doc carried for every member."""
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    container = dup + " plus unrelated tail words stretching onwards forever"
    got = _pairs(
        containment_join(
            _docs(spark, [dup, dup, dup, container]), threshold=0.8, k=3
        )
    )
    # within-clique: 3·2 ordered pairs at 1.0
    for a in (0, 1, 2):
        for b in (0, 1, 2):
            if a != b:
                assert got[(a, b)] == 1.0
    # each member contained in the container
    for a in (0, 1, 2):
        assert got[(a, 3)] == 1.0
        assert (3, a) not in got


def test_short_docs_whole_text_granularity(spark):
    """Sub-k-token docs compare by their whole joined text as one
    shingle: identical short docs contain each other; different short
    docs don't pair."""
    got = _pairs(
        containment_join(
            _docs(spark, ["hi there", "hi there", "bye now"]),
            threshold=0.8,
            k=3,
        )
    )
    assert got[(0, 1)] == 1.0 and got[(1, 0)] == 1.0
    assert not any(2 in p for p in got)


def test_empty_docs_unigram_never_pair(spark):
    got = _pairs(
        containment_join(
            _docs(spark, ["", "", "words here"]), threshold=0.5, k=None
        )
    )
    assert got == {}


def test_degenerate_corpus_bounded(spark):
    """2000 identical short docs: candidate generation must stay at ONE
    representative (the collapse guard) — wall-time bounded and output
    exactly the 2000·1999 ordered clique (counted, not materialized)."""
    texts = ["same exact duplicated text body for everyone"] * 2000
    t0 = time.time()
    out = containment_join(_docs(spark, texts), threshold=0.8, k=3)
    n = out.count()
    took = time.time() - t0
    assert n == 2000 * 1999
    assert took < 120, f"degenerate corpus took {took:.0f}s"


def test_max_bucket_cap_drops_hot_tokens(spark):
    """With the cap forced to 1, a token shared by 3 DISTINCT sets is
    dropped from candidate generation — pairs vanish (the logged
    pathological regime) while max_bucket=None keeps them."""
    texts = [
        "shared token plus aaa bbb",
        "shared token plus ccc ddd",
        "shared token plus eee fff",
    ]
    exact = _pairs(
        containment_join(
            _docs(spark, texts), threshold=0.4, k=None, max_bucket=None
        )
    )
    assert exact  # 2/5 = 0.4 containment via 'shared token plus'
    capped = _pairs(
        containment_join(
            _docs(spark, texts), threshold=0.4, k=None, max_bucket=1
        )
    )
    assert capped == {}
