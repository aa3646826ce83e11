"""BPE tokenization: hand-computed merge behavior, fixture invariants,
and the Arrow-batched Spark operator."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nifi_hive_schema_generator_bundle_spark.functions.bpe import (
    PRETOKEN_RE,
    bpe_encode,
    bpe_encode_word,
    bpe_token_stats,
    fixture_merges,
    load_merges,
)

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "nifi_hive_schema_generator_bundle_spark",
    "data",
    "bpe_merges_fixture.txt",
)
FIXTURE_WORDS = [
    "agg", "batch", "column", "customer", "filter", "group", "hash", "join",
    "merge", "query", "small", "spark", "the", "value", "vector", "window",
]


def ranks_of(merges):
    return {p: i for i, p in enumerate(merges)}


# ---------------------------------------------------------------------------
# encoder semantics (hand-computed)
# ---------------------------------------------------------------------------

def test_greedy_picks_lowest_rank_first():
    # "abc": with (b,c) ranked below (a,b), greedy merges bc first,
    # leaving a + bc (the (a,b) merge can no longer apply)
    r = ranks_of([("b", "c"), ("a", "b")])
    assert bpe_encode_word("abc", r) == ["a", "bc"]
    # flipped ranks: ab forms first, then no (ab,c) merge exists
    r2 = ranks_of([("a", "b"), ("b", "c")])
    assert bpe_encode_word("abc", r2) == ["ab", "c"]


def test_chain_merges_to_single_token():
    r = ranks_of([("a", "b"), ("ab", "c"), ("abc", "d")])
    assert bpe_encode_word("abcd", r) == ["abcd"]
    # partial application on a longer word
    assert bpe_encode_word("abcde", r) == ["abcd", "e"]


def test_no_applicable_merges_yields_chars():
    assert bpe_encode_word("xyz", ranks_of([("a", "b")])) == ["x", "y", "z"]
    assert bpe_encode_word("", ranks_of([])) == []
    assert bpe_encode_word("q", ranks_of([])) == ["q"]


def test_repeated_pair_merges_left_to_right():
    # "aaaa" with (a,a): greedy min-rank ties break to the leftmost
    # occurrence -> aa + aa, then (aa,aa) only if ranked
    r = ranks_of([("a", "a")])
    assert bpe_encode_word("aaaa", r) == ["aa", "aa"]
    r2 = ranks_of([("a", "a"), ("aa", "aa")])
    assert bpe_encode_word("aaaa", r2) == ["aaaa"]


def test_pretokenizer_classes_and_boundaries():
    assert PRETOKEN_RE.findall("ab1 2cd, e-f") == [
        "ab", "1", "2", "cd", ",", "e", "-", "f"
    ]
    # merges never cross pre-token boundaries
    r = ranks_of([("a", "b")])
    assert bpe_encode("a b", r) == ["a", "b"]
    assert bpe_encode("ab ab", r) == ["ab", "ab"]


# ---------------------------------------------------------------------------
# fixture vocabulary invariants (what the gate oracle relies on)
# ---------------------------------------------------------------------------

def test_fixture_file_matches_generator():
    assert load_merges(FIXTURE) == fixture_merges(FIXTURE_WORDS)


def test_fixture_words_fully_merge_and_corpus_oov_stays_chars():
    """The doc_bpe_token_count oracle replays counts as: 1 token per
    fixture word, char count per other corpus word. Pin both halves
    against the real corpus vocabulary."""
    import duckdb

    ranks = ranks_of(load_merges(FIXTURE))
    for w in FIXTURE_WORDS:
        assert bpe_encode_word(w, ranks) == [w]
    sf_dir = os.path.join(
        os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
    )
    corpus = [
        w
        for (w,) in duckdb.sql(
            "SELECT DISTINCT w FROM "
            f"read_parquet('{sf_dir}/documents.parquet'), "
            "LATERAL unnest(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS t(w)"
        ).fetchall()
    ]
    assert corpus, "corpus vocabulary unexpectedly empty"
    for w in corpus:
        if w not in FIXTURE_WORDS:
            assert bpe_encode_word(w, ranks) == list(w), w


def test_fixture_partial_merges_outside_corpus():
    ranks = ranks_of(load_merges(FIXTURE))
    assert bpe_encode_word("customers", ranks) == ["customer", "s"]
    assert bpe_encode_word("thequery", ranks) == ["the", "query"]


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

def test_bpe_token_stats_counts(spark):
    merges = load_merges(FIXTURE)
    df = spark.createDataFrame(
        [
            (1, "the query window"),          # 3 vocab words -> 3 tokens
            (2, "fast table"),                # OOV -> 4 + 5 chars
            (3, "customers, 42"),             # customer+s + ',' + '42'->2 digits? no: '42' is one pretoken, no merges -> 2
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bpe_token_stats(df, merges).collect()}
    assert (out[1]["n_pretokens"], out[1]["n_bpe_tokens"]) == (3, 3)
    assert (out[2]["n_pretokens"], out[2]["n_bpe_tokens"]) == (2, 9)
    # customers -> [customer, s] = 2; ',' -> 1; '42' -> ['4','2'] = 2
    assert (out[3]["n_pretokens"], out[3]["n_bpe_tokens"]) == (3, 5)
    assert (out[4]["n_pretokens"], out[4]["n_bpe_tokens"]) == (0, 0)


def test_bpe_token_stats_is_single_arrow_stage(spark):
    merges = load_merges(FIXTURE)
    df = spark.createDataFrame([(1, "the query")], "doc_id long, text string")
    plan = (
        bpe_token_stats(df, merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan  # narrow: no shuffle anywhere


# ---------------------------------------------------------------------------
# trainer (differential vs the pure-Python Sennrich reference)
# ---------------------------------------------------------------------------

def _ref_train(texts, n_merges, min_freq=1):
    """Reference BPE trainer (Sennrich 2016 get_stats/merge_vocab):
    overlap-counted pair stats, (count DESC, left, right) tie-break,
    left-to-right non-overlapping merge application."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for pre in PRETOKEN_RE.findall(t):
            vocab[pre] += 1
    words = {w: list(w) for w in vocab if vocab[w] >= min_freq}
    freqs = {w: vocab[w] for w in words}
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += freqs[w]
        if not stats:
            break
        (left, right), cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


class TestTrainer:
    def test_differential_vs_reference(self, spark):
        from nifi_hive_schema_generator_bundle_spark.functions.bpe import bpe_train

        texts = [
            "the cat sat on the mat",
            "the batch query ran the spark batch",
            "aaa abab banana bandana",
            "lower lowest newer newest wider widest",
            "x",
            "",
        ]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = bpe_train(df, n_merges=15)
        want = _ref_train(texts, 15)
        assert got == want

    def test_consecutive_pairs_merge_left_to_right(self, spark):
        # "aaaa" must tokenize [aa, aa] after merge (a,a), not [aa, a, a]
        from nifi_hive_schema_generator_bundle_spark.functions.bpe import bpe_train

        df = spark.createDataFrame([("aaaa",)], "text string")
        got = bpe_train(df, n_merges=2)
        # round 1: (a,a) with 3 overlapping positions; round 2: (aa,aa)
        assert got == [("a", "a", 3), ("aa", "aa", 1)]

    def test_trained_table_drives_the_encoder(self, spark):
        from nifi_hive_schema_generator_bundle_spark.functions.bpe import bpe_train

        texts = ["merge the spark batch " * 3]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        merges = [(l, r) for l, r, _ in bpe_train(df, n_merges=30)]
        # every repeated word collapses to one token under its own table
        for w in ("merge", "the", "spark", "batch"):
            assert bpe_encode_word(w, ranks_of(merges)) == [w]

    def test_min_freq_prunes_rare_pretokens(self, spark):
        from nifi_hive_schema_generator_bundle_spark.functions.bpe import bpe_train

        texts = ["zz " + "qq " * 5]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = bpe_train(df, n_merges=1, min_freq=2)
        assert got == [("q", "q", 5)]  # zz (freq 1) never enters training


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------

def test_tokenizer_fertility_hand_computed(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.text import (
        tokenizer_fertility,
    )

    merges = load_merges(FIXTURE)
    rows = [
        # en: "the spark join" = 3 words, all vocab -> 3 BPE tokens
        (1, "en", "the spark join"),
        # en: "zzz qq" = 2 words, unmergeable -> 3 + 2 = 5 BPE tokens
        (2, "en", "zzz qq"),
        # xx: "ab" = 1 word -> 2 chars -> 2 BPE tokens, fertility 2.0
        (3, "xx", "ab"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.lang: r for r in tokenizer_fertility(df, merges).collect()}
    assert got["en"].n_docs == 2
    assert got["en"].n_words == 5
    assert got["en"].n_bpe_tokens == 8
    assert got["en"].fertility == 1.6
    assert (got["xx"].n_words, got["xx"].n_bpe_tokens, got["xx"].fertility) == (
        1, 2, 2.0,
    )


def test_tokenizer_fertility_zero_word_group_null(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.text import (
        tokenizer_fertility,
    )

    df = spark.createDataFrame(
        [(1, "yy", "   ")], "doc_id long, lang string, text string"
    )
    r = tokenizer_fertility(df, []).collect()[0]
    assert (r.n_docs, r.n_words, r.fertility) == (1, 0, None)
