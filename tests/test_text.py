"""Text-analysis operator tests (token stats, quality, lang-id, fingerprint)."""

from __future__ import annotations

import pytest

from nifi_hive_schema_generator_bundle_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat and the dog sat in a house"),
        (2, "der hund ist nicht ein kater und das haus"),
        (3, "x" * 400),
        (4, ""),
        (5, "word word word word word"),
        (6, "Hello, world! A test of 123 numbers... and punctuation?!"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_stats(spark, docs):
    got = {r.doc_id: r for r in token_stats(docs).collect()}
    assert got[1].ws_token_count == 9
    assert got[1].char_count == 34
    assert got[4].ws_token_count == 0
    assert got[6].bpe_token_count > got[6].ws_token_count  # punctuation split off


def test_quality_score_components(spark, docs):
    got = {r.doc_id: r for r in quality_score(docs).collect()}
    assert got[3].len_score == 1.0      # 400 chars saturates
    assert got[4].quality == 0.0        # empty doc bottoms out
    assert got[5].rep_score == pytest.approx(0.2)  # 1 distinct / 5 tokens
    assert 0.0 <= got[6].quality <= 1.0
    assert got[1].stop_score == 1.0     # 4/9 stopwords >> 10% cap


def test_language_id(spark, docs):
    got = {r.doc_id: r.pred_lang for r in language_id(docs).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[4] == "und"  # no tokens
    assert got[3] == "und"  # no stopword hits


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "  HELLO WORLD  "), (4, "other")],
        "doc_id long, text string",
    )
    got = fingerprint(df).collect()
    by_id = {r.doc_id: r for r in got}
    assert by_id[1].fp_md5 == by_id[2].fp_md5 == by_id[3].fp_md5
    assert by_id[4].fp_md5 != by_id[1].fp_md5
    assert by_id[1].fp_hash64 == by_id[2].fp_hash64


def test_no_python_udf_in_plans(spark, docs):
    # scale guard: these operators must stay JVM-side (SURVEY §4)
    for op in (token_stats, quality_score, language_id, fingerprint):
        plan = op(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sketch_stats_accuracy(spark, sf_correct_dir):
    """HLL distinct within 5% of exact; t-digest p50 within 5% of exact."""
    from nifi_hive_schema_generator_bundle_spark.plans.queries import QUERIES

    approx = {
        r["event_type"]: r
        for r in QUERIES["events_sketch_stats"](spark, sf_correct_dir).collect()
    }
    exact = {
        r["event_type"]: r
        for r in QUERIES["events_user_reach"](spark, sf_correct_dir).collect()
    }
    for et, row in approx.items():
        true_users = exact[et]["n_users"]
        assert abs(row["approx_users"] - true_users) <= max(2, 0.05 * true_users)
        assert row["approx_p50"] is not None and row["approx_p99"] >= row["approx_p50"]


class TestRedact:
    def test_planted_pii_scrubbed(self, spark):
        from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
            pattern_count,
            redact,
        )

        df = spark.createDataFrame(
            [
                ("mail me at bob.smith+x@example.co.uk today", 1, 0, 0),
                # pattern_count sees RAW text, so the digit inside the
                # URL counts; redact() still scrubs it as part of <URL>
                ("see https://a.example.com/p?q=1 and http://b.io", 0, 2, 1),
                ("call 555 1234 ok", 0, 0, 2),
                ("clean text only", 0, 0, 0),
            ],
            "text string, n_email int, n_url int, n_number int",
        )
        got = df.select(
            redact("text").alias("red"),
            pattern_count("text", "email").alias("e"),
            pattern_count("text", "url").alias("u"),
            pattern_count("text", "number").alias("n"),
            "n_email", "n_url", "n_number",
        ).collect()
        for r in got:
            assert (r.e, r.u, r.n) == (r.n_email, r.n_url, r.n_number)
            assert "@" not in r.red and "http" not in r.red
            import re as _re

            assert not _re.search(r"[0-9]", r.red)

    def test_email_redacted_before_numbers(self, spark):
        from nifi_hive_schema_generator_bundle_spark.functions.textfns import redact

        row = spark.createDataFrame([("a1b@x2y.com",)], "t string").select(
            redact("t").alias("red")
        ).collect()[0]
        # the email pattern wins; its digits never become <NUMBER>
        assert row.red == "<EMAIL>"

    def test_phone_and_ipv4_win_over_number_fallback(self, spark):
        from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
            pattern_count,
            redact,
        )

        df = spark.createDataFrame(
            [
                ("call 25-989-741-2988 from 192.168.0.1 re 42", 1, 1),
                # 5-digit group breaks the phone shape; ip needs 4 octets
                ("call 25-989-741-29881 from 192.168.0 re 42", 0, 0),
            ],
            "t string, n_phone int, n_ip int",
        )
        got = df.select(
            redact("t").alias("red"),
            pattern_count("t", "phone").alias("p"),
            pattern_count("t", "ip").alias("i"),
            "n_phone", "n_ip",
        ).collect()
        assert (got[0].p, got[0].i) == (1, 1)
        assert got[0].red == "call <PHONE> from <IP> re <NUMBER>"
        assert (got[1].p, got[1].i) == (0, 0)
        # the fallback still scrubs every digit of the near-misses
        import re as _re

        assert not _re.search(r"[0-9]", got[1].red)


def test_ngram_repetition_flags_looped_text(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.text import (
        ngram_repetition,
    )

    rows = [
        (1, "spam ham " * 10),          # "spam ham"/"ham spam" dominate
        (2, "all tokens here are fully distinct words okay"),
        (3, "one"),                      # too short for 2-grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in ngram_repetition(df).collect()}
    # doc 1: 20 tokens -> 19 2-grams; "spam ham" x10 wins
    assert got[1].n_2grams == 19 and got[1].top_2gram_n == 10
    assert got[1].top_2gram_frac > 0.5
    # doc 2: every 2-gram unique
    assert got[2].top_2gram_n == 1
    assert got[2].top_2gram_frac == round(1 / 7, 6)
    # doc 3: no 2-grams -> NULLs, row still present
    assert got[3].n_2grams is None and got[3].top_3gram_n is None


def test_unigram_logprob_ranks_rare_token_docs_lower(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.text import (
        unigram_logprob_score,
    )

    common = "the cat sat on the mat " * 5
    rows = [(i, common) for i in range(9)] + [(9, "zxqv wvuq qqzz xxyy")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scores = {
        r["doc_id"]: r["lm_score"]
        for r in unigram_logprob_score(df).collect()
    }
    assert scores[9] < scores[0]  # rare-token doc scores lower
    assert all(v < 0 for v in scores.values())  # log-probs are negative


def test_bm25_ranking_sanity(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.text import bm25_scores

    rows = [
        (0, "data model learning data model"),   # all terms, repeats
        (1, "data and some other words here"),   # one common term
        (2, "nothing relevant at all right"),    # no terms
        (3, "learning " + "filler " * 50),       # one term, long doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["bm25"] for r in bm25_scores(df, ["data", "model", "learning"]).collect()}
    assert 2 not in out                  # no-match docs absent
    assert out[0] > out[1]               # more matched terms → higher
    assert out[0] > out[3]               # length normalization penalizes filler
    assert all(v > 0 for v in out.values())


def test_bm25_rejects_empty_query(spark):
    import pytest as _pytest

    from nifi_hive_schema_generator_bundle_spark.operators.text import bm25_scores

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        bm25_scores(df, [])


def test_hashed_tf_vectors_buckets_and_norm(spark):
    import hashlib
    import math

    from nifi_hive_schema_generator_bundle_spark.operators.text import (
        hashed_tf_vectors,
    )

    rows = [(1, "spark spark batch"), (2, ""), (3, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["tf_vec"] for r in hashed_tf_vectors(df, dim=16).collect()}

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 16

    want = [0.0] * 16
    want[bucket("spark")] += 2
    want[bucket("batch")] += 1
    n = math.sqrt(sum(x * x for x in want))
    want = [round(x / n, 6) for x in want]
    assert got[1] == want
    assert abs(sum(x * x for x in got[1]) - 1.0) < 1e-6  # unit norm
    # token-free docs keep the zero vector (no divide-by-zero)
    assert got[2] == [0.0] * 16 and got[3] == [0.0] * 16


def test_hashed_tf_vectors_feed_ann(spark):
    """The hashed vectors plug straight into the ANN operators."""
    from pyspark.sql import functions as F

    from nifi_hive_schema_generator_bundle_spark.operators.similarity import (
        brute_force_topk,
    )
    from nifi_hive_schema_generator_bundle_spark.operators.text import (
        hashed_tf_vectors,
    )

    rows = [
        (1, "spark batch query"),
        (2, "spark batch query engine"),
        (3, "totally unrelated words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = hashed_tf_vectors(df, dim=32).withColumnRenamed("tf_vec", "embedding")
    q = vecs.filter("doc_id = 1").select(
        F.col("doc_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(
        vecs, q, k=2, vec_col="embedding", id_col="doc_id"
    ).collect()
    ordered = [r["doc_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert ordered == [1, 2]  # self first, near-paraphrase second


class TestSplitSentences:
    def _split(self, spark, text):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            split_sentences,
        )

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = split_sentences(df).collect()
        return [(r["sent_no"], r["sentence"]) for r in sorted(rows)]

    def test_basic_segmentation_dense_numbering(self, spark):
        out = self._split(spark, "Hi there. How are you?  Fine! trailing tail")
        assert out == [
            (0, "Hi there."),
            (1, "How are you?"),
            (2, "Fine!"),
            (3, "trailing tail"),
        ]

    def test_terminator_runs_stay_attached(self, spark):
        assert self._split(spark, "What?! Really...") == [
            (0, "What?!"),
            (1, "Really..."),
        ]

    def test_no_terminators_is_one_sentence(self, spark):
        assert self._split(spark, "no boundaries at all") == [
            (0, "no boundaries at all")
        ]

    def test_whitespace_only_segments_dropped(self, spark):
        # "a.   " leaves an all-space tail segment -> must not emit a row
        assert self._split(spark, "a.   ") == [(0, "a.")]

    def test_empty_doc_yields_no_rows(self, spark):
        assert self._split(spark, "") == []

    def test_digit_edges_survive_trim(self, spark):
        # regression: transform(F.trim) matched the 2-arg lambda form and
        # trimmed the element INDEX's digits off sentence edges
        assert self._split(spark, "0 zero. 1 one. 2 two.") == [
            (0, "0 zero."),
            (1, "1 one."),
            (2, "2 two."),
        ]


class TestSentenceDedup:
    def _dedup(self, spark, rows):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            sentence_dedup,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r["doc_id"]: (r["text"], r["n_sents"], r["n_kept"])
            for r in sentence_dedup(df).collect()
        }

    def test_boilerplate_dropped_from_later_docs(self, spark):
        out = self._dedup(spark, [
            (1, "Subscribe now. Real content one."),
            (2, "Subscribe now. Real content two."),
        ])
        assert out[1] == ("Subscribe now. Real content one.", 2, 2)
        assert out[2] == ("Real content two.", 2, 1)

    def test_fully_duplicate_doc_keeps_empty_row(self, spark):
        out = self._dedup(spark, [
            (1, "Only sentence here."),
            (2, "Only sentence here."),
        ])
        assert out[2] == ("", 1, 0)
        assert len(out) == 2

    def test_dedup_is_case_insensitive_but_keeps_original(self, spark):
        out = self._dedup(spark, [
            (1, "Hello World."),
            (2, "HELLO world."),
        ])
        assert out[1] == ("Hello World.", 1, 1)
        assert out[2] == ("", 1, 0)

    def test_within_doc_repeats_collapse(self, spark):
        out = self._dedup(spark, [(1, "Again. Again. Different.")])
        assert out[1] == ("Again. Different.", 3, 2)


class TestReadabilityStats:
    def _stats(self, spark, rows):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            readability_stats,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r["doc_id"]: (r["n_sents"], r["mean_sent_tokens"], r["ttr"])
            for r in readability_stats(df).collect()
        }

    def test_hand_computed(self, spark):
        out = self._stats(spark, [(1, "One two three. Four five? Six.")])
        # sentences: 3/2/1 tokens -> mean 2.0; 6 distinct of 6 -> ttr 1.0
        assert out[1] == (3, 2.0, 1.0)

    def test_repetition_lowers_ttr(self, spark):
        # tokens: spam, spam, spam, spam. -> distinct {spam, spam.} = 2/4
        out = self._stats(spark, [(1, "spam spam spam spam.")])
        assert out[1] == (1, 4.0, 0.5)

    def test_empty_doc(self, spark):
        out = self._stats(spark, [(1, "")])
        assert out[1] == (0, None, None)

    def test_case_insensitive_ttr(self, spark):
        out = self._stats(spark, [(1, "Word word WORD.")])
        # 'word.' differs from 'word' (punct attached) -> 2 distinct of 3
        assert out[1][2] == round(2 / 3, 6)


class TestBlocklistFilter:
    def _flag(self, spark, rows, bl, **kw):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            blocklist_filter,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return blocklist_filter(df, bl, **kw)

    def test_flags_and_counts_distinct_terms(self, spark):
        out = {
            r["doc_id"]: (r["blocked"], r["n_blocked_terms"])
            for r in self._flag(
                spark,
                [(1, "bad bad ugly fine"), (2, "all clean here")],
                ["bad", "ugly"],
            ).collect()
        }
        assert out[1] == (True, 2)   # distinct terms, not occurrences
        assert out[2] == (False, 0)

    def test_token_exact_no_scunthorpe(self, spark):
        out = {
            r["doc_id"]: r["blocked"]
            for r in self._flag(
                spark, [(1, "scunthorpe is a town")], ["thorpe", "horp"]
            ).collect()
        }
        assert out[1] is False  # substring never matches

    def test_case_insensitive(self, spark):
        out = self._flag(spark, [(1, "BAD day")], ["bad"]).collect()
        assert out[0]["blocked"] is True

    def test_drop_action(self, spark):
        kept = self._flag(
            spark,
            [(1, "bad stuff"), (2, "clean")],
            ["bad"],
            action="drop",
        ).collect()
        assert [r["doc_id"] for r in kept] == [2]
        assert "blocked" not in kept[0].asDict()

    def test_empty_blocklist_raises(self, spark):
        import pytest

        with pytest.raises(ValueError):
            self._flag(spark, [(1, "x")], [])


class TestLicenseDetect:
    def test_families_and_precedence(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            license_detect,
        )

        rows = [
            (1, "Permission is hereby granted, free of charge, to anyone."),
            (2, "This file is Licensed under the Apache License v2."),
            (3, "Redistribution and use in source and binary forms allowed."),
            (4, "Under the GNU Lesser General Public License v2.1."),
            (5, "Covered by the GNU General Public License."),
            # -nc must beat the plain cc-by substring it contains
            (6, "See creativecommons.org/licenses/by-nc/4.0/ for terms."),
            (7, "See creativecommons.org/licenses/by/4.0/ for terms."),
            (8, "See creativecommons.org/publicdomain/zero/1.0/."),
            (9, "no license text here at all"),
        ]
        df = spark.createDataFrame(rows, "id int, text string")
        out = {r.id: (r.license, r.permissive) for r in license_detect(df).collect()}
        assert out[1] == ("mit", True)
        assert out[2] == ("apache-2.0", True)
        assert out[3] == ("bsd", True)
        assert out[4] == ("lgpl", False)
        assert out[5] == ("gpl", False)
        assert out[6] == ("cc-by-nc", False)
        assert out[7] == ("cc-by", True)
        assert out[8] == ("cc0", True)
        assert out[9] == ("unknown", False)

    def test_case_insensitive_and_first_wins(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            license_detect,
        )

        # MIT phrase present alongside GPL: table order (mit first) wins
        both = (
            "PERMISSION IS HEREBY GRANTED, FREE OF CHARGE —"
            " also mentions the gnu general public license."
        )
        df = spark.createDataFrame([(1, both)], "id int, text string")
        r = license_detect(df).collect()[0]
        assert (r.license, r.permissive) == ("mit", True)

    def test_no_shuffle_no_udf(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            license_detect,
        )

        df = spark.createDataFrame([(1, "x")], "id int, text string")
        plan = license_detect(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan and "BatchEval" not in plan


class TestGopherQualityFlags:
    def test_planted_pass_and_fail_modes(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            gopher_quality_flags,
        )

        good = (
            "the quick brown fox jumps over that lazy dog and friends " * 6
        )
        bad_short = "tiny doc"
        bad_sym = ("the and that have with " + "# " * 30) * 4
        bullets = "\n".join(
            ["- item one the and"] * 9
            + ["regular line of text that have with the and of to be"]
        )
        df = spark.createDataFrame(
            [(1, good), (2, bad_short), (3, bad_sym), (4, bullets)],
            "id int, text string",
        )
        out = {r.id: r for r in gopher_quality_flags(df).collect()}
        assert out[1].passes_gopher  # clean prose
        assert out[1].word_count == 66 and out[1].n_stop == 18
        assert not out[2].passes_gopher  # too short
        assert not out[3].passes_gopher  # symbol-heavy, low alpha
        assert out[3].symbol_ratio > 0.1 and out[3].alpha_ratio < 0.8
        # bullet_ratio 0.9 passes THAT rule (<= 0.9) but the doc fails
        # on mean word length — components are reported independently
        assert out[4].bullet_ratio == 0.9 and not out[4].passes_gopher
        assert out[4].mean_word_len < 3.0

    def test_ellipsis_lines_and_ratio(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            gopher_quality_flags,
        )

        text = "\n".join(
            ["this line trails off the and that..."] * 2
            + ["a normal line with the and that of to be have with"] * 2
        )
        df = spark.createDataFrame([(1, text)], "id int, text string")
        r = gopher_quality_flags(df).collect()[0]
        assert r.ellipsis_ratio == 0.5
        # the '...' occurrences also count into symbol_ratio
        assert r.symbol_ratio > 0.0

    def test_no_shuffle_no_udf(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            gopher_quality_flags,
        )

        df = spark.createDataFrame([(1, "x")], "id int, text string")
        plan = (
            gopher_quality_flags(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan and "BatchEval" not in plan


class TestC4LineFilter:
    def test_line_rules_and_page_flags(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            c4_line_filter,
        )

        doc = "\n".join([
            "This is a proper sentence with enough words.",
            "short one.",  # < 5 words
            "this line talks about javascript frameworks today.",
            "no terminal punctuation on this line here",
            "Another good line ends with a question mark?",
            'A quoted line with plenty of words inside."',
        ])
        lorem = (
            "Lorem ipsum dolor sit amet sentence one."
            " And two more here! Or three?"
        )
        brace = (
            "A fine sentence with braces { inside it today."
            " Two sentences! Three now?"
        )
        few = "Just one single proper sentence with enough words here."
        df = spark.createDataFrame(
            [(1, doc), (2, lorem), (3, brace), (4, few)],
            "id int, text string",
        )
        out = {r.id: r for r in c4_line_filter(df).collect()}
        r = out[1]
        assert (r.n_lines, r.n_kept_lines) == (6, 3)
        assert "javascript" not in r.text and "short one" not in r.text
        assert "no terminal punctuation" not in r.text
        assert r.keep_page
        assert not out[2].keep_page  # lorem ipsum page
        assert not out[3].keep_page  # brace page
        assert not out[4].keep_page  # only 1 sentence retained

    def test_no_shuffle_no_udf(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            c4_line_filter,
        )

        df = spark.createDataFrame([(1, "x")], "id int, text string")
        plan = (
            c4_line_filter(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan and "BatchEval" not in plan


class TestGopherRepetitionFlags:
    def test_planted_dup_lines_and_paras(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            gopher_repetition_flags,
        )

        clean = "a one.\nb two.\n\nc three."
        dup_lines = "x y.\nx y.\nx y.\nunique line."
        para = "line a.\nline b."
        dup_paras = para + "\n\n" + para
        df = spark.createDataFrame(
            [(1, clean), (2, dup_lines), (3, dup_paras)],
            "doc_id int, text string",
        )
        out = {r.doc_id: r for r in gopher_repetition_flags(df).collect()}
        r1 = out[1]
        assert (r1.n_lines, r1.n_paras) == (3, 2)
        assert r1.dup_line_frac == 0.0 and r1.dup_para_frac == 0.0
        assert r1.passes_repetition
        r2 = out[2]
        # 3x "x y." (len 4) + 1 unique (len 12): dup 2/4, chars 8/24
        assert (r2.n_lines, r2.dup_line_frac) == (4, 0.5)
        assert r2.dup_line_char_frac == 0.333333
        assert (r2.n_paras, r2.dup_para_frac) == (1, 0.0)
        assert not r2.passes_repetition
        r3 = out[3]
        # identical paragraphs; their lines duplicate too
        assert (r3.n_paras, r3.dup_para_frac) == (2, 0.5)
        assert r3.dup_para_char_frac == 0.5
        assert (r3.n_lines, r3.dup_line_frac) == (4, 0.5)
        assert not r3.passes_repetition

    def test_empty_and_single_unit_docs(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            gopher_repetition_flags,
        )

        df = spark.createDataFrame(
            [(1, ""), (2, "   \n  \n"), (3, "only line.")],
            "doc_id int, text string",
        )
        out = {r.doc_id: r for r in gopher_repetition_flags(df).collect()}
        # no non-empty units -> NULL metrics, vacuous pass
        for i in (1, 2):
            assert out[i].n_lines is None and out[i].passes_repetition
        r3 = out[3]
        assert (r3.n_lines, r3.n_paras) == (1, 1)
        assert r3.dup_line_frac == 0.0 and r3.passes_repetition

    def test_no_python_in_plan(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            gopher_repetition_flags,
        )

        df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
        plan = (
            gopher_repetition_flags(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan and "BatchEval" not in plan


class TestTextIndex:
    def _corpus(self, spark):
        rows = [
            (1, "data model data learning the end"),
            (2, "model model model nothing else"),
            (3, "the quick brown fox"),
            (4, "data data data data learning"),
            (5, "learning about the data model"),
        ]
        return spark.createDataFrame(rows, "doc_id int, text string")

    def test_search_equals_inline_bm25(self, spark, tmp_path):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            bm25_scores,
            build_text_index,
            text_index_search,
        )

        corpus = self._corpus(spark)
        path = str(tmp_path / "tix")
        build_text_index(corpus, path, buckets=8)
        q = ["data", "model", "learning"]
        got = sorted(
            text_index_search(spark, path, q).collect(),
            key=lambda r: r.doc_id,
        )
        want = sorted(
            bm25_scores(corpus, q).collect(), key=lambda r: r.doc_id
        )
        assert [(r.doc_id, r.bm25) for r in got] == [
            (r.doc_id, r.bm25) for r in want
        ]
        assert {r.doc_id for r in got} == {1, 2, 4, 5}  # doc 3 no hits

    def test_partition_pruning_and_topk(self, spark, tmp_path):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            build_text_index,
            text_index_search,
        )

        corpus = self._corpus(spark)
        path = str(tmp_path / "tix2")
        build_text_index(corpus, path, buckets=8)
        res = text_index_search(spark, path, ["data"], k=2)
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "bucket" in plan
        rows = res.orderBy("rank").collect()
        assert [r.doc_id for r in rows] == [4, 1]  # tf 4 then tf 2
        assert rows[0].bm25 > rows[1].bm25

    def test_rebuild_identical_and_guards(self, spark, tmp_path):
        import pytest as _pytest

        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            build_text_index,
            text_index_search,
        )

        corpus = self._corpus(spark)
        p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
        build_text_index(corpus, p1, buckets=4)
        build_text_index(corpus, p2, buckets=4)
        a = sorted(map(tuple, spark.read.parquet(f"{p1}/postings").collect()))
        b = sorted(map(tuple, spark.read.parquet(f"{p2}/postings").collect()))
        assert a == b
        with _pytest.raises(ValueError):
            text_index_search(spark, p1, [])
        with _pytest.raises(ValueError):
            build_text_index(corpus, str(tmp_path / "c"), buckets=0)


class TestCorpusTopNgrams:
    def test_planted_boilerplate_surfaces(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            corpus_top_ngrams,
        )

        boiler = "all rights reserved"
        rows = [
            (1, f"alpha beta gamma {boiler}"),
            (2, f"delta epsilon {boiler} zeta"),
            (3, f"{boiler} {boiler} eta"),
            (4, "looped looped looped looped looped"),  # single-doc loop
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        out = corpus_top_ngrams(df, n=3, k=5).collect()
        assert out[0].gram == boiler
        assert out[0].n_occurrences == 4 and out[0].n_docs == 3
        # the single-doc loop gram is excluded by min_docs
        assert all("looped looped looped" != r.gram for r in out)
        # with min_docs=1 it appears
        out1 = corpus_top_ngrams(df, n=3, k=5, min_docs=1).collect()
        assert any(r.gram == "looped looped looped" for r in out1)

    def test_tiebreak_and_guards(self, spark):
        import pytest as _pytest

        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            corpus_top_ngrams,
        )

        df = spark.createDataFrame(
            [(1, "b a"), (2, "b a"), (3, "a b"), (4, "a b")],
            "doc_id int, text string",
        )
        out = corpus_top_ngrams(df, n=2, k=2, min_docs=2).collect()
        # equal counts -> lexicographic order
        assert [r.gram for r in out] == ["a b", "b a"]
        with _pytest.raises(ValueError):
            corpus_top_ngrams(df, n=0)


class TestCollocations:
    def test_planted_collocation_ranks_first(self, spark):
        from math import log

        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            collocations,
        )

        # "san francisco" always together; filler words change partners
        variants = [
            "one two san francisco three four",
            "two one san francisco four three",
            "one three san francisco two four",
        ]
        docs = [(i, variants[i % 3]) for i in range(6)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = collocations(df, min_count=2, top_k=5).collect()

        # pure-python PMI replica over the same bigram event space
        from collections import Counter

        big = Counter()
        for _, text in docs:
            t = text.split()
            big.update(zip(t, t[1:]))
        B = sum(big.values())
        c1p, c1c = Counter(), Counter()
        for (p, c), n in big.items():
            c1p[p] += n
            c1c[c] += n
        ref = sorted(
            (
                (round(log(n * B / (c1p[p] * c1c[c])), 6), p, c, n)
                for (p, c), n in big.items()
                if n >= 2
            ),
            key=lambda r: (-r[0], r[1], r[2]),
        )[:5]
        assert [(r.pmi, r.prev, r.cur, r.c2) for r in got] == [
            (pytest.approx(pmi), p, c, n) for pmi, p, c, n in ref
        ]
        assert ("san", "francisco") in {(r.prev, r.cur) for r in got}
        assert [r.rnk for r in got] == [1, 2, 3, 4, 5]

    def test_min_count_filters_hapax(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            collocations,
        )

        df = spark.createDataFrame(
            [(1, "rare pair appears once"), (2, "common duo common duo")],
            "doc_id long, text string",
        )
        got = collocations(df, min_count=2, top_k=10).collect()
        assert all(r.c2 >= 2 for r in got)
        assert ("rare", "pair") not in {(r.prev, r.cur) for r in got}

    def test_validates_params(self, spark):
        import pytest as _pytest

        from nifi_hive_schema_generator_bundle_spark.operators.text import (
            collocations,
        )

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with _pytest.raises(ValueError):
            collocations(df, min_count=0)
        with _pytest.raises(ValueError):
            collocations(df, top_k=0)
