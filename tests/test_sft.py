"""Chat-template rendering + loss-mask span tests (operators/sft.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.operators.sft import (
    render_chat,
    rendered_chat_frame,
)

TURNS_T = "array<struct<role:string,content:string>>"


@pytest.fixture(scope="module")
def conv(spark):
    rows = [
        (
            1,
            [
                ("system", "Be brief."),
                ("user", "Hi there"),
                ("assistant", "Hello!"),
                ("user", "Bye"),
                ("assistant", "See ya"),
            ],
        ),
        (2, [("user", "no reply yet")]),
        (3, []),
        (4, None),
    ]
    return spark.createDataFrame(rows, f"conv_id int, turns {TURNS_T}")


def test_render_hand_computed(spark, conv):
    r = conv.select(
        "conv_id", render_chat("turns").alias("r")
    ).collect()
    by_id = {row.conv_id: row.r for row in r}
    expected = (
        "<|system|>\nBe brief.\n"
        "<|user|>\nHi there\n"
        "<|assistant|>\nHello!\n"
        "<|user|>\nBye\n"
        "<|assistant|>\nSee ya\n"
    )
    assert by_id[1].text == expected
    # spans slice back exactly the assistant contents
    for (s, e), want in zip(by_id[1].spans, ["Hello!", "See ya"]):
        assert expected[s - 1:e] == want
    assert by_id[2].text == "<|user|>\nno reply yet\n"
    assert by_id[2].spans == []
    assert by_id[3].text == "" and by_id[3].spans == []
    assert by_id[4].text == "" and by_id[4].spans == []


def test_train_roles_override(spark, conv):
    r = conv.filter("conv_id = 1").select(
        render_chat("turns", train_roles=("user", "assistant")).alias("r")
    ).collect()[0].r
    pieces = [r.text[s - 1:e] for s, e in r.spans]
    assert pieces == ["Hi there", "Hello!", "Bye", "See ya"]


def test_flat_frame_piece_equals_content(spark, conv):
    out = rendered_chat_frame(conv).collect()
    got = {
        (r.conv_id, r.span_idx): (r.piece, r.n_spans, r.text_len)
        for r in out
    }
    assert got[(1, 0)][0] == "Hello!"
    assert got[(1, 1)][0] == "See ya"
    assert got[(1, 0)][1] == 2
    # span-free conversations keep one NULL-span row
    assert got[(2, None)][1] == 0
    assert got[(3, None)][2] == 0
    assert got[(4, None)][2] == 0
    assert len(out) == 5


def test_plan_is_jvm_only(spark, conv):
    plan = (
        rendered_chat_frame(conv)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "BatchEval" not in plan
    assert "Exchange" not in plan


class TestPreferencePairs:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "prompt string, response string, score double, response_id long"
        )

    def test_hand_computed(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.sft import (
            preference_pairs,
        )

        df = self._df(spark, [
            ("p1", "bad", 1.0, 1),
            ("p1", "ok", 2.0, 2),
            ("p1", "best", 5.0, 3),
            ("p2", "only", 3.0, 4),          # single response: dropped
            ("p3", "tie-a", 2.0, 5),          # all tied: dropped at margin 0
            ("p3", "tie-b", 2.0, 6),
        ])
        got = {r.prompt: r for r in preference_pairs(df).collect()}
        assert set(got) == {"p1"}
        r = got["p1"]
        assert (r.chosen, r.rejected) == ("best", "bad")
        assert (r.chosen_score, r.rejected_score, r.n_responses) == (5.0, 1.0, 3)

    def test_margin_and_tiebreak(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.sft import (
            preference_pairs,
        )

        df = self._df(spark, [
            ("p1", "a", 1.0, 1),
            ("p1", "b", 1.4, 2),
            # ties at both extremes: id decides deterministically
            ("p2", "lo-first", 1.0, 1),
            ("p2", "lo-second", 1.0, 2),
            ("p2", "hi-first", 9.0, 3),
            ("p2", "hi-second", 9.0, 4),
        ])
        got = {r.prompt: r for r in preference_pairs(df, margin=0.5).collect()}
        assert "p1" not in got           # gap 0.4 <= margin
        r = got["p2"]
        assert (r.chosen, r.rejected) == ("hi-second", "lo-first")

    def test_plan_is_single_partial_agg(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.sft import (
            preference_pairs,
        )

        df = self._df(spark, [("p", "r", 1.0, 1), ("p", "s", 2.0, 2)])
        plan = (
            preference_pairs(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan
        assert plan.count("Exchange") == 1  # one prompt-key shuffle, combined map-side


class TestValidateConversations:
    def _run(self, spark, rows):
        from nifi_hive_schema_generator_bundle_spark.operators.sft import (
            validate_conversations,
        )

        df = spark.createDataFrame(rows, f"conv_id int, turns {TURNS_T}")
        return {
            r.conv_id: (r.valid, r.violation)
            for r in validate_conversations(df).collect()
        }

    def test_rules_hand_computed(self, spark):
        got = self._run(spark, [
            (1, [("system", "s"), ("user", "u"), ("assistant", "a")]),
            (2, [("user", "u"), ("assistant", "a"), ("user", "u2")]),
            (3, []),
            (4, None),
            (5, [("user", "u"), ("robot", "r")]),
            (6, [("user", "u"), ("assistant", "")]),
            (7, [("user", "u"), ("system", "late")]),
            (8, [("user", "u"), ("user", "again")]),
            # tool turns reset alternation: assistant-tool-assistant legal
            (9, [("user", "u"), ("assistant", "a"),
                 ("tool", "result"), ("tool", "result2"),
                 ("assistant", "done")]),
        ])
        assert got[1] == (True, None)
        assert got[2] == (True, None)
        assert got[3] == (False, "empty")
        assert got[4] == (False, "empty")
        assert got[5] == (False, "bad_role")
        assert got[6] == (False, "empty_content")
        assert got[7] == (False, "system_position")
        assert got[8] == (False, "no_alternation")
        assert got[9] == (True, None)

    def test_first_violation_wins(self, spark):
        # bad role at turn 1 masks the later alternation problem
        got = self._run(spark, [
            (1, [("robot", "r"), ("user", "u"), ("user", "u")]),
        ])
        assert got[1] == (False, "bad_role")

    def test_plan_jvm_only_no_shuffle(self, spark):
        from nifi_hive_schema_generator_bundle_spark.operators.sft import (
            validate_conversations,
        )

        df = spark.createDataFrame(
            [(1, [("user", "u")])], f"conv_id int, turns {TURNS_T}"
        )
        plan = (
            validate_conversations(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "Exchange" not in plan


def test_render_chat_null_turn_fields_stay_total(spark):
    from nifi_hive_schema_generator_bundle_spark.operators.sft import (
        render_chat,
    )

    rows = [(1, [(None, "x"), ("assistant", None), ("assistant", "ok")])]
    df = spark.createDataFrame(rows, f"conv_id int, turns {TURNS_T}")
    r = df.select(render_chat("turns").alias("r")).collect()[0].r
    # NULL role/content render as empty, never poison the fold
    assert r.text == "<||>\nx\n<|assistant|>\n\n<|assistant|>\nok\n"
    # NULL-content assistant turn yields an empty span (e = s - 1)
    assert len(r.spans) == 2
    s0, e0 = r.spans[0]
    assert e0 == s0 - 1
    s1, e1 = r.spans[1]
    assert r.text[s1 - 1:e1] == "ok"
