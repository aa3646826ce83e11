"""Units for the round-4d operators: clean_text (scraped-text cleanup)
and forward_fill / daily_spine_fill (time-series regularization)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.functions.textfns import clean_text
from nifi_hive_schema_generator_bundle_spark.functions.timeseries import (
    daily_spine_fill,
    forward_fill,
)


def _clean_one(spark, s: str) -> str:
    return (
        spark.createDataFrame([(s,)], "s string")
        .select(clean_text("s").alias("c"))
        .head()[0]
    )


class TestCleanText:
    def test_strips_controls_and_zero_width(self, spark):
        dirty = "a\x00b\x07c​d‌‍⁠﻿e"
        assert _clean_one(spark, dirty) == "abcde"

    def test_collapse_then_trim_handles_edge_tabs(self, spark):
        # trim() alone leaves \t\n at the edges; collapse-first reduces
        # them to one space which trim then removes.
        assert _clean_one(spark, "\t a \n\n b \t") == "a b"

    def test_internal_whitespace_runs_collapse(self, spark):
        assert _clean_one(spark, "a \t\n  b\r\nc") == "a b c"

    def test_tab_cr_lf_survive_as_separators(self, spark):
        # \t\r\n are whitespace, not control-strip targets: words they
        # separate must not be glued together.
        assert _clean_one(spark, "a\tb\rc\nd") == "a b c d"

    def test_pure_junk_becomes_empty(self, spark):
        assert _clean_one(spark, " \x01​ \x1f ") == ""

    def test_clean_input_unchanged(self, spark):
        assert _clean_one(spark, "already clean text") == "already clean text"


def _ts_frame(spark):
    d = datetime.date
    rows = [
        # key "a": days 1,2,4 present (gap on 3); v null on day 2
        ("a", d(2024, 1, 1), 2, 10.0),
        ("a", d(2024, 1, 2), 1, None),
        ("a", d(2024, 1, 4), 3, 40.0),
        # key "b": leading null v, single-day span for spine isolation
        ("b", d(2024, 2, 1), 5, None),
    ]
    return spark.createDataFrame(rows, "k string, day date, n int, v double")


class TestForwardFill:
    def test_carries_last_non_null_per_key(self, spark):
        out = {
            (r["k"], str(r["day"])): r["v"]
            for r in forward_fill(
                _ts_frame(spark), ["v"], key_cols=["k"], order_col="day"
            ).collect()
        }
        assert out[("a", "2024-01-02")] == 10.0
        assert out[("a", "2024-01-04")] == 40.0

    def test_leading_null_stays_null(self, spark):
        out = forward_fill(
            _ts_frame(spark), ["v"], key_cols=["k"], order_col="day"
        )
        assert out.filter("k = 'b'").head()["v"] is None


class TestDailySpineFill:
    def _filled(self, spark, df=None):
        df = df if df is not None else _ts_frame(spark)
        return daily_spine_fill(
            df, key_col="k", day_col="day", count_cols=["n"], ffill_cols=["v"]
        )

    def test_gap_days_materialize_with_zero_count(self, spark):
        rows = {
            (r["k"], str(r["day"])): (r["n"], r["v"])
            for r in self._filled(spark).collect()
        }
        # day 3 did not exist in the input; it must now, with n=0 and
        # the day-1 value carried forward (day 2's v was null).
        assert rows[("a", "2024-01-03")] == (0, 10.0)
        assert len(rows) == 5  # a: 4 days, b: 1 day

    def test_spans_are_per_key(self, spark):
        out = self._filled(spark)
        assert out.filter("k = 'b'").count() == 1  # not stretched to a's span

    def test_existing_rows_unchanged(self, spark):
        rows = {
            (r["k"], str(r["day"])): (r["n"], r["v"])
            for r in self._filled(spark).collect()
        }
        assert rows[("a", "2024-01-01")] == (2, 10.0)
        assert rows[("a", "2024-01-04")] == (3, 40.0)

    def test_partition_layout_invariance(self, spark):
        base = sorted(map(tuple, self._filled(spark).collect()))
        shuffled = sorted(
            map(
                tuple,
                self._filled(spark, _ts_frame(spark).repartition(7)).collect(),
            )
        )
        assert base == shuffled

    def test_no_gaps_is_identity_plus_fill(self, spark):
        dense = _ts_frame(spark).filter("day <= DATE'2024-01-02'")
        out = self._filled(spark, dense)
        assert out.count() == dense.count()


class TestHtmlToText:
    def _run(self, spark, html):
        from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
            html_to_text,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(html,)], "h string")
        return df.select(html_to_text("h").alias("t")).collect()[0].t

    def test_full_page(self, spark):
        html = (
            "<html><head><title>Title</title>"
            "<style>p {color:red}</style>"
            '<script type="text/javascript">var x = 1 < 2;</script>'
            "</head><body><h1>Heading</h1><p>First para.</p>"
            "<ul><li>One</li><li>Two</li></ul></body></html>"
        )
        # title/h1/p/li closers -> newlines; script+style content gone
        assert self._run(spark, html) == "Title\nHeading\nFirst para.\nOne\nTwo"

    def test_entities_amp_last(self, spark):
        html = "<p>Tom &amp; Jerry &quot;hi&quot; &lt;b&gt; it&#39;s&nbsp;ok</p>"
        assert self._run(spark, html) == "Tom & Jerry \"hi\" <b> it's ok"
        # double-encoded &amp;lt; must yield the literal entity, not '<'
        assert self._run(spark, "x &amp;lt; y") == "x &lt; y"

    def test_comments_br_and_plain_text(self, spark):
        html = '<div><!-- hidden --><span class="a b">vis</span><br/>next</div>'
        assert self._run(spark, html) == "vis\nnext"
        assert self._run(spark, "no tags at all") == "no tags at all"
        assert self._run(spark, "  \n <p></p> \n ") == ""

    def test_no_shuffle_no_udf(self, spark):
        from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
            html_to_text,
        )

        df = spark.createDataFrame([("x",)], "h string")
        plan = (
            df.select(html_to_text("h"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan and "BatchEval" not in plan


class TestCompressionRatio:
    def test_matches_direct_zlib(self, spark):
        import zlib

        from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
            compression_ratio,
        )

        texts = [
            "the quick brown fox jumps over the lazy dog",
            "spam " * 100,
            "x",
            "",
            None,
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id int, text string"
        )
        got = {
            r.id: r.r
            for r in df.select(
                "id", compression_ratio("text").alias("r")
            ).collect()
        }
        for i, t in enumerate(texts):
            if t is None or t == "":
                assert got[i] is None
            else:
                raw = t.encode()
                assert got[i] == round(
                    len(zlib.compress(raw, 6)) / len(raw), 6
                )
        # repetitive text compresses far below prose
        assert got[1] < 0.1 < got[0]

    def test_level_guard_and_single_arrow_stage(self, spark):
        import pytest as _pytest

        from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
            compression_ratio,
        )

        with _pytest.raises(ValueError):
            compression_ratio("text", level=10)
        df = spark.createDataFrame([(1, "x")], "id int, text string")
        plan = (
            df.select(compression_ratio("text"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("ArrowEvalPython") == 1
        assert "Exchange" not in plan
