

class TestUnicodeNormalize:
    def test_forms_and_null(self, spark):
        from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
            unicode_normalize,
        )

        rows = [("Café",), ("ﬁn",), (None,)]
        df = spark.createDataFrame(rows, "t string")
        nfc = [r[0] for r in df.select(unicode_normalize("t", "NFC")).collect()]
        assert nfc == ["Café", "ﬁn", None]  # NFC keeps the ligature
        nfkc = [r[0] for r in df.select(unicode_normalize("t", "NFKC")).collect()]
        assert nfkc == ["Café", "fin", None]  # NFKC folds it

    def test_rejects_unknown_form(self):
        import pytest as _pytest

        from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
            unicode_normalize,
        )

        with _pytest.raises(ValueError):
            unicode_normalize("t", "NFX")


class TestFixMojibake:
    def _fix(self, spark, values):
        from pyspark.sql import functions as F

        from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
            fix_mojibake,
        )

        df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                                   "i int, s string")
        return [
            r.out
            for r in df.select(fix_mojibake(F.col("s")).alias("out"))
            .orderBy("i").collect()
        ]

    def test_repairs_double_encoded_utf8(self, spark):
        originals = ["café", "naïve", "über — dash", "日本語?"]
        corrupted = [o.encode("utf-8").decode("latin-1") for o in originals[:3]]
        got = self._fix(spark, corrupted)
        assert got == originals[:3]

    def test_clean_text_passes_through(self, spark):
        clean = ["plain ascii", "café already fine", "", None]
        assert self._fix(spark, clean) == clean

    def test_idempotent_and_lossy_guard(self, spark):
        # a lone 'Ã' (invalid as UTF-8 continuation) must pass through
        vals = ["Ã alone", "cafÃ©"]
        once = self._fix(spark, vals)
        assert once == ["Ã alone", "café"]
        assert self._fix(spark, once) == once  # idempotent

    def test_declared_arrow_stage(self, spark):
        from pyspark.sql import functions as F

        from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
            fix_mojibake,
        )

        df = spark.createDataFrame([("x",)], "s string")
        plan = (
            df.select(fix_mojibake(F.col("s")))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "ArrowEvalPython" in plan
