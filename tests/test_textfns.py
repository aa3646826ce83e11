

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
