"""Luhn validation + card-number extraction (functions/textfns) against
published test PANs — the fixtures the synthetic-corpus gate entry
(doc_pii_audit) can't provide."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# (number, luhn_valid) — industry test numbers (public documentation
# fixtures, not real accounts) plus constructed near-misses
LUHN_CASES = [
    ("4111111111111111", True),   # 16-digit Visa test number
    ("4111111111111112", False),  # last digit off by one
    ("4222222222222", True),      # 13-digit Visa test number
    ("5500005555555559", True),   # 16-digit MC test number
    ("378282246310005", True),    # 15-digit Amex test number
    ("1234567890123456", False),
    ("79927398713", False),       # valid Luhn but < 13 digits -> rejected
]


def test_luhn_valid_on_known_numbers(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
        luhn_valid,
    )

    df = spark.createDataFrame(LUHN_CASES, ["nr", "want"])
    got = {r.nr: r.ok for r in df.select("nr", luhn_valid("nr").alias("ok")).collect()}
    for nr, want in LUHN_CASES:
        assert got[nr] is want, nr


def test_luhn_null_empty_nondigit(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
        luhn_valid,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "4111-1111"), (4, "abc")],
        ["id", "nr"],
    )
    got = {r.id: r.ok for r in df.select("id", luhn_valid("nr").alias("ok")).collect()}
    assert got == {1: False, 2: False, 3: False, 4: False}


def test_card_numbers_extraction_and_validation(spark):
    from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
        card_numbers,
    )

    rows = [
        # separators normalize away; the invalid twin is extracted as a
        # candidate but filtered by validation
        (1, "pay 4111 1111 1111 1111 or 4111-1111-1111-1112 thanks"),
        (2, "amex 378282246310005 inline"),
        (3, "order id 123456 is not a card"),  # too short
        (4, "ref w4111111111111111x"),  # inside a word: no boundary
        (5, None),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = {
        r.id: (r.cands, r.valid)
        for r in df.select(
            "id",
            card_numbers("t", validated=False).alias("cands"),
            card_numbers("t", validated=True).alias("valid"),
        ).collect()
    }
    assert out[1] == (
        ["4111111111111111", "4111111111111112"],
        ["4111111111111111"],
    )
    assert out[2] == (["378282246310005"], ["378282246310005"])
    assert out[3] == ([], [])
    assert out[4] == ([], [])
    assert out[5] == (None, None)


def test_pii_audit_gate_plants_even_half_valid(spark, sf_smoke_dir):
    """The synthesized check digit is correct exactly for even doc_ids."""
    from nifi_hive_schema_generator_bundle_spark.plans.queries import QUERIES

    rows = QUERIES["doc_pii_audit"](spark, sf_smoke_dir).collect()
    assert all(r.n_candidates >= 1 for r in rows)
    for r in rows:
        want = 1 if r.doc_id % 2 == 0 else 0
        assert r.n_cards_valid == want, r
    assert all(r.n_emails == 0 for r in rows)
