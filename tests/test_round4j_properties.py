"""Property / differential tests for the round-4j operators: Spark
results vs pure-Python models on hypothesis-generated inputs (small
example counts — each example runs Spark jobs)."""

from __future__ import annotations

from math import comb, log, sqrt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# pass_at_k == math.comb closed form for arbitrary (n, c, k)
# ---------------------------------------------------------------------------

@given(
    n=st.integers(1, 40),
    c_frac=st.floats(0.0, 1.0),
    k=st.sampled_from([1, 3, 7, 25]),
)
@settings(**_SETTINGS)
def test_pass_at_k_matches_comb(spark, n, c_frac, k):
    from nifi_hive_schema_generator_bundle_spark.operators.evals import (
        pass_at_k,
    )

    c = min(n, int(round(c_frac * n)))
    rows = [("p", i < c) for i in range(n)]
    df = spark.createDataFrame(rows, "problem_id string, correct boolean")
    r = {row.k: row.pass_at_k for row in pass_at_k(df, ks=(k,)).collect()}
    if k > n:
        assert r[k] is None
    else:
        want = round(1.0 - comb(n - c, k) / comb(n, k), 6)
        assert r[k] == (1.0 if n - c < k else want) or abs(r[k] - want) < 2e-6


# ---------------------------------------------------------------------------
# Wilson interval: brackets the point estimate, stays in [0, 1]
# ---------------------------------------------------------------------------

@given(n=st.integers(1, 60), w_frac=st.floats(0.0, 1.0))
@settings(**_SETTINGS)
def test_wilson_interval_brackets_rate(spark, n, w_frac):
    from nifi_hive_schema_generator_bundle_spark.operators.ranking import (
        pairwise_win_rates,
    )

    w = min(n, int(round(w_frac * n)))
    battles = [("A", "B", "a")] * w + [("A", "B", "b")] * (n - w)
    df = spark.createDataFrame(
        battles, "model_a string, model_b string, winner string"
    )
    r = {
        (row.model, row.opponent): row
        for row in pairwise_win_rates(df).collect()
    }[("A", "B")]
    assert 0.0 <= r.ci_lo <= r.win_rate <= r.ci_hi <= 1.0
    # python replica of the Wilson algebra
    p, z = w / n, 1.96
    z2 = z * z
    c = (p + z2 / (2 * n)) / (1 + z2 / n)
    h = z * sqrt(p * (1 - p) / n + z2 / (4 * n * n)) / (1 + z2 / n)
    assert abs(r.ci_lo - round(c - h, 6)) < 2e-6
    assert abs(r.ci_hi - round(c + h, 6)) < 2e-6


# ---------------------------------------------------------------------------
# render_chat: every span slices back exactly its turn's content,
# and untrained turns never appear inside any span
# ---------------------------------------------------------------------------

_CONTENT = st.text(alphabet="ab α!\n", min_size=0, max_size=8)


@given(
    turns=st.lists(
        st.tuples(
            st.sampled_from(["system", "user", "assistant", "tool"]),
            _CONTENT,
        ),
        min_size=0,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_render_chat_spans_slice_exact_contents(spark, turns):
    from nifi_hive_schema_generator_bundle_spark.operators.sft import (
        render_chat,
    )

    df = spark.createDataFrame(
        [(1, turns)], "i int, turns array<struct<role:string,content:string>>"
    )
    r = df.select(render_chat("turns").alias("r")).collect()[0].r
    assistants = [c for role, c in turns if role == "assistant"]
    assert len(r.spans) == len(assistants)
    for (s, e), want in zip(r.spans, assistants):
        assert r.text[s - 1:e] == want
    # rendered text reconstructs exactly
    want_text = "".join(f"<|{role}|>\n{c}\n" for role, c in turns)
    assert r.text == want_text


# ---------------------------------------------------------------------------
# fix_mojibake: corrupt(original) always repairs back to the original
# for any UTF-8 text containing a multibyte char; clean ASCII unchanged
# ---------------------------------------------------------------------------

@given(
    body=st.text(alphabet="abc é—日", min_size=1, max_size=12),
)
@settings(**_SETTINGS)
def test_fix_mojibake_roundtrip(spark, body):
    from pyspark.sql import functions as F

    from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
        fix_mojibake,
    )

    try:
        corrupted = body.encode("utf-8").decode("latin-1")
    except UnicodeDecodeError:
        return  # bytes 0x80-0x9f region undecodable: outside the scenario
    df = spark.createDataFrame([(corrupted,), (body,)], "s string")
    got = [r.out for r in df.select(fix_mojibake(F.col("s")).alias("out")).collect()]
    if corrupted != body:          # genuinely corrupted form
        assert got[0] == body
    # already-clean text survives untouched (with this alphabet a clean
    # string can never itself be a valid mojibake byte pattern)
    assert got[1] == body


# ---------------------------------------------------------------------------
# bradley_terry: two-model ratings order by win rate and normalize to mean 1
# ---------------------------------------------------------------------------

@given(n=st.integers(2, 20), w=st.integers(1, 19))
@settings(**_SETTINGS)
def test_bt_two_model_ordering(spark, n, w):
    from nifi_hive_schema_generator_bundle_spark.operators.ranking import (
        bradley_terry,
    )

    w = min(w, n - 1)  # both models win at least once? no: A wins w, B wins n-w
    battles = [("A", "B", "a")] * w + [("A", "B", "b")] * (n - w)
    df = spark.createDataFrame(
        battles, "model_a string, model_b string, winner string"
    )
    got = {r.model: r.rating for r in bradley_terry(df, iters=12).collect()}
    assert abs((got["A"] + got["B"]) / 2 - 1.0) < 1e-6   # mean-1 normalization
    if w * 2 > n:
        assert got["A"] > got["B"]
    elif w * 2 < n:
        assert got["A"] < got["B"]
