"""Property / differential tests for the round-4c operators: Spark
results vs brute-force pure-Python models on hypothesis-generated
inputs (small example counts — each example runs Spark jobs)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nifi_hive_schema_generator_bundle_spark.functions.bloom import (
    bloom_prefiltered_anti_join,
)
from nifi_hive_schema_generator_bundle_spark.functions.bpe import (
    PRETOKEN_RE,
    bpe_train,
)
from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
    epoch_upsample,
)
from nifi_hive_schema_generator_bundle_spark.functions.textfns import (
    REDACT_PATTERNS,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# bloom_prefiltered_anti_join ≡ set difference, for ANY key overlap shape
# ---------------------------------------------------------------------------

@given(
    new_keys=st.lists(st.integers(0, 40), min_size=0, max_size=30),
    old_keys=st.sets(st.integers(0, 40), max_size=30),
)
@settings(**_SETTINGS)
def test_bloom_anti_join_matches_set_difference(spark, new_keys, old_keys):
    new = spark.createDataFrame(
        [(k, i) for i, k in enumerate(new_keys)] or [(None, -1)],
        "key int, idx int",
    )
    old = spark.createDataFrame(
        [(k,) for k in old_keys] or [(None,)], "key int"
    )
    # tiny filter on purpose: false positives exercised, never false negs
    got = bloom_prefiltered_anti_join(new, old, "key", n_bits=256)
    want = sorted(
        (k, i) for i, k in enumerate(new_keys) if k not in old_keys
    )
    got_rows = sorted(
        (r["key"], r["idx"]) for r in got.collect() if r["key"] is not None
    )
    assert got_rows == want


# ---------------------------------------------------------------------------
# bpe_train ≡ the pure-Python Sennrich reference on random corpora
# ---------------------------------------------------------------------------

def _ref_train(texts, n_merges):
    vocab = Counter()
    for t in texts:
        for pre in PRETOKEN_RE.findall(t):
            vocab[pre] += 1
    words = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += vocab[w]
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


@given(
    texts=st.lists(
        st.text(alphabet="abcd .", min_size=0, max_size=20),
        min_size=1,
        max_size=6,
    ),
    n_merges=st.integers(0, 5),
)
@settings(**_SETTINGS)
def test_bpe_train_matches_reference_on_random_corpora(spark, texts, n_merges):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert bpe_train(df, n_merges=n_merges) == _ref_train(texts, n_merges)


# ---------------------------------------------------------------------------
# epoch_upsample ≡ per-row closed-form copy count
# ---------------------------------------------------------------------------

def _expected_copies(doc_id: int, factor: float) -> int:
    base = int(factor)
    frac = factor - base
    h = hashlib.md5(f"{doc_id}:epoch".encode()).hexdigest()[:8]
    u = int(h, 16) / 4294967296.0
    return base + (1 if u < frac else 0)


@given(
    ids=st.sets(st.integers(0, 1000), min_size=1, max_size=25),
    fac_a=st.floats(0.0, 3.0, allow_nan=False),
    fac_b=st.floats(0.0, 3.0, allow_nan=False),
)
@settings(**_SETTINGS)
def test_epoch_upsample_matches_closed_form(spark, ids, fac_a, fac_b):
    rows = [(i, "a" if i % 2 else "b") for i in sorted(ids)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = epoch_upsample(df, "lang", {"a": fac_a, "b": fac_b}, key="doc_id")
    got = Counter(r["doc_id"] for r in out.collect())
    for i, lang in rows:
        want = _expected_copies(i, fac_a if lang == "a" else fac_b)
        assert got.get(i, 0) == want, (i, lang)


# ---------------------------------------------------------------------------
# redact ≡ Python re.sub with the same patterns, same order
# ---------------------------------------------------------------------------

@given(
    text=st.text(
        alphabet="ab1 .-@x:/", min_size=0, max_size=40
    ).map(lambda s: s + " 25-989-741-2988 a@b.co 1.2.3.4")
)
@settings(**_SETTINGS)
def test_redact_matches_python_re(spark, text):
    from pyspark.sql import functions as F

    from nifi_hive_schema_generator_bundle_spark.functions.textfns import redact

    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(redact("t").alias("r")).collect()[0]["r"]
    want = text
    for kind, pat in REDACT_PATTERNS.items():
        want = re.sub(pat, f"<{kind.upper()}>", want)
    assert got == want


def test_l_diversity_report_planted(spark):
    """Hand-built classes: one diverse, one homogeneous, NULLs excluded."""
    from nifi_hive_schema_generator_bundle_spark.operators.quality_checks import (
        l_diversity_report,
    )

    rows = [
        # class A: 3 rows, 3 distinct sensitive values -> diverse at l=2
        ("a", 1, "x"), ("a", 1, "y"), ("a", 1, "z"),
        # class B: 4 rows, all the same sensitive value -> risky
        ("b", 2, "w"), ("b", 2, "w"), ("b", 2, "w"), ("b", 2, "w"),
        # class C: 2 rows, one NULL sensitive -> diversity 1 -> risky
        ("c", 3, "v"), ("c", 3, None),
    ]
    df = spark.createDataFrame(rows, ["q1", "q2", "s"])
    r = l_diversity_report(df, ["q1", "q2"], "s", l=2).collect()[0]
    assert r.l == 2 and r.n_rows == 9 and r.n_classes == 3
    assert r.n_risky_classes == 2 and r.n_risky_rows == 6
    assert r.min_diversity == 1 and r.diverse is False
    ok = l_diversity_report(
        df.filter("q1 = 'a'"), ["q1", "q2"], "s", l=3
    ).collect()[0]
    assert ok.diverse is True and ok.min_diversity == 3
