"""Property / differential tests for the round-4 operators: each
Spark result is compared against a brute-force pure-Python model on
hypothesis-generated inputs (small example counts — each example runs
Spark jobs)."""

from __future__ import annotations

import hashlib
import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nifi_hive_schema_generator_bundle_spark.functions.sampling import (
    weighted_sample,
)
from nifi_hive_schema_generator_bundle_spark.operators.dedup import (
    duplicate_span_stats,
)
from nifi_hive_schema_generator_bundle_spark.operators.graph import (
    triangle_count,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# triangle_count ≡ brute-force enumeration on random graphs
# ---------------------------------------------------------------------------

@given(
    edges=st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_triangle_count_matches_bruteforce(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}

    simple = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = {n for e in simple for n in e}
    expect = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if {(a, b), (a, c), (b, c)} <= simple:
            expect[a] += 1
            expect[b] += 1
            expect[c] += 1
    assert got == expect


# ---------------------------------------------------------------------------
# duplicate_span_stats ≡ brute-force interval union
# ---------------------------------------------------------------------------

@given(
    data=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(2, 4),
)
@settings(**_SETTINGS)
def test_duplicate_span_stats_matches_bruteforce(spark, data, k):
    docs = [(i, " ".join(toks)) for i, toks in enumerate(data)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_grams"], r["dup_tokens"])
        for r in duplicate_span_stats(df, k=k, min_count=2).collect()
    }

    grams: dict = {}
    per_doc: dict = {}
    for i, toks in enumerate(data):
        per_doc[i] = [
            tuple(toks[p : p + k]) for p in range(len(toks) - k + 1)
        ]
        for g in per_doc[i]:
            grams[g] = grams.get(g, 0) + 1
    for i, toks in enumerate(data):
        covered = set()
        n_dup = 0
        for p, g in enumerate(per_doc[i]):
            if grams[g] >= 2:
                n_dup += 1
                covered.update(range(p, p + k))
        assert got[i] == (len(toks), n_dup, len(covered)), (i, toks)


# ---------------------------------------------------------------------------
# weighted_sample ≡ brute-force Efraimidis–Spirakis top-n
# ---------------------------------------------------------------------------

def _u(key) -> float:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) / 2**32


@given(
    weights=st.lists(st.floats(0.1, 50.0), min_size=1, max_size=40),
    n=st.integers(0, 10),
)
@settings(**_SETTINGS)
def test_weighted_sample_matches_bruteforce(spark, weights, n):
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sorted(
        r["doc_id"]
        for r in weighted_sample(df, n, weight_col="w", key="doc_id").collect()
    )
    ranked = sorted(rows, key=lambda t: -(_u(t[0]) ** (1.0 / t[1])))
    expect = sorted(i for i, _ in ranked[:n])
    assert got == expect


# ---------------------------------------------------------------------------
# dsir_importance_weights ≡ pure-Python bag-of-buckets model
# ---------------------------------------------------------------------------

@given(
    docs=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(["ant", "bee", "cat", "dog", "elk", "fox"]),
                min_size=0,
                max_size=8,
            ),
            st.booleans(),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_dsir_weights_match_bruteforce(spark, docs):
    import math

    from pyspark.sql import functions as F

    from nifi_hive_schema_generator_bundle_spark.operators.selection import (
        dsir_importance_weights,
    )

    B, ALPHA = 64, 1.0
    rows = [(i, " ".join(toks), tgt) for i, (toks, tgt) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["dsir_weight"])
        for r in dsir_importance_weights(
            df, F.col("is_t"), n_buckets=B, alpha=ALPHA
        ).collect()
    }

    def bucket(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    cs: dict[int, int] = {}
    ct: dict[int, int] = {}
    per_doc: list[dict[int, int]] = []
    for toks, tgt in docs:
        counts: dict[int, int] = {}
        for a, b in zip(toks, toks[1:]):
            counts[bucket(f"{a} {b}")] = counts.get(bucket(f"{a} {b}"), 0) + 1
        per_doc.append(counts)
        for k, v in counts.items():
            cs[k] = cs.get(k, 0) + v
            if tgt:
                ct[k] = ct.get(k, 0) + v
    ns, nt = sum(cs.values()), sum(ct.values())
    for i, (toks, _) in enumerate(docs):
        n_bi, w = got[i]
        assert n_bi == max(len(toks) - 1, 0)
        if n_bi == 0:
            assert w is None
            continue
        expect = sum(
            k
            * (
                math.log((ct.get(b, 0) + ALPHA) / (nt + ALPHA * B))
                - math.log((cs[b] + ALPHA) / (ns + ALPHA * B))
            )
            for b, k in per_doc[i].items()
        )
        assert w == pytest.approx(round(expect, 6), abs=2e-6)
