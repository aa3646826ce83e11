"""Unit tests for functions/urls.py — hand-computed canonicalization
pairs covering every rule, plus the passthrough and domain heuristics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_hive_schema_generator_bundle_spark.functions.urls import (
    registrable_domain,
    url_host,
    url_normalize,
)


def _run(spark, fn, values):
    df = spark.createDataFrame([(v,) for v in values], "u string")
    return [r[0] for r in df.select(fn(F.col("u"))).collect()]


CANON_CASES = [
    # scheme+host lowercase, userinfo stripped, default port stripped,
    # fragment dropped, tracking dropped, params sorted, empty path -> /
    (
        "HTTP://User:pw@WWW.Example.COM:80/A/b?utm_source=x&b=2&a=1#frag",
        "http://www.example.com/A/b?a=1&b=2",
    ),
    ("https://ex.com:443/", "https://ex.com/"),
    # non-default port kept
    ("https://ex.com:8443/x", "https://ex.com:8443/x"),
    # http on 443 is NOT default -> kept
    ("http://ex.com:443/x", "http://ex.com:443/x"),
    # empty path and empty query
    ("http://Ex.Com", "http://ex.com/"),
    ("http://ex.com/p?utm_campaign=z&fbclid=1&gclid=2&ref=r", "http://ex.com/p"),
    # bare tracking key without '='
    ("http://ex.com/p?ref&a=1", "http://ex.com/p?a=1"),
    # 'refresh' is NOT a tracking param (anchored match)
    ("http://ex.com/p?refresh=1", "http://ex.com/p?refresh=1"),
    # path case preserved, duplicate params both kept (sorted, stable)
    ("http://ex.com/CaseKept?b=2&b=1", "http://ex.com/CaseKept?b=1&b=2"),
    # non-URL passthrough, byte for byte
    ("not a url", "not a url"),
    ("", ""),
]


class TestUrlNormalize:
    def test_canonical_pairs(self, spark):
        got = _run(spark, url_normalize, [c[0] for c in CANON_CASES])
        for (raw, want), g in zip(CANON_CASES, got):
            assert g == want, f"{raw!r}: {g!r} != {want!r}"

    def test_idempotent(self, spark):
        once = _run(spark, url_normalize, [c[0] for c in CANON_CASES])
        twice = _run(spark, url_normalize, once)
        assert once == twice


HOST_CASES = [
    ("HTTP://User@WWW.Ex.COM:8080/a", "www.ex.com"),
    ("https://ex.co.uk/x?q=1", "ex.co.uk"),
    ("not a url", ""),
]

DOMAIN_CASES = [
    ("http://a.b.example.com/x", "example.com"),
    ("http://www.example.co.uk/x", "example.co.uk"),
    # bare multi-part suffix host has only 2 labels -> returned whole
    ("http://co.uk/", "co.uk"),
    ("http://localhost:8080/", "localhost"),
    ("http://deep.sub.shop.com.au/x", "shop.com.au"),
    ("not a url", ""),
]


class TestHostAndDomain:
    def test_host(self, spark):
        got = _run(spark, url_host, [c[0] for c in HOST_CASES])
        assert got == [c[1] for c in HOST_CASES]

    def test_registrable_domain(self, spark):
        got = _run(spark, registrable_domain, [c[0] for c in DOMAIN_CASES])
        assert got == [c[1] for c in DOMAIN_CASES]


def test_plan_is_narrow_projection(spark):
    """The whole chain must stay a single codegen'd projection over the
    scan — no exchange, no UDF (scale contract of the module)."""
    df = spark.createDataFrame([("http://ex.com/a?b=1",)], "u string")
    out = df.select(
        url_normalize(F.col("u")).alias("c"),
        registrable_domain(F.col("u")).alias("d"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan


# ---------------------------------------------------------------------------
# property tests (hypothesis): idempotence + structural invariants over
# generated URLs — the hand table above can't cover the combinatorics of
# userinfo x port x params x fragment.
# ---------------------------------------------------------------------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:
    _label = st.text("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ09", min_size=1, max_size=6)
    _param = st.one_of(
        st.tuples(_label, _label).map(lambda kv: f"{kv[0]}={kv[1]}"),
        st.just("utm_source=x"),
        st.just("fbclid=abc"),
    )
    _urls = st.builds(
        lambda scheme, user, host_labels, port, path, params, frag: (
            scheme
            + "://"
            + (user + "@" if user else "")
            + ".".join(host_labels)
            + (f":{port}" if port else "")
            + ("/" + path if path else "")
            + ("?" + "&".join(params) if params else "")
            + ("#" + frag if frag else "")
        ),
        scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
        user=st.one_of(st.just(""), _label),
        host_labels=st.lists(_label, min_size=1, max_size=4),
        port=st.one_of(st.none(), st.sampled_from([80, 443, 8080])),
        path=st.one_of(st.just(""), _label),
        params=st.lists(_param, max_size=4),
        frag=st.one_of(st.just(""), _label),
    )

    @settings(max_examples=30, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.lists(_urls, min_size=1, max_size=8))
    def test_normalize_idempotent_and_clean(spark, urls):
        once = _run(spark, url_normalize, urls)
        twice = _run(spark, url_normalize, once)
        assert once == twice
        for u in once:
            assert "#" not in u
            assert "utm_" not in u and "fbclid" not in u
            q = u.split("?", 1)
            if len(q) == 2:
                parts = q[1].split("&")
                assert parts == sorted(parts)
