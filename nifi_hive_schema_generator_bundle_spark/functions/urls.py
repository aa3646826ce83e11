"""URL canonicalization + registrable-domain extraction.

The web-corpus half of a training pipeline keys almost everything on the
URL: crawl dedup is URL-level before it is content-level, per-domain
caps/mixtures need a registrable domain, and none of it works until the
raw scraped URL is canonical (``HTTP://Ex.COM:80/a?utm_source=x&b=1#f``
and ``http://ex.com/a?b=1`` must collide). The reference bundle has no
URL surface; this is extension territory like the rest of the
training-data operators.

Everything is JVM built-ins (regexp + array HOFs, no UDF, codegen'd) and
deliberately SQL-replicable — the DuckDB oracle recomputes the identical
canonical form, which doubles as a cross-engine spec of the rules:

1. scheme and host lowercase; userinfo stripped
2. default port stripped (``:80`` for http, ``:443`` for https)
3. fragment dropped
4. tracking params dropped (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``,
   ``ref``, ``ref_src``), remaining params sorted bytewise
5. empty path → ``/``; empty query → no ``?``

Registrable domain is the public-suffix heuristic every pipeline without
the full Mozilla list ships: last two host labels, or last three when
the trailing two are a known multi-part suffix (co.uk, com.au, ...).
The suffix set is a literal IN-list — no broadcast, no join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "url_parts",
    "url_host",
    "url_normalize",
    "registrable_domain",
    "TRACKING_PARAM_RE",
    "MULTI_PART_SUFFIXES",
]

# RFC 3986 appendix-B style split, restricted to :// URLs (the only kind
# a crawl emits). Groups: 1 scheme, 2 authority, 3 path, 4 query.
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?"

# Anchored match against one `key=value` (or bare `key`) query component.
TRACKING_PARAM_RE = r"^(utm_[^=&]*|fbclid|gclid|msclkid|ref|ref_src)(=.*)?$"

# The high-traffic multi-part public suffixes. A real deployment swaps in
# the full publicsuffix.org list (same expression shape, longer literal).
MULTI_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.tr", "co.in", "co.kr", "co.za",
)


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_parts(c: Column | str) -> dict[str, Column]:
    """The four raw pieces (scheme/authority/path/query) as columns.
    Non-matching strings yield '' everywhere (regexp_extract's miss
    value) — callers treat an empty scheme as "not a URL"."""
    c = _c(c)
    return {
        "scheme": F.lower(F.regexp_extract(c, _URL_RE, 1)),
        "authority": F.regexp_extract(c, _URL_RE, 2),
        "path": F.regexp_extract(c, _URL_RE, 3),
        "query": F.regexp_extract(c, _URL_RE, 4),
    }


def url_host(c: Column | str) -> Column:
    """Lowercased host: authority minus userinfo (up to the last '@')
    minus the port suffix. '' for non-URLs."""
    auth = url_parts(c)["authority"]
    no_user = F.regexp_replace(auth, r"^.*@", "")
    return F.lower(F.regexp_replace(no_user, r":[0-9]*$", ""))


def _port(auth: Column) -> Column:
    """The explicit ':NNN' port suffix of an authority, or ''."""
    return F.regexp_extract(F.regexp_replace(auth, r"^.*@", ""), r"(:[0-9]+)$", 1)


def url_normalize(c: Column | str) -> Column:
    """Canonical URL string (rules in the module docstring). Rows whose
    value doesn't parse as a ``scheme://`` URL come back unchanged —
    canonicalization must never destroy a key it doesn't understand.
    One narrow projection; the array HOF chain (split → filter →
    sort → join) stays inside codegen."""
    c = _c(c)
    p = url_parts(c)
    host = url_host(c)
    port = _port(p["authority"])
    keep_port = (
        (port != "")
        & ~((p["scheme"] == "http") & (port == ":80"))
        & ~((p["scheme"] == "https") & (port == ":443"))
    )
    params = F.array_sort(
        F.filter(
            F.split(p["query"], "&"),
            lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.array_join(params, "&")
    canon = F.concat(
        p["scheme"],
        F.lit("://"),
        host,
        F.when(keep_port, port).otherwise(F.lit("")),
        F.when(p["path"] == "", F.lit("/")).otherwise(p["path"]),
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(p["scheme"] == "", c).otherwise(canon)


def registrable_domain(c: Column | str) -> Column:
    """eTLD+1 under the heuristic suffix set: last 2 host labels, last 3
    when the trailing 2 are a multi-part suffix. Hosts with < the needed
    labels (bare 'localhost', raw TLD) return the host itself; '' for
    non-URLs. Pure expression — the suffix set is a literal, so there is
    no join and nothing to broadcast."""
    host = url_host(c)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.array_join(F.slice(parts, -2, 2), ".")
    last3 = F.array_join(F.slice(parts, -3, 3), ".")
    return F.when(n <= 2, host).otherwise(
        F.when(last2.isin(*MULTI_PART_SUFFIXES), last3).otherwise(last2)
    )
