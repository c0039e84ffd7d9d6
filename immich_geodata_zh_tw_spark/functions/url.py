"""URL column functions for Common-Crawl-style pages (url, warc_ts, …).

The input_hint's pages table keys everything on ``url``, and every
web-curation stage downstream needs URL structure: per-host caps and
admission budgets key on the HOST, C4/RefinedWeb-style source mixing keys on
the REGISTERED DOMAIN (one label under the public suffix), recrawl dedup
keys on a CANONICALIZED url (tracking params and fragments stripped so two
crawls of the same page collide).

All pure Column algebra over the JVM's ``parse_url`` (Hive-compatible
PROTOCOL/HOST/PATH/QUERY parts) + array functions — zero UDFs, so
host/domain extraction over 10^12 urls is a single projection inside the
scan stage, not a Python round-trip.  (The higher-order lambdas keep the
projection out of whole-stage codegen, but it stays JVM-interpreted
Column code — plan shape pinned by tests/test_url.py.)

The public-suffix table here is a deliberately small embedded SUBSET of the
Mozilla Public Suffix List (the common two-level ccTLD registrations a
Taiwan-centric crawl actually hits) — ``registered_domain`` takes the
suffix set as a parameter so a deployment can swap in the full PSL (a
~9k-entry broadcast-able literal list) without touching the logic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "PUBLIC_SUFFIXES_2LEVEL", "TRACKING_PARAM_RE", "url_scheme", "url_host",
    "url_port", "strip_www", "url_path", "path_depth", "url_query",
    "strip_tracking_params", "registered_domain", "url_normalize",
]

#: common two-level public suffixes (subset of the public PSL; see module
#: docstring — parameterized, not hardwired, in registered_domain)
PUBLIC_SUFFIXES_2LEVEL = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.tw", "org.tw", "edu.tw", "gov.tw", "net.tw", "idv.tw",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "co.kr", "or.kr", "go.kr", "ac.kr",
    "com.cn", "org.cn", "net.cn", "gov.cn", "edu.cn",
    "com.hk", "org.hk", "com.sg", "com.my",
    "com.au", "net.au", "org.au", "com.br", "com.mx",
)

#: query params dropped by canonicalization: analytics attribution noise
#: that makes identical pages look distinct to exact-url dedup
TRACKING_PARAM_RE = "^(utm_[a-z]+|gclid|fbclid|ref)="


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(url) -> Column:
    """Lower-cased scheme ('https').  ``try_parse_url``, not ``parse_url``:
    under Spark 4's default ANSI mode the non-try form THROWS on a
    malformed url — one bad row in 10^12 crawl urls would kill the job
    instead of yielding NULL."""
    return F.lower(F.try_parse_url(_c(url), F.lit("PROTOCOL")))


def url_host(url) -> Column:
    """Lower-cased hostname, port excluded (Hive HOST semantics); NULL for
    urls java.net.URI cannot parse (e.g. underscore hosts) — callers
    keying on host/domain should treat NULL as 'unparseable', not group it
    (a per-domain cap over raw output would lump every bad url into one
    giant NULL domain)."""
    return F.lower(F.try_parse_url(_c(url), F.lit("HOST")))


def url_port(url) -> Column:
    """Explicit port as a string ('8080'), '' when absent or unparseable
    (AUTHORITY minus USERINFO retains only host[:port])."""
    auth = F.try_parse_url(_c(url), F.lit("AUTHORITY"))
    return F.coalesce(F.regexp_extract(auth, ":([0-9]+)$", 1), F.lit(""))


def strip_www(host) -> Column:
    """Drop one leading 'www.' label."""
    return F.regexp_replace(_c(host), r"^www\.", "")


def url_path(url) -> Column:
    """Path component including the leading '/'; '' when absent."""
    return F.coalesce(F.try_parse_url(_c(url), F.lit("PATH")), F.lit(""))


def path_depth(url) -> Column:
    """Number of non-empty path segments ('/a/b/' → 2, '' and '/' → 0)."""
    return F.size(F.filter(F.split(url_path(url), "/"),
                           lambda x: x != F.lit("")))


def url_query(url) -> Column:
    """Query string without the '?'; '' when absent."""
    return F.coalesce(F.try_parse_url(_c(url), F.lit("QUERY")), F.lit(""))


def strip_tracking_params(url, *, pattern: str = TRACKING_PARAM_RE) -> Column:
    """Query string with tracking params removed ('' when nothing
    survives) — filter + rejoin of the '&'-split pairs, order preserved."""
    return F.array_join(
        F.filter(F.split(url_query(url), "&"),
                 lambda kv: (kv != F.lit("")) & ~kv.rlike(pattern)), "&")


def registered_domain(host, *,
                      suffixes: tuple[str, ...] = PUBLIC_SUFFIXES_2LEVEL
                      ) -> Column:
    """One label under the public suffix: 'a.b.example.com.tw' →
    'example.com.tw', 'www.example.org' → 'example.org'.  Hosts that ARE a
    bare suffix (or a bare 2-label host) come back whole."""
    parts = F.split(_c(host), r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    is_2level = last2.isin(*suffixes)
    last3 = F.concat_ws(".", F.element_at(parts, -3), last2)
    # explicit NULL-host guard: concat_ws SKIPS null parts, so without it an
    # unparseable host would silently become the shared '' domain key and
    # every bad url would collide into one giant group
    return (F.when(_c(host).isNull(), F.lit(None).cast("string"))
            .when(n <= 1, _c(host))
            .when(is_2level & (n >= 3), last3)
            .otherwise(last2))


def url_normalize(url, *, tracking_re: str = TRACKING_PARAM_RE) -> Column:
    """Canonical form for exact-url dedup / recrawl keying:
    lower-cased scheme and host, 'www.' stripped, fragment dropped,
    tracking params dropped (and the dangling '?' with them), a bare-root
    '/' path collapsed to '', the scheme's DEFAULT port dropped (':443'
    on https, ':80' on http) with any other explicit port kept — two
    ports serve two resources.  Path case and non-tracking param order
    are preserved — they are semantic on real servers.  NULL for
    unparseable urls (concat propagates the NULL host)."""
    url = _c(url)
    path = url_path(url)
    path = F.when(path == "/", F.lit("")).otherwise(path)
    q = strip_tracking_params(url, pattern=tracking_re)
    scheme = url_scheme(url)
    port = url_port(url)
    default = ((scheme == "https") & (port == "443")) | \
        ((scheme == "http") & (port == "80"))
    port_part = F.when((port == "") | default, F.lit("")) \
        .otherwise(F.concat(F.lit(":"), port))
    return F.concat(
        scheme, F.lit("://"), strip_www(url_host(url)), port_part, path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")))
