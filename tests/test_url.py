"""URL functions (functions/url.py): hand-built expectations per rule, and
the whole-stage-codegen / zero-UDF plan property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from immich_geodata_zh_tw_spark.functions import url as U

CASES = [
    # url, host, reg_domain, depth, normalized
    ("https://www.Example.COM.tw/a/b?id=1#x",
     "www.example.com.tw", "example.com.tw", 2,
     "https://example.com.tw/a/b?id=1"),
    ("HTTPS://WWW.Foo.example.org/",
     "www.foo.example.org", "example.org", 0,
     "https://foo.example.org"),
    ("http://a.b.blog.co.uk/p/q/r/?utm_source=x&gclid=g",
     "a.b.blog.co.uk", "blog.co.uk", 3,
     "http://a.b.blog.co.uk/p/q/r/"),
    ("https://example.org?utm_campaign=only",
     "example.org", "example.org", 0, "https://example.org"),
    ("https://host.example.com/Path?b=2&utm_x=1&a=1",
     "host.example.com", "example.com", 1,
     "https://host.example.com/Path?b=2&a=1"),
    ("https://localhost/x", "localhost", "localhost", 1,
     "https://localhost/x"),
    ("https://www.example.org/#frag", "www.example.org", "example.org", 0,
     "https://example.org"),
]


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    host = U.url_host("url")
    out = df.select(
        "url", host.alias("host"),
        U.registered_domain(host).alias("reg_domain"),
        U.path_depth("url").alias("depth"),
        U.url_normalize("url").alias("norm"))
    return {r.url: r for r in out.collect()}, out


def test_expected_values(parsed):
    got, _ = parsed
    for u, host, reg, depth, norm in CASES:
        r = got[u]
        assert r.host == host, u
        assert r.reg_domain == reg, u
        assert r.depth == depth, u
        assert r.norm == norm, u


def test_tracking_filter_preserves_order_and_unknown_params(parsed):
    got, _ = parsed
    r = got["https://host.example.com/Path?b=2&utm_x=1&a=1"]
    assert r.norm.endswith("?b=2&a=1")  # b before a, utm_x gone


def test_plan_is_pure_projection(parsed):
    """No UDF, no exchange: URL structure over 10^12 urls must stay a
    projection inside the scan stage.  (The Project itself falls out of
    whole-stage codegen because higher-order lambdas — F.filter — are not
    codegen-supported; it is still a single JVM-interpreted projection, so
    we pin exactly one Project node and zero Python/Exchange nodes.)"""
    _, out = parsed
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Project") == 1


def test_suffix_table_is_parametric(spark):
    df = spark.createDataFrame([("x.y.custom.zz",)], "host string")
    r = df.select(
        U.registered_domain(F.col("host"),
                            suffixes=("custom.zz",)).alias("d")).collect()[0]
    assert r.d == "y.custom.zz"
    r2 = df.select(U.registered_domain(F.col("host")).alias("d")).collect()[0]
    assert r2.d == "custom.zz"


def test_malformed_urls_yield_null_not_throw(spark):
    """try_parse_url, not parse_url: under Spark 4's default ANSI mode one
    malformed url in a crawl batch must NOT kill the job — every function
    degrades to NULL (and registered_domain must not collapse NULL hosts
    into a shared '' domain key)."""
    df = spark.createDataFrame(
        [("not a url",), ("https://my_host.example.com/a?x=1",)],
        "url string")
    host = U.url_host("url")
    rows = df.select(
        host.alias("h"), U.registered_domain(host).alias("rd"),
        U.url_normalize("url").alias("n")).collect()
    for r in rows:
        assert r.h is None and r.rd is None and r.n is None


def test_port_handling_in_normalize(spark):
    """Explicit non-default ports are SEMANTIC (two ports, two resources)
    and survive canonicalization; the scheme's default port is dropped."""
    cases = {
        "https://example.com:8080/a": "https://example.com:8080/a",
        "https://example.com:443/a": "https://example.com/a",
        "http://example.com:80/a": "http://example.com/a",
        "http://example.com:8443/a": "http://example.com:8443/a",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r.url: r.n for r in
           df.select("url", U.url_normalize("url").alias("n")).collect()}
    assert got == cases
