"""URL canonicalization + registered-domain (functions/scalars.py) —
the URL-level dedup keys for crawl corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403 — spark fixture


def test_canonicalize_url_cases(spark):
    from scraping_jobsdb_spark.functions.scalars import canonicalize_url

    cases = [
        # case folding + www + default port + tracking params + sort + fragment
        ("HTTP://WWW.Site5.Example.COM:80/path/5/?utm_source=x&b=2&a=1&fbclid=zz#frag",
         "http://site5.example.com/path/5?a=1&b=2"),
        # https default port + bare root path
        ("https://Example.org:443/", "https://example.org"),
        # interior slashes preserved, only TRAILING runs stripped
        ("https://example.org/a//b///", "https://example.org/a//b"),
        # all params tracking -> no query tail at all
        ("http://example.org/?utm_source=x&gclid=1", "http://example.org"),
        # non-default port survives
        ("http://example.org:8080/x", "http://example.org:8080/x"),
        # :443 on http is NOT the default port and survives
        ("http://example.org:443/x", "http://example.org:443/x"),
        # param order normalized
        ("http://example.org/x?z=1&y=2&utm_medium=m", "http://example.org/x?y=2&z=1"),
        # :443 is https's default, NOT ftp's — other schemes keep explicit ports
        ("ftp://Host.example:443/x", "ftp://host.example:443/x"),
        ("ftp://Host.example:21/x", "ftp://host.example:21/x"),
        # non-default https port survives
        ("https://example.org:8443/x", "https://example.org:8443/x"),
        # scheme-less input passes through unchanged (contract: scheme required)
        ("example.com/path?utm_source=x", "example.com/path?utm_source=x"),
        ("", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(canonicalize_url("u")).collect()]
    assert got == [w for _, w in cases], list(zip(got, cases))


def test_canonical_equal_iff_same_resource(spark):
    """Variant pairs collapse; distinct resources never do."""
    from scraping_jobsdb_spark.functions.scalars import canonicalize_url

    urls = [
        ("http://a.com/x", "HTTP://WWW.A.com:80/x/", True),
        ("http://a.com/x?p=1", "http://a.com/x?p=2", False),
        ("http://a.com/x", "http://a.com/y", False),
        ("https://a.com/x", "http://a.com/x", False),  # scheme is semantic
    ]
    df = spark.createDataFrame(urls, "u1 string, u2 string, same boolean")
    rows = df.select(
        (canonicalize_url("u1") == canonicalize_url("u2")).alias("eq"), "same"
    ).collect()
    assert all(r.eq == r.same for r in rows), rows


def test_registered_domain_cases(spark):
    from scraping_jobsdb_spark.functions.scalars import registered_domain

    cases = [
        ("http://www.news.bbc.co.uk/x", "bbc.co.uk"),
        ("https://a.b.example.com/", "example.com"),
        ("example.org", "example.org"),
        ("http://sub.site.com.au:8080/p", "site.com.au"),
        ("localhost", "localhost"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(registered_domain("u")).collect()]
    assert got == [w for _, w in cases], list(zip(got, cases))
