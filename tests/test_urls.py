"""URL canonicalization functions (functions/urls.py) — pure column
algebra, so one Spark job evaluates every edge case as literal columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.functions.urls import (
    etld1_of,
    host_of,
    url_normalize,
)

CASES = [
    # (raw, expected_host, expected_etld1, expected_normalized)
    (
        "HTTP://Example.COM:80/A/B?z=1&a=2#frag",
        "example.com",
        "example.com",
        "http://example.com/A/B?a=2&z=1",  # default port dropped, query sorted
    ),
    (
        "https://example.com:443/",
        "example.com",
        "example.com",
        "https://example.com/",
    ),
    (
        "https://Sub.Shop.Example.co.JP:8443",
        "sub.shop.example.co.jp",
        "example.co.jp",  # registry SLD heuristic: co + 2-letter ccTLD
        "https://sub.shop.example.co.jp:8443/",  # non-default port kept, '/' added
    ),
    (
        "http://news.example.co.uk/Article",
        "news.example.co.uk",
        "example.co.uk",
        "http://news.example.co.uk/Article",
    ),
    (
        "http://example.org./x",  # trailing-dot FQDN
        "example.org",
        "example.org",
        "http://example.org/x",
    ),
    (
        "http://192.168.0.7:8080/p?b&a",
        "192.168.0.7",
        "0.7",  # numeric hosts fall through the label heuristic (documented)
        "http://192.168.0.7:8080/p?a&b",
    ),
    (
        "https://localhost/x",
        "localhost",
        "localhost",  # single label: itself
        "https://localhost/x",
    ),
    (
        "HTTPS://WWW.EXAMPLE.NET/CasePreserved/Path",
        "www.example.net",
        "example.net",
        "https://www.example.net/CasePreserved/Path",  # path case kept
    ),
]


def test_url_functions_edge_cases(spark):
    rows = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], "i long, url string"
    )
    u = F.col("url")
    h = host_of(u)
    out = {
        r.i: r
        for r in rows.select(
            "i",
            h.alias("host"),
            etld1_of(h).alias("etld1"),
            url_normalize(u).alias("norm"),
        ).collect()
    }
    for i, (raw, host, etld1, norm) in enumerate(CASES):
        assert out[i].host == host, f"host({raw!r}) = {out[i].host!r}"
        assert out[i].etld1 == etld1, f"etld1({raw!r}) = {out[i].etld1!r}"
        assert out[i].norm == norm, f"normalize({raw!r}) = {out[i].norm!r}"


def test_normalize_is_idempotent(spark):
    """Canonicalization must be a projection: normalize(normalize(u)) ==
    normalize(u) for every case above."""
    rows = spark.createDataFrame([(c[0],) for c in CASES], "url string")
    once = rows.select(url_normalize(F.col("url")).alias("url"))
    twice = once.select(url_normalize(F.col("url")).alias("url"))
    assert [r.url for r in once.collect()] == [r.url for r in twice.collect()]


def test_bucket_stability_under_mess(spark):
    """The point of canonicalization: every messy spelling of the same
    page lands in the same xxhash64 bucket."""
    variants = [
        "https://example.com/p?a=1&b=2",
        "HTTPS://EXAMPLE.COM:443/p?b=2&a=1#x",
        "https://example.com./p?a=1&b=2",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    buckets = (
        df.select(
            F.pmod(F.xxhash64(url_normalize(F.col("url"))), F.lit(1024)).alias("b")
        )
        .distinct()
        .collect()
    )
    assert len(buckets) == 1
