"""Sitemap + robots.txt sources (sources/sitemaps.py): protocol parsing,
RFC 9309 rule evaluation, and the Arrow-batched Spark paths."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.sources.sitemaps import (
    parse_robots,
    parse_sitemap,
    parse_sitemaps,
    robots_allows,
    robots_check_udf,
)

SM_NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _urlset(entries):
    urls = "".join(
        "<url>" + "".join(f"<{k}>{v}</{k}>" for k, v in e.items()) + "</url>"
        for e in entries
    )
    return f'<?xml version="1.0"?><urlset {SM_NS}>{urls}</urlset>'.encode()


def test_parse_urlset_and_index():
    sm = _urlset(
        [
            dict(loc="https://example.com/a", lastmod="2024-01-15",
                 changefreq="daily", priority="0.8"),
            dict(loc="https://example.com/b"),
        ]
    )
    out = parse_sitemap(sm)
    assert [e["loc"] for e in out] == [
        "https://example.com/a", "https://example.com/b",
    ]
    assert out[0]["lastmod"] == "2024-01-15" and out[0]["priority"] == 0.8
    assert out[1]["priority"] is None

    idx = (
        f'<sitemapindex {SM_NS}>'
        "<sitemap><loc>https://example.com/sitemap1.xml.gz</loc></sitemap>"
        "<sitemap><loc>https://example.com/sitemap2.xml.gz</loc></sitemap>"
        "</sitemapindex>"
    ).encode()
    got = parse_sitemap(idx)
    assert all(e["kind"] == "sitemapindex" for e in got) and len(got) == 2


def test_parse_sitemap_gzip_and_errors():
    sm = _urlset([dict(loc="https://example.com/x")])
    assert parse_sitemap(gzip.compress(sm))[0]["loc"] == "https://example.com/x"
    for bad in (b"not xml", b"<html><body/></html>", b"\x1f\x8bgarbage"):
        with pytest.raises(ValueError):
            parse_sitemap(bad)


def test_parse_sitemaps_spark_isolation(spark):
    rows = [
        ("https://a/sitemap.xml", _urlset([dict(loc="https://a/1"), dict(loc="https://a/2")])),
        ("https://b/sitemap.xml", b"broken <xml"),
        ("https://c/sitemap.xml", _urlset([])),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    out = parse_sitemaps(df).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r.sitemap_url, []).append(r)
    assert [r.loc for r in by_url["https://a/sitemap.xml"]] == [
        "https://a/1", "https://a/2",
    ]
    assert by_url["https://b/sitemap.xml"][0].status == "parse_error"
    assert by_url["https://c/sitemap.xml"][0].status == "empty"


ROBOTS = """
# corpus crawler policy
User-agent: corpusbot
Disallow: /private/
Allow: /private/press/
Crawl-delay: 2.5

User-agent: *
Disallow: /tmp/*.pdf$
Disallow: /admin

Sitemap: https://example.com/sitemap.xml
Sitemap: https://example.com/news.xml
"""


def test_robots_group_selection_and_longest_match():
    r = parse_robots(ROBOTS)
    assert [s.split("/")[-1] for s in r["sitemaps"]] == ["sitemap.xml", "news.xml"]
    # specific agent group wins over *
    assert not robots_allows(r, "corpusbot/1.0", "/private/docs")
    assert robots_allows(r, "corpusbot/1.0", "/private/press/x")  # longest match
    assert robots_allows(r, "corpusbot/1.0", "/admin")  # * group not applied
    # fallback group for unknown agents
    assert not robots_allows(r, "otherbot", "/admin/panel")
    assert robots_allows(r, "otherbot", "/private/docs")
    # wildcard + end anchor
    assert not robots_allows(r, "otherbot", "/tmp/file.pdf")
    assert robots_allows(r, "otherbot", "/tmp/file.pdf.html")  # $ anchor


def test_robots_edge_cases():
    r = parse_robots("User-agent: *\nDisallow:\n")  # empty Disallow = allow all
    assert robots_allows(r, "any", "/anything")
    assert robots_allows(parse_robots(""), "any", "/x")  # no groups
    # tie between Allow and Disallow of equal length: Allow wins (RFC)
    r2 = parse_robots("User-agent: *\nDisallow: /a/b\nAllow: /a/c\n")
    assert not robots_allows(r2, "x", "/a/b")
    assert robots_allows(r2, "x", "/a/c")


def test_robots_check_udf_spark(spark):
    rows = [
        (ROBOTS, "/private/docs"),
        (ROBOTS, "/private/press/x"),
        ("", "/anything"),
    ]
    df = spark.createDataFrame(rows, "robots string, path string")
    e = robots_check_udf("corpusbot")(F.col("robots"), F.col("path"))
    out = df.select(e.alias("e")).select("e.*").collect()
    assert [r.allowed for r in out] == [False, True, True]
    assert out[0].crawl_delay == 2.5 and out[0].n_sitemaps == 2
    assert out[2].crawl_delay is None and out[2].n_sitemaps == 0
