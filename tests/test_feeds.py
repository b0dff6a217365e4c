"""RSS/Atom feed source (sources/feeds.py): both formats, date parsing,
gzip, malformed isolation, and the Spark operator."""

from __future__ import annotations

import datetime as dt

from docling_japanese_books_spark.sources.feeds import (
    build_atom,
    build_rss,
    parse_feed,
    parse_feeds,
)


def test_parse_rss_with_rfc822_dates():
    blob = build_rss(
        "My Feed",
        [
            ("https://a.example/p/1", "Post one", "Mon, 01 Jan 2024 12:00:00 GMT"),
            ("https://a.example/p/2", "Post two", "Tue, 02 Jan 2024 08:30:00 +0900"),
        ],
    )
    got = parse_feed(blob)
    assert [g["status"] for g in got] == ["ok", "ok"]
    assert got[0]["kind"] == "rss" and got[0]["feed_title"] == "My Feed"
    assert got[0]["entry_url"] == "https://a.example/p/1"
    assert got[0]["published_ts"] == dt.datetime(2024, 1, 1, 12, 0, 0)
    # +0900 normalizes to UTC
    assert got[1]["published_ts"] == dt.datetime(2024, 1, 1, 23, 30, 0)


def test_parse_atom_with_rfc3339_dates_and_gzip():
    blob = build_atom(
        "Atom Feed",
        [("https://b.example/e/1", "Entry", "2024-03-01T12:00:00Z")],
        gz=True,
    )
    got = parse_feed(blob)
    assert got[0]["kind"] == "atom"
    assert got[0]["entry_url"] == "https://b.example/e/1"
    assert got[0]["published_ts"] == dt.datetime(2024, 3, 1, 12, 0, 0)


def test_parse_feed_malformed_and_unparseable_dates():
    assert parse_feed(b"not xml at all")[0]["status"] == "parse_error"
    assert parse_feed(b"<html><body>nope</body></html>")[0]["status"] == "parse_error"
    blob = build_rss("F", [("https://a/1", "T", "not a date")])
    got = parse_feed(blob)[0]
    assert got["status"] == "ok" and got["published_ts"] is None
    assert got["published_raw"] == "not a date"  # raw kept for forensics
    # well-formed empty feed: one 'empty' row, not zero rows
    assert parse_feed(build_rss("E", []))[0]["status"] == "empty"


def test_atom_link_rel_alternate_preferred():
    xml = (
        b'<feed xmlns="http://www.w3.org/2005/Atom"><title>T</title>'
        b'<entry><title>E</title>'
        b'<link rel="self" href="https://b/self"/>'
        b'<link rel="alternate" href="https://b/page"/>'
        b"<updated>2024-01-01T00:00:00Z</updated></entry></feed>"
    )
    assert parse_feed(xml)[0]["entry_url"] == "https://b/page"


def test_parse_feeds_spark_operator(spark):
    rows = [
        ("https://a.example/feed.xml",
         build_rss("A", [("https://a.example/1", "one",
                          "Mon, 01 Jan 2024 12:00:00 GMT")])),
        ("https://b.example/atom.xml",
         build_atom("B", [("https://b.example/1", "uno",
                           "2024-02-01T00:00:00Z"),
                          ("https://b.example/2", "dos",
                           "2024-02-02T00:00:00Z")], gz=True)),
        ("https://bad.example/feed.xml", b"\x00garbage"),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    got = parse_feeds(df).collect()
    by_feed = {}
    for r in got:
        by_feed.setdefault(r.feed_url, []).append(r)
    assert len(by_feed["https://b.example/atom.xml"]) == 2
    assert by_feed["https://a.example/feed.xml"][0].title == "one"
    assert by_feed["https://bad.example/feed.xml"][0].status == "parse_error"
    ts = by_feed["https://b.example/atom.xml"][0].published_ts
    assert ts == dt.datetime(2024, 2, 1, 0, 0, 0)
