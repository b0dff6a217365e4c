"""CDXJ index source (sources/cdx.py): typed parsing, SURT keys, and the
index->byte-range->WARC fetch flow that makes 100 TB ingest selective."""

from __future__ import annotations

import datetime as dt
import gzip

import pytest
from pyspark.sql import functions as F

from docling_japanese_books_spark.sources.cdx import (
    build_cdxj_line,
    parse_cdxj,
    read_cdxj,
    surt_key,
)
from docling_japanese_books_spark.sources.warc import (
    build_warc_record,
    parse_warc,
)


def test_parse_cdxj_typed_fields(spark, tmp_path):
    lines = [
        build_cdxj_line(
            "https://www.example.co.jp/News/today?b=2&a=1",
            "20240115123456",
            "crawl/seg0/file1.warc.gz",
            offset=1024,
            length=512,
        ),
        build_cdxj_line(
            "http://other.org/",
            "20231201000000",
            "crawl/seg1/file2.warc.gz",
            offset=0,
            length=99,
            mime="application/pdf",
            status=301,
        ),
        "garbage line without json",
    ]
    p = tmp_path / "index.cdxj"
    p.write_text("\n".join(lines))
    out = read_cdxj(spark, str(p)).orderBy("warc_offset").collect()
    ok = [r for r in out if r.url is not None]
    assert len(out) == 3 and len(ok) == 2
    r0 = next(r for r in ok if r.warc_offset == 1024)
    assert r0.host == "www.example.co.jp"
    assert r0.urlkey.startswith("jp,co,example,www)/news/today")
    assert r0.ts == dt.datetime(2024, 1, 15, 12, 34, 56)
    assert r0.status == 200 and r0.mime == "text/html"
    assert r0.warc_length == 512 and r0.warc_filename == "crawl/seg0/file1.warc.gz"
    r1 = next(r for r in ok if r.warc_offset == 0)
    assert r1.status == 301 and r1.mime == "application/pdf"
    bad = next(r for r in out if r.url is None)
    assert bad.warc_offset is None  # malformed line -> nulls, not task failure


def test_surt_key_matches_builder(spark):
    """The column-algebra surt_key must agree with the driver-side urlkey
    the fixture builder computes (two independent implementations)."""
    urls = [
        "https://Sub.Example.COM/A/b?x=1",
        "http://example.org/",
        "https://www.example.co.jp/News?b=2",
        "http://single/",
        "https://trailing.dot.net./P",
        # pywb port convention: non-default kept as host:port, defaults dropped
        "http://example.com:8080/Admin?z=1",
        "https://secure.example.net:443/y",
        "http://plain.example.org:80/",
        "https://odd.example.io:8443",
    ]
    expected = [build_cdxj_line(u, "20240101000000", "f", 0, 1).split(" ")[0] for u in urls]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r.k for r in df.select(surt_key(F.col("url")).alias("k")).collect()]
    assert got == expected


def test_cdx_warc_range_fetch_e2e(spark, tmp_path):
    """The full selective-ingest flow: filter the index by host, recover
    (offset, length) byte ranges, slice exactly those gzip members out of
    the archive, and parse them as standalone WARC records."""
    ts = dt.datetime(2024, 3, 1, 8, 0, 0)
    records = [
        (f"https://site{i % 3}.example.com/page/{i}", ts, f"<html>page {i}</html>".encode())
        for i in range(9)
    ]
    members = [gzip.compress(build_warc_record(u, t, h)) for u, t, h in records]
    archive = b"".join(members)
    offsets, pos = [], 0
    for m in members:
        offsets.append(pos)
        pos += len(m)

    idx_lines = [
        build_cdxj_line(u, t.strftime("%Y%m%d%H%M%S"), "a.warc.gz", offsets[i], len(members[i]))
        for i, (u, t, h) in enumerate(records)
    ]
    p = tmp_path / "a.cdxj"
    p.write_text("\n".join(idx_lines))

    wanted = (
        read_cdxj(spark, str(p))
        .filter(F.col("host") == "site1.example.com")
        .select("url", "warc_offset", "warc_length")
        .collect()
    )
    assert {r.url for r in wanted} == {
        f"https://site1.example.com/page/{i}" for i in (1, 4, 7)
    }
    for r in wanted:
        chunk = archive[r.warc_offset : r.warc_offset + r.warc_length]
        rows = list(parse_warc(chunk))
        assert len(rows) == 1 and rows[0]["url"] == r.url
