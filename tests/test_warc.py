"""WARC source connector: real archive bytes (plain + per-record gzip +
chunked transfer-encoding) through the parser, the Spark operator, and the
full resumable extraction pipeline."""

from __future__ import annotations

import datetime as dt
import gzip

from docling_japanese_books_spark.sources.warc import (
    build_warc,
    build_warc_gz,
    build_warc_record,
    parse_warc,
)

TS = dt.datetime(2024, 3, 1, 12, 0, 0)


def _html(i: int) -> bytes:
    return (
        f"<html><body><p>real page {i} content body with enough words to "
        f"keep the boilerplate classifier happy and satisfied</p>"
        f"<div class='nav'><a href='/'>home</a></div></body></html>"
    ).encode()


def test_parse_plain_and_gzip_archives():
    recs = [(f"https://ex{i}.com/p", TS, _html(i)) for i in range(5)]
    for payload in (build_warc(recs), build_warc_gz(recs)):
        rows = list(parse_warc(payload))
        assert [r["url"] for r in rows] == [f"https://ex{i}.com/p" for i in range(5)]
        assert all(r["warc_ts"] == TS for r in rows)
        assert rows[3]["html"] == _html(3)  # body byte-identical


def test_parse_skips_non_response_and_malformed():
    good = build_warc_record("https://ok.com/", TS, _html(1))
    req = build_warc_record("https://ok.com/", TS, b"GET / HTTP/1.1", warc_type="request")
    broken = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: zzz\r\n\r\n"
    rows = list(parse_warc(req + broken + good))
    assert len(rows) == 1 and rows[0]["url"] == "https://ok.com/"


def test_chunked_transfer_encoding_dechunked():
    rec = build_warc_record("https://c.com/", TS, _html(7), chunked=True)
    rows = list(parse_warc(rec))
    assert rows[0]["html"] == _html(7)


def test_content_language_header_maps_to_lang():
    rec = build_warc_record("https://l.com/", TS, _html(1), content_language="ja")
    assert list(parse_warc(rec))[0]["lang"] == "ja"
    rec2 = build_warc_record("https://l.com/", TS, _html(1))
    assert list(parse_warc(rec2))[0]["lang"] == "und"


def test_read_warc_spark_operator(spark, tmp_path):
    from docling_japanese_books_spark.sources.warc import read_warc

    # two archives: one plain, one gzip'd per record — like a crawl segment
    a = build_warc([(f"https://a.com/{i}", TS, _html(i)) for i in range(20)])
    b = build_warc_gz([(f"https://b.com/{i}", TS, _html(i)) for i in range(30)])
    (tmp_path / "seg-0.warc").write_bytes(a)
    (tmp_path / "seg-1.warc.gz").write_bytes(b)

    pages = read_warc(spark, str(tmp_path / "*"))
    assert pages.schema["warc_ts"].dataType.typeName() == "timestamp"
    rows = pages.collect()
    assert len(rows) == 50
    assert {r.url for r in rows} >= {"https://a.com/0", "https://b.com/29"}
    # one python stage, no shuffle
    plan = pages._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1 and "Exchange" not in plan


def test_warc_to_extraction_pipeline_end_to_end(spark, tmp_path):
    """Common-Crawl-style ingest: WARC archive -> pages -> resumable
    extraction pipeline -> extracted main content per url."""
    from docling_japanese_books_spark.pipeline.driver import (
        read_manifest,
        run_extraction_pipeline,
    )
    from docling_japanese_books_spark.sources.warc import read_warc

    gz = build_warc_gz([(f"https://site.com/{i}", TS, _html(i)) for i in range(40)])
    (tmp_path / "crawl.warc.gz").write_bytes(gz)
    out = tmp_path / "out"

    pages = read_warc(spark, str(tmp_path / "crawl.warc.gz"))
    r = run_extraction_pipeline(
        spark, pages, str(out), run_id="w1", n_buckets=4, wave_size=4
    )
    assert r.rows_out == 40
    data = spark.read.parquet(f"{out}/data")
    ok = data.filter("status = 'ok'")
    assert ok.count() == 40
    one = ok.filter("url = 'https://site.com/3'").collect()[0]
    assert "real page 3 content body" in one.text
    assert "home" not in one.text  # nav boilerplate stripped
    m = read_manifest(spark, str(out))
    assert m.count() == 4 and m.filter("rows_in <> rows_out").count() == 0


def test_content_length_plus_chunked_te_wins():
    """RFC 7230 §3.3.3: when Content-Length and Transfer-Encoding: chunked
    are both present (real servers do this), chunked wins — truncating at
    Content-Length first corrupted and silently dropped the record."""
    html = _html(5)
    body = f"{len(html):x}".encode() + b"\r\n" + html + b"\r\n0\r\n\r\n"
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html\r\n"
        + f"Content-Length: {len(html)}\r\n".encode()  # lies vs chunked body
        + b"Transfer-Encoding: chunked\r\n\r\n"
        + body
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://both.com/\r\n"
        b"WARC-Date: 2024-03-01T12:00:00Z\r\n"
        + f"Content-Length: {len(http)}\r\n\r\n".encode()
        + http
        + b"\r\n\r\n"
    )
    rows = list(parse_warc(rec))
    assert len(rows) == 1 and rows[0]["html"] == html


def test_http_header_charset_drives_decoding(spark, tmp_path):
    """WHATWG precedence end-to-end: a Shift_JIS body whose charset is
    declared ONLY in the HTTP Content-Type header (no meta, no BOM) must
    extract correctly when read_warc's charset_hint feeds extract_pages;
    and the header must outrank a LYING in-document meta declaration."""
    import datetime as dt

    from docling_japanese_books_spark.extraction.html import extract_pages
    from docling_japanese_books_spark.sources.warc import (
        build_warc_record,
        read_warc,
    )

    jp = "吾輩は猫である。名前はまだ無い。これは充分に長い本文の段落です。"
    plain = f"<html><body><p>{jp}{jp}</p></body></html>".encode("shift_jis")
    lying = (
        '<html><head><meta charset="utf-8"></head><body><p>'
        f"{jp}{jp}</p></body></html>"
    ).encode("shift_jis")
    archive = build_warc_record(
        "https://a.example/sjis", dt.datetime(2024, 1, 1), plain,
        content_type="text/html; charset=Shift_JIS",
    ) + build_warc_record(
        "https://a.example/lying-meta", dt.datetime(2024, 1, 1), lying,
        content_type="text/html; charset=Shift_JIS",
    )
    p = tmp_path / "a.warc"
    p.write_bytes(archive)

    pages = read_warc(spark, str(p))
    assert pages.filter("charset_hint = 'shift_jis'").count() == 2
    out = {
        r.url: r
        for r in extract_pages(pages, charset_col="charset_hint")
        .select("url", "extracted.*")
        .collect()
    }
    for url in ("https://a.example/sjis", "https://a.example/lying-meta"):
        assert out[url].status == "ok", url
        assert out[url].encoding == "shift_jis", url
        assert "吾輩は猫である" in out[url].text, url


# ---------------------------------------------------------------------------
# WET (Common Crawl extracted-text sidecar)
# ---------------------------------------------------------------------------


def test_parse_wet_plain_and_gzip():
    from docling_japanese_books_spark.sources.warc import (
        build_wet,
        build_wet_gz,
        parse_wet,
    )

    recs = [
        ("https://a.example/1", TS, "plain text one, already extracted"),
        ("https://b.example/2", TS, "日本語のテキスト page two"),
    ]
    for blob in (build_wet(recs), build_wet_gz(recs)):
        got = list(parse_wet(blob))
        assert [g["url"] for g in got] == [u for u, _, _ in recs]
        assert [g["text"] for g in got] == [x for _, _, x in recs]
        assert all(g["html"] == b"" and g["lang"] == "und" for g in got)
        assert all(g["warc_ts"] == TS for g in got)


def test_parse_wet_skips_warcinfo_and_response_records():
    from docling_japanese_books_spark.sources.warc import (
        build_wet,
        build_wet_record,
        parse_wet,
    )

    # a WET file always leads with warcinfo (build_wet emits one); splice
    # in a WARC response record too — only conversions must come back
    blob = (
        build_wet([("https://a.example/1", TS, "keep me")])
        + build_warc_record("https://a.example/skip", TS, b"<html>no</html>")
        + build_wet_record("https://a.example/2", TS, "also kept")
    )
    got = list(parse_wet(blob))
    assert [g["url"] for g in got] == [
        "https://a.example/1",
        "https://a.example/2",
    ]
    # and the WARC parser conversely skips the conversions
    from docling_japanese_books_spark.sources.warc import parse_warc

    assert [g["url"] for g in parse_warc(blob)] == ["https://a.example/skip"]


def test_parse_wet_malformed_record_skipped_replacement_chars_kept():
    from docling_japanese_books_spark.sources.warc import (
        build_wet_record,
        parse_wet,
    )

    good = build_wet_record("https://a.example/ok", TS, "fine")
    # invalid utf-8 in the body: NOT fatal (replaced), page still surfaces
    bad_utf8 = build_wet_record("https://a.example/bin", TS, "x")
    bad_utf8 = bad_utf8.replace(b"\r\n\r\nx", b"\r\n\r\n\xff")
    # missing WARC-Date -> record skipped
    no_date = build_wet_record("https://a.example/nodate", TS, "zzz")
    no_date = no_date.replace(b"WARC-Date: ", b"X-Date: ")
    got = list(parse_wet(good + bad_utf8 + no_date))
    assert [g["url"] for g in got] == [
        "https://a.example/ok",
        "https://a.example/bin",
    ]
    assert got[1]["text"] == "�"


def test_read_wet_spark_operator(spark, tmp_path):
    from docling_japanese_books_spark.sources.warc import build_wet_gz, read_wet

    for part in range(3):
        recs = [
            (f"https://w{part}.example/{i}", TS, f"extracted text {part}-{i}")
            for i in range(4)
        ]
        (tmp_path / f"part{part}.warc.wet.gz").write_bytes(build_wet_gz(recs))
    df = read_wet(spark, str(tmp_path / "*.warc.wet.gz"))
    rows = {r.url: r for r in df.collect()}
    assert len(rows) == 12
    assert rows["https://w1.example/2"].text == "extracted text 1-2"
    assert rows["https://w1.example/2"].html == bytearray(b"")


# ---------------------------------------------------------------------------
# WAT (metadata sidecar)
# ---------------------------------------------------------------------------


def test_parse_wat_plain_and_gzip():
    from docling_japanese_books_spark.sources.warc import (
        build_wat,
        build_wat_gz,
        parse_wat,
    )

    recs = [
        (
            "https://a.example/1",
            TS,
            "Page One",
            [("https://b.example/x", "go"), ("/relative", "rel")],
        ),
        ("https://c.example/2", TS, None, []),
    ]
    for blob in (build_wat(recs), build_wat_gz(recs)):
        got = list(parse_wat(blob))
        assert [g["url"] for g in got] == [u for u, _, _, _ in recs]
        assert got[0]["title"] == "Page One"
        assert got[0]["links"] == [
            {"url": "https://b.example/x", "text": "go"},
            {"url": "/relative", "text": "rel"},
        ]
        assert got[1]["title"] is None and got[1]["links"] == []
        assert all(g["warc_ts"] == TS for g in got)


def test_parse_wat_skips_warcinfo_malformed_json_and_other_types():
    from docling_japanese_books_spark.sources.warc import (
        build_wat,
        build_wat_record,
        build_wet_record,
        parse_wat,
    )

    good = build_wat(
        [("https://a.example/1", TS, "T", [("https://b.example", "b")])]
    )
    # corrupt one record's JSON in place (same byte count: {"..." -> x"...")
    bad = build_wat_record("https://a.example/bad", TS, "B", [])
    bad = bad.replace(b'{"Container"', b'x"Container"', 1)
    # a WET conversion record interleaved: not metadata, skipped
    other = build_wet_record("https://a.example/wet", TS, "text")
    got = list(parse_wat(good + bad + other))
    assert [g["url"] for g in got] == ["https://a.example/1"]


def test_parse_wat_tolerates_missing_envelope_sections():
    import json as _json

    from docling_japanese_books_spark.sources.warc import (
        build_wat_record,
        parse_wat,
    )

    # strip Payload-Metadata entirely: a page with no HTML-Metadata has no
    # links — that's data (an empty list), not a parse error
    rec = build_wat_record("https://a.example/1", TS, "T", [("https://b", "x")])
    head, _, body = rec.partition(b"\r\n\r\n")
    doc = _json.loads(body[: body.rfind(b"}") + 1])
    del doc["Envelope"]["Payload-Metadata"]
    new_body = _json.dumps(doc, sort_keys=True).encode()
    rec = (
        head.replace(
            f"Content-Length: {len(body) - 4}".encode(),
            f"Content-Length: {len(new_body)}".encode(),
        )
        + b"\r\n\r\n"
        + new_body
        + b"\r\n\r\n"
    )
    got = list(parse_wat(rec))
    assert len(got) == 1
    assert got[0]["title"] is None and got[0]["links"] == []


def test_read_wat_spark_operator(spark, tmp_path):
    from docling_japanese_books_spark.sources.warc import build_wat_gz, read_wat

    for part in range(2):
        recs = [
            (
                f"https://w{part}.example/{i}",
                TS,
                f"Title {part}-{i}",
                [(f"https://t{i}.example/p", f"anchor {i}")],
            )
            for i in range(3)
        ]
        (tmp_path / f"part{part}.warc.wat.gz").write_bytes(build_wat_gz(recs))
    df = read_wat(spark, str(tmp_path / "*.warc.wat.gz"))
    rows = {r.url: r for r in df.collect()}
    assert len(rows) == 6
    r = rows["https://w1.example/2"]
    assert r.title == "Title 1-2"
    assert [(l.url, l.text) for l in r.links] == [
        ("https://t2.example/p", "anchor 2")
    ]


def test_write_wet_roundtrip_and_idempotence(spark, tmp_path):
    from docling_japanese_books_spark.sources.warc import read_wet, write_wet

    rows = [
        (f"https://c{i % 3}.example/p/{i}", f"curated text body {i} 日本語 {i}")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "url string, text string").repartition(4)
    out = str(tmp_path / "wet_out")
    manifest = write_wet(df, out).collect()
    paths = sorted(r.path for r in manifest)
    assert sum(r.n_records for r in manifest) == 20
    assert len(paths) <= 4 and all(p.endswith(".warc.wet.gz") for p in paths)
    import os

    assert all(os.path.getsize(r.path) == r.n_bytes for r in manifest)
    # roundtrip: every (url, text) survives byte-for-byte
    back = {
        r.url: r.text for r in read_wet(spark, out + "/*.warc.wet.gz").collect()
    }
    assert back == dict(rows)
    # idempotence: a second run publishes the same content-addressed files
    manifest2 = write_wet(df, out).collect()
    assert sorted(r.path for r in manifest2) == paths
    assert sorted(os.listdir(out)) == sorted(
        os.path.basename(p) for p in paths
    )


def test_write_wet_ts_column_and_empty_partitions(spark, tmp_path):
    import datetime as dtm

    from docling_japanese_books_spark.sources.warc import read_wet, write_wet

    ts = dtm.datetime(2025, 6, 1, 8, 30, 0)
    df = spark.createDataFrame(
        [("https://a.example/1", "text one", ts)],
        "url string, text string, warc_ts timestamp",
    ).repartition(8)  # 7 empty partitions must publish nothing
    out = str(tmp_path / "wet_ts")
    manifest = [r for r in write_wet(df, out, ts_col="warc_ts").collect()]
    assert len(manifest) == 1 and manifest[0].n_records == 1
    got = read_wet(spark, out + "/*.warc.wet.gz").collect()
    assert got[0].warc_ts == ts
