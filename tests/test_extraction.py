"""North-rule extraction invariant: extract(html) == text, byte for byte,
per url — on the self-verifying synthetic pages corpus, through the full
Spark pipeline (Arrow round trips included)."""

from __future__ import annotations

from docling_japanese_books_spark.extraction.html import (
    extract_main_content,
    extract_pages,
)
from docling_japanese_books_spark.extraction.pages import generate_pages, make_page


class TestPureExtraction:
    def test_empty_and_none(self):
        assert extract_main_content(None)["status"] == "empty"
        assert extract_main_content(b"")["status"] == "empty"

    def test_decode_error(self):
        out = extract_main_content(b"<p>broken \xff\xfe page</p>")
        assert out["status"] == "decode_error"
        assert out["text"] == ""

    def test_boilerplate_stripped(self):
        html = (
            b"<html><body><nav><a href='/'>home</a><a href='/x'>x</a></nav>"
            b"<p>This is the real main content of the page, long enough.</p>"
            b"<div class='ads'><a href='/ad'>buy now buy now buy now</a></div>"
            b"<footer>copyright</footer></body></html>"
        )
        out = extract_main_content(html)
        assert out["status"] == "ok"
        assert out["text"] == "This is the real main content of the page, long enough."
        assert out["blocks_kept"] == 1
        assert out["blocks_dropped"] >= 1

    def test_heading_rides_along_with_content(self):
        html = (
            b"<h1>Title</h1><p>Enough main content to keep this block here.</p>"
        )
        out = extract_main_content(html)
        assert out["text"].startswith("Title\n\n")

    def test_heading_alone_is_dropped(self):
        out = extract_main_content(b"<h1>Title</h1><a href='/'>only links</a>")
        assert "Title" not in out["text"]

    def test_entities_unescaped(self):
        out = extract_main_content(
            b"<p>a &amp; b &lt; c with plenty of padding text here</p>"
        )
        assert out["text"] == "a & b < c with plenty of padding text here"

    def test_cjk_roundtrip(self):
        row = None
        for i in range(200):
            cand = make_page(42, i)
            if cand["lang"] == "ja":
                row = cand
                break
        assert row is not None
        out = extract_main_content(row["html"])
        assert out["text"] == row["text"]

    def test_generator_goldens_byte_identical(self):
        for i in range(300):
            row = make_page(42, i)
            out = extract_main_content(row["html"])
            assert out["text"] == row["text"], f"row {i} ({row['lang']}) mismatch"


class TestSparkExtraction:
    def test_pipeline_byte_identical_per_url(self, spark):
        pages = generate_pages(spark, 300, seed=42)
        extracted = extract_pages(pages)
        bad = extracted.filter("extracted.text <> text").count()
        assert bad == 0

    def test_status_distribution(self, spark):
        pages = generate_pages(spark, 500, seed=42)
        extracted = extract_pages(pages)
        by_status = {
            r["status"]: r["n"]
            for r in extracted.groupBy("extracted.status")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        }
        assert by_status.get("ok", 0) > 400
        assert by_status.get("decode_error", 0) >= 1  # malformed rows present

    def test_determinism_across_parallelism(self, spark):
        a = generate_pages(spark, 100, seed=42).repartition(1)
        b = generate_pages(spark, 100, seed=42).repartition(7)
        rows_a = {r.url: r.text for r in a.collect()}
        rows_b = {r.url: r.text for r in b.collect()}
        assert rows_a == rows_b

    def test_host_skew_is_zipfian(self, spark):
        from pyspark.sql import functions as F

        pages = generate_pages(spark, 2000, seed=42)
        counts = (
            pages.withColumn(
                "host", F.regexp_extract("url", r"https://([^/]+)/", 1)
            )
            .groupBy("host")
            .count()
            .orderBy(F.desc("count"))
            .collect()
        )
        # top host should dominate: zipf(1.2) gives rank1/rank10 ≈ 15x
        assert counts[0]["count"] > 5 * counts[9]["count"]
